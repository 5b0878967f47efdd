"""Hit-id replay differentiation (ops/diff_intersect.py).

Forward equality with the fast path, gradient flow vs finite differences,
and BVH-scale vertex recovery (parallel/train.make_bvh_vertex_recovery_step)
— on the 8-device virtual CPU mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fspt_tpu import Camera, RenderConfig, SceneBuilder
from fspt_tpu import materials as M
from fspt_tpu.materials import MaterialSpec
from fspt_tpu.ops.diff_intersect import (flat_normals,
                                         make_diff_mesh_intersector,
                                         tris_from_scene)


def build_bvh_scene(grid=12):
    """A heightfield big enough to cross the builder's BVH threshold."""
    b = SceneBuilder()
    terra = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(0.6, 0.5, 0.4)))
    light = b.add_material(MaterialSpec(M.LIGHT, emissive=(9.0, 9.0, 9.0)))
    sky = b.add_material(MaterialSpec(M.LIGHT, emissive=(0.2, 0.3, 0.4)))
    b.set_sky(sky)
    b.add_quad_uv((-20, 20.0, -20), (40, 0, 0), (0, 0, 40), light)

    xs = np.linspace(-20, 20, grid, dtype=np.float32)
    X, Z = np.meshgrid(xs, xs, indexing="ij")
    Y = 2.0 * np.sin(X * 0.3) * np.cos(Z * 0.25) - 8.0
    P = np.stack([X, Y, Z], axis=-1)
    a = P[:-1, :-1].reshape(-1, 3)
    bq = P[1:, :-1].reshape(-1, 3)
    c = P[1:, 1:].reshape(-1, 3)
    d = P[:-1, 1:].reshape(-1, 3)
    v0 = np.concatenate([a, a])
    v1 = np.concatenate([bq, c])
    v2 = np.concatenate([c, d])
    b.add_triangles(v0, v1, v2, terra)
    b.add_camera(Camera.create(origin=(0.0, 10.0, -45.0),
                               target=(0.0, -8.0, 0.0), aperture_size=0.0))
    return b


def rays_toward_mesh(n, seed=0):
    rng = np.random.default_rng(seed)
    origin = np.array([0.0, 10.0, -45.0], np.float32)
    targets = rng.uniform([-18, -11, -18], [18, -5, 18], size=(n, 3))
    start = np.broadcast_to(origin, (n, 3)).astype(np.float32)
    seg = ((targets - origin) * 1.5).astype(np.float32)
    return jnp.asarray(start), jnp.asarray(seg)


@pytest.fixture(scope="module")
def bvh_scene():
    builder = build_bvh_scene()
    scene = builder.compile()
    assert scene.bvh is not None
    return scene


def test_replay_matches_fast_forward(bvh_scene):
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector

    fast = make_mesh_intersector(bvh_scene)
    diff = make_diff_mesh_intersector(bvh_scene)
    start, seg = rays_toward_mesh(512)
    hf = fast(start, seg)
    hd = diff(start, seg)
    hit = np.asarray(hf.hit)
    np.testing.assert_array_equal(hit, np.asarray(hd.hit))
    np.testing.assert_array_equal(np.asarray(hf.prim_id), np.asarray(hd.prim_id))
    # Field values on miss lanes are don't-care; compare where hit.
    np.testing.assert_allclose(np.asarray(hf.t)[hit], np.asarray(hd.t)[hit],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hf.normal)[hit],
                               np.asarray(hd.normal)[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(hf.mat)[hit],
                                  np.asarray(hd.mat)[hit])


def test_replay_vertex_gradient_matches_fd(bvh_scene):
    diff = make_diff_mesh_intersector(bvh_scene)
    baked = tris_from_scene(bvh_scene)
    start, seg = rays_toward_mesh(256, seed=3)

    def loss(dv):
        tr = dict(baked)
        tr["v0"] = baked["v0"] + dv
        tr["v1"] = baked["v1"] + dv
        tr["v2"] = baked["v2"] + dv
        n = flat_normals(tr["v0"], tr["v1"], tr["v2"])
        tr["n0"] = tr["n1"] = tr["n2"] = n
        h = diff.bind(tr)(start, seg)
        return jnp.sum(jnp.where(h.prim_id >= 0, h.t, 0.0))

    g = jax.grad(loss)(jnp.zeros(3, jnp.float32))
    # f32 FD of a ~1e2-magnitude sum carries ~1e-5 relative rounding per
    # evaluation → a few % noise at eps=1e-3; 5% separates real gradient
    # bugs (orders of magnitude / sign) from arithmetic noise.
    eps = 1e-3
    for ax in range(3):
        dv = np.zeros(3, np.float32)
        dv[ax] = eps
        fd = (float(loss(jnp.asarray(dv))) - float(loss(jnp.asarray(-dv)))) / (2 * eps)
        assert abs(float(g[ax]) - fd) <= 5e-2 * max(1.0, abs(fd)), (
            f"axis {ax}: AD {float(g[ax])} vs FD {fd}")


def test_planar_replay_matches_wavefront(bvh_scene):
    """The component-planar phase-2 replay (make_planar_recorded_replay)
    matches the wavefront replay on the same recorded winner ids —
    radiance, segment count, and vertex gradients (edge term included)."""
    from fspt_tpu.ops.diff_intersect import (make_planar_recorded_replay,
                                             make_recorded_replay)
    from fspt_tpu.render import integrator

    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=3,
                       edge_eps=0.05)
    cam = Camera.create(origin=(0.0, 10.0, -45.0), target=(0.0, -8.0, 0.0),
                        aperture_size=0.0)
    diff = make_diff_mesh_intersector(bvh_scene)

    rec = []

    def recorder(start, seg, alive=None):
        h = diff(start, seg, alive)
        rec.append((h.prim_id, h.hit))
        return h

    recorder.accepts_alive = True
    integrator.render_wavefront(bvh_scene, cam, cfg, 5, 0,
                                intersector=recorder)
    ids = jnp.stack([i for i, _ in rec], axis=1)
    hitm = jnp.stack([h for _, h in rec], axis=1)

    tris = tris_from_scene(bvh_scene)
    bind = make_recorded_replay(bvh_scene)
    planar = make_planar_recorded_replay(bvh_scene, cfg, z_far=10000.0)
    assert planar is not None

    def loss_w(dv):
        tr = {k: (v + dv if k in ("v0", "v1", "v2") else v)
              for k, v in tris.items()}
        out = integrator.render_wavefront(
            bvh_scene, cam, cfg, 5, 0, intersector=bind(tr, ids, hitm))
        return jnp.sum(out.radiance ** 2), (out.radiance, out.segments)

    def loss_p(dv):
        tr = {k: (v + dv if k in ("v0", "v1", "v2") else v)
              for k, v in tris.items()}
        rad, segs = planar(tr, ids, hitm, cam, 5, 0)
        return jnp.sum(rad ** 2), (rad, segs)

    zero = jnp.zeros(3, jnp.float32)
    (lw, (rw, sw)), gw = jax.value_and_grad(loss_w, has_aux=True)(zero)
    (lp, (rp, sp)), gp = jax.value_and_grad(loss_p, has_aux=True)(zero)
    assert int(sw) == int(sp)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(rw),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(lp), float(lw), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gw),
                               rtol=2e-3, atol=1e-4)


def test_replay_renders_through_integrator(bvh_scene):
    from fspt_tpu.render import integrator

    cfg = RenderConfig(width=32, height=32, spp=1, max_depth=2)
    cam = Camera.create(origin=(0.0, 10.0, -45.0), target=(0.0, -8.0, 0.0),
                        aperture_size=0.0)
    diff = make_diff_mesh_intersector(bvh_scene)
    out = integrator.render_wavefront(bvh_scene, cam, cfg, 7, 0,
                                      intersector=diff)
    rad = np.asarray(out.radiance)
    assert np.isfinite(rad).all()
    assert rad.mean() > 0.01  # the lit heightfield is visible


def test_bvh_vertex_recovery_descends():
    """A y-offset vertex perturbation is pulled back toward truth."""
    import optax

    from fspt_tpu.parallel import make_bvh_vertex_recovery_step, make_mesh
    from fspt_tpu.parallel.train import render_image_rows

    builder = build_bvh_scene()
    scene = builder.compile()
    cam = builder.cameras[0]
    cfg = RenderConfig(width=48, height=48, spp=4, max_depth=2, edge_eps=0.05)
    mesh = make_mesh()

    baked = tris_from_scene(scene)
    true_params = {k: baked[k] for k in ("v0", "v1", "v2")}

    # Target: the unperturbed render (averaged over a few frames).
    from fspt_tpu.ops.diff_intersect import make_diff_mesh_intersector as mk
    diff = mk(scene)
    target = np.mean([
        np.asarray(render_image_rows(scene, cam, cfg, 11, f, 0, cfg.height,
                                     intersector=diff))
        for f in range(4)
    ], axis=0)

    # Hit-id replay freezes hit topology at the baked geometry, so the
    # perturbation must stay within the regime where original winner ids
    # remain approximately valid (docstring of make_bvh_vertex_recovery_step).
    shift = jnp.asarray([0.0, 0.4, 0.0], jnp.float32)
    params = {k: v + shift for k, v in true_params.items()}
    step = make_bvh_vertex_recovery_step(
        mesh, cfg, scene, optimizer=optax.adam(0.05), pool=1)
    opt_state = step.init(params)

    def mean_dy(p):
        """The determined dof: a 48²-pixel loss pins the mean surface
        height long before it pins 726 individual vertices (which wander
        within the Monte-Carlo noise null-space at this resolution)."""
        return float(jnp.mean(p["v0"][:, 1] - true_params["v0"][:, 1]))

    e0 = mean_dy(params)
    for it in range(40):
        params, opt_state, loss = step(params, opt_state, scene, cam,
                                       jnp.asarray(target), 11, it)
        assert np.isfinite(float(loss))
    e1 = mean_dy(params)
    assert 0.0 < e1 < 0.6 * e0, (
        f"mean vertex displacement {e0} -> {e1}, expected >40% recovery "
        "without overshoot")
