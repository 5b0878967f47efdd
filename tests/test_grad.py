"""Gradient correctness vs. finite differences (SURVEY.md §4.3).

Because the RNG is counter-based, the renderer is a *deterministic* function
of its parameters for a fixed seed: finite differences are well-defined and
must match ``jax.grad`` wherever the perturbation doesn't flip a discrete
path decision (hit selection, lobe choice).  Albedo/emission never flip
paths, so those gradients must match tightly (rtol 1e-3 per BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.parallel.train import render_image_rows

from conftest import build_cornell_box


def _make_loss(builder, cfg, target, column):
    scene = builder.compile()
    camera = builder.cameras[0]

    def loss_fn(value):
        table = scene.materials._replace(**{column: value})
        s = scene._replace(materials=table)
        img = render_image_rows(s, camera, cfg, seed=5, frame_idx=0, y0=0,
                                rows=cfg.height)
        return jnp.mean((img - target) ** 2)

    return scene, jax.jit(loss_fn)


def _fd_check(loss_fn, value, ad_grad, probes, h, rtol):
    f0 = float(loss_fn(value))
    for idx in probes:
        e = np.zeros(value.shape, np.float32)
        e[idx] = h
        f_plus = float(loss_fn(value + e))
        f_minus = float(loss_fn(value - e))
        fd = (f_plus - f_minus) / (2 * h)
        ad = float(ad_grad[idx])
        assert np.isfinite(ad)
        if abs(fd) < 1e-7 and abs(ad) < 1e-7:
            continue
        np.testing.assert_allclose(ad, fd, rtol=rtol, err_msg=f"index {idx}")
    return f0


def test_albedo_gradients_match_fd():
    builder = build_cornell_box()
    cfg = RenderConfig(width=8, height=8, spp=4, max_depth=3)
    scene = builder.compile()
    camera = builder.cameras[0]
    target = render_image_rows(scene, camera, cfg, seed=9, frame_idx=1, y0=0,
                               rows=cfg.height)

    scene, loss_fn = _make_loss(builder, cfg, target, "diffuse")
    value = scene.materials.diffuse
    ad_grad = jax.jit(jax.grad(loss_fn))(value)
    probes = [(0, 0), (0, 1), (1, 0), (2, 2), (3, 1)]  # walls + light rows
    _fd_check(loss_fn, np.asarray(value), np.asarray(ad_grad), probes,
              h=1e-2, rtol=2e-3)


def test_emission_gradients_match_fd():
    builder = build_cornell_box()
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=3)
    scene = builder.compile()
    camera = builder.cameras[0]
    target = render_image_rows(scene, camera, cfg, seed=9, frame_idx=1, y0=0,
                               rows=cfg.height) * 0.8

    scene, loss_fn = _make_loss(builder, cfg, target, "emissive")
    value = scene.materials.emissive
    ad_grad = jax.jit(jax.grad(loss_fn))(value)
    probes = [(3, 0), (3, 1), (3, 2), (4, 2)]  # the area light + sky rows
    _fd_check(loss_fn, np.asarray(value), np.asarray(ad_grad), probes,
              h=1e-2, rtol=2e-3)


def test_camera_gradient_finite():
    """Camera-origin gradients exist and are finite (geometry grads via t)."""
    builder = build_cornell_box()
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=2)
    scene = builder.compile()
    camera = builder.cameras[0]
    target = render_image_rows(scene, camera, cfg, seed=2, frame_idx=0, y0=0,
                               rows=cfg.height)

    def loss_fn(origin):
        cam = camera._replace(origin=origin)
        img = render_image_rows(scene, cam, cfg, seed=2, frame_idx=1, y0=0,
                                rows=cfg.height)
        return jnp.mean((img - target) ** 2)

    g = jax.jit(jax.grad(loss_fn))(camera.origin)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_vertex_gradients_interior_match_fd():
    """Geometry gradients w.r.t. triangle vertices through the MT intersector.

    Interior gradients (hit point stays on the same triangle) are exact
    under AD; silhouette terms need edge reparameterization (round-2,
    PERF_NOTES.md).  Probing a vertex of a large triangle fully covering
    several pixels keeps the FD step interior.
    """
    from fspt_tpu import materials as M
    from fspt_tpu.camera import Camera
    from fspt_tpu.materials import MaterialSpec
    from fspt_tpu.scene.builder import SceneBuilder

    def build(v_offset):
        b = SceneBuilder()
        white = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(0.7, 0.7, 0.7)))
        light = b.add_material(MaterialSpec(M.LIGHT, emissive=(5.0, 5.0, 5.0)))
        b.add_quad_uv((-40, 49.0, -40), (80, 0, 0), (0, 0, 80), light)
        return b, white

    b, white = build(0.0)
    # A big slanted triangle in front of the camera.
    v0 = np.array([[-30.0, -20.0, 30.0]], np.float32)
    v1 = np.array([[30.0, -20.0, 32.0]], np.float32)
    v2 = np.array([[0.0, 25.0, 28.0]], np.float32)
    b.add_triangles(v0, v1, v2, white)
    scene = b.compile()
    camera = Camera.create(origin=(0, 0, -60), aperture_size=0.0)
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=2)

    def loss_fn(dz):
        # Move v2 along z; rebuild the differentiable triangle fields.
        g = scene.geometry
        v2m = g.tri_v0 + g.tri_e2 + jnp.array([0.0, 0.0, 1.0]) * dz
        e2 = v2m - g.tri_v0
        cr = jnp.cross(g.tri_e1, e2)
        area2 = jnp.linalg.norm(cr, axis=-1)
        ng = cr / jnp.maximum(area2, 1e-30)[:, None]
        g2 = g._replace(tri_e2=e2, tri_ng=ng, tri_area2=area2,
                        tri_n0=ng, tri_n1=ng, tri_n2=ng)
        s2 = scene._replace(geometry=g2)
        img = render_image_rows(s2, camera, cfg, seed=3, frame_idx=0, y0=0,
                                rows=cfg.height)
        return jnp.mean(img)

    ad = float(jax.jit(jax.grad(loss_fn))(0.0))
    h = 5e-2
    fd = (float(loss_fn(h)) - float(loss_fn(-h))) / (2 * h)
    assert np.isfinite(ad) and abs(fd) > 1e-6
    np.testing.assert_allclose(ad, fd, rtol=5e-2)


def _silhouette_scene():
    """One emissive triangle against a dim sky: the ONLY gradient of the
    mean image w.r.t. vertex motion is the silhouette (visibility) term —
    emission is constant, so interior AD gradients are exactly zero and the
    test cleanly isolates the edge-reparameterized boundary term."""
    from fspt_tpu import materials as M
    from fspt_tpu.camera import Camera
    from fspt_tpu.materials import MaterialSpec
    from fspt_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    tri = b.add_material(MaterialSpec(M.LIGHT, emissive=(4.0, 4.0, 4.0)))
    sky = b.add_material(MaterialSpec(M.LIGHT, emissive=(0.1, 0.1, 0.1)))
    b.set_sky(sky)
    v0 = np.array([[-20.0, -15.0, 30.0]], np.float32)
    v1 = np.array([[20.0, -15.0, 30.0]], np.float32)
    v2 = np.array([[0.0, 15.0, 30.0]], np.float32)
    b.add_triangles(v0, v1, v2, tri)
    scene = b.compile()
    camera = Camera.create(origin=(0, 0, -60), aperture_size=0.0)
    return scene, camera


def test_silhouette_gradients_edge_reparameterized():
    """Edge reparameterization (cfg.edge_eps > 0) recovers the visibility
    boundary term naive AD drops (SURVEY.md §7 hard part 2; BASELINE
    config 5).  Growing the triangle raises mean image brightness; hard AD
    sees ~none of that, edge-aware AD must match its own FD."""
    from fspt_tpu.parallel.train import apply_vertices, render_image_rows

    scene, camera = _silhouette_scene()
    base = {
        "v0": scene.geometry.tri_v0,
        "v1": scene.geometry.tri_v0 + scene.geometry.tri_e1,
        "v2": scene.geometry.tri_v0 + scene.geometry.tri_e2,
    }

    def mean_img(scale, cfg):
        # Scale the triangle about its centroid: every silhouette edge moves.
        c = (base["v0"] + base["v1"] + base["v2"]) / 3.0
        params = {k: c + (v - c) * scale for k, v in base.items()}
        s = apply_vertices(scene, params)
        acc = 0.0
        for seed in (0, 1, 2, 3):
            img = render_image_rows(s, camera, cfg, seed=seed, frame_idx=0,
                                    y0=0, rows=cfg.height)
            acc = acc + jnp.mean(img)
        return acc / 4.0

    cfg_edge = RenderConfig(width=16, height=16, spp=8, max_depth=2,
                            edge_eps=3.0)
    cfg_hard = RenderConfig(width=16, height=16, spp=8, max_depth=2)

    loss_edge = jax.jit(lambda s: mean_img(s, cfg_edge))
    loss_hard = jax.jit(lambda s: mean_img(s, cfg_hard))

    ad_edge = float(jax.jit(jax.grad(lambda s: mean_img(s, cfg_edge)))(1.0))
    ad_hard = float(jax.jit(jax.grad(lambda s: mean_img(s, cfg_hard)))(1.0))

    h = 0.04
    fd_edge = (float(loss_edge(1.0 + h)) - float(loss_edge(1.0 - h))) / (2 * h)
    fd_hard = (float(loss_hard(1.0 + h)) - float(loss_hard(1.0 - h))) / (2 * h)

    # The true boundary term is positive and visible in both FDs.
    assert fd_edge > 1e-3 and fd_hard > 1e-3
    # Naive AD through hard visibility drops it almost entirely...
    assert abs(ad_hard) < 0.25 * fd_hard
    # ...edge-reparameterized AD recovers it.
    np.testing.assert_allclose(ad_edge, fd_edge, rtol=0.35)
    assert ad_edge > 0.5 * fd_hard


def test_sharded_vertex_step_matches_single_device():
    """Config-5 multi-device variant: the sharded vertex-recovery step's
    pmean-reduced gradients give the same update on 1 and 8 devices."""
    from fspt_tpu.parallel import make_mesh, make_vertex_recovery_step

    scene, camera = _silhouette_scene()
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=2, edge_eps=3.0)
    params = {
        "v0": scene.geometry.tri_v0,
        "v1": scene.geometry.tri_v0 + scene.geometry.tri_e1,
        "v2": scene.geometry.tri_v0 + scene.geometry.tri_e2,
    }
    from fspt_tpu.parallel.train import apply_vertices, render_image_rows

    shrunk = {k: v * 0.9 for k, v in params.items()}
    target = render_image_rows(apply_vertices(scene, params), camera, cfg,
                               seed=11, frame_idx=3, y0=0, rows=cfg.height)

    results = []
    for n in (1, 8):
        step = make_vertex_recovery_step(make_mesh(n), cfg, lr=0.05)
        new_params, loss = step(dict(shrunk), scene, camera, target, 5, 0)
        results.append((jax.tree.map(np.asarray, new_params), float(loss)))
    (p1, l1), (p8, l8) = results
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for k in p1:
        np.testing.assert_allclose(p1[k], p8[k], rtol=1e-4, atol=1e-6)
    # The step moves vertices (gradients are nonzero).
    moved = sum(float(np.abs(p1[k] - np.asarray(shrunk[k])).max()) for k in p1)
    assert moved > 0.0
