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
