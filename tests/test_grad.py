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
