"""Sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4.4).

The key property: band-sharded rendering is *bit-identical* to single-device
rendering, because RNG streams key on global pixel ids and the framebuffer
accumulate has no cross-band reduction.
"""

import jax
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.parallel import (
    make_mesh,
    make_recovery_step,
    make_sharded_render_step,
    sharded_framebuffer,
)
from fspt_tpu.render import framebuffer as fb_mod
from fspt_tpu.render import integrator

from conftest import build_cornell_box


def test_sharded_matches_single_device():
    builder = build_cornell_box()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=3)

    fb1 = fb_mod.create(cfg.height, cfg.width)
    step1 = jax.jit(integrator.render_step, static_argnames=("cfg",))
    fb1, segs1 = step1(scene, camera, cfg, fb1, 7, 0)

    mesh = make_mesh(8)
    fb8 = sharded_framebuffer(mesh, cfg.height, cfg.width)
    step8 = make_sharded_render_step(mesh, cfg)
    fb8, segs8 = step8(scene, camera, fb8, 7, 0)

    np.testing.assert_array_equal(np.asarray(fb1.mean), np.asarray(fb8.mean))
    np.testing.assert_array_equal(np.asarray(fb1.depth), np.asarray(fb8.depth))
    assert int(segs1) == int(segs8)


def test_sharded_matches_any_device_count():
    builder = build_cornell_box()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=2)

    images = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        fb = sharded_framebuffer(mesh, cfg.height, cfg.width)
        step = make_sharded_render_step(mesh, cfg)
        fb, _ = step(scene, camera, fb, 3, 0)
        images.append(np.asarray(fb.mean))
    for img in images[1:]:
        np.testing.assert_array_equal(images[0], img)


def test_recovery_step_reduces_loss():
    """Sharded differentiable recovery: loss decreases, grads are synced."""
    builder = build_cornell_box()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=2)

    # Target: image rendered with the true albedo table.
    mesh = make_mesh(8)
    fb = sharded_framebuffer(mesh, cfg.height, cfg.width)
    step = make_sharded_render_step(mesh, cfg)
    fb, _ = step(scene, camera, fb, 5, 0)
    target = np.asarray(fb.mean)

    # Perturb the albedo and recover it.
    params = {"diffuse": scene.materials.diffuse * 0.5}
    recover = make_recovery_step(mesh, cfg, param_names=("diffuse",), lr=0.8)
    losses = []
    for it in range(25):
        # Fixed frame → deterministic descent (stochastic frames are
        # exercised by examples/recover_albedo.py).
        params, loss = recover(params, scene, camera, target, 5, 0)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.35, losses


def test_sharded_megakernel_matches_single_device():
    """The flagship camera-fused megakernel sharded over 8 bands is
    bit-identical to the single-device megakernel (VERDICT r2 #3: the fast
    kernels must be what the parallel path runs)."""
    from fspt_tpu.ops.pallas_path import make_camera_path_tracer
    from fspt_tpu.parallel import make_sharded_megakernel_step

    builder = build_cornell_box(with_specular=True)
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=4)

    tracer = make_camera_path_tracer(scene, camera, cfg)
    out = tracer(7, 0)
    fb1 = fb_mod.create(cfg.height, cfg.width)
    fb1 = fb_mod.accumulate(fb1, out.radiance, out.aov_normal, out.aov_depth,
                            out.aov_mat, cfg.height, cfg.width, cfg.spp)

    mesh = make_mesh(8)
    fb8 = sharded_framebuffer(mesh, cfg.height, cfg.width)
    step = make_sharded_megakernel_step(mesh, scene, camera, cfg)
    assert step is not None
    fb8, segs = step(fb8, 7, 0)
    np.testing.assert_array_equal(np.asarray(fb1.mean), np.asarray(fb8.mean))
    np.testing.assert_array_equal(np.asarray(fb1.mat), np.asarray(fb8.mat))
    assert int(segs) == int(out.segments)


def test_sharded_mesh_bvh_intersector_matches_single_device():
    """The culled-treelet mesh BVH sweep runs under the device mesh and
    matches the single-device render bit-for-bit."""
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
    from test_diff_intersect import build_bvh_scene

    builder = build_bvh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=16, height=16, spp=1, max_depth=2)

    inter = make_mesh_intersector(scene)
    assert inter is not None
    fb1 = fb_mod.create(cfg.height, cfg.width)
    step1 = jax.jit(integrator.render_step,
                    static_argnames=("cfg", "intersector"))
    fb1, segs1 = step1(scene, camera, cfg, fb1, 7, 0, intersector=inter)

    mesh = make_mesh(8)
    fb8 = sharded_framebuffer(mesh, cfg.height, cfg.width)
    step8 = make_sharded_render_step(mesh, cfg, intersector=inter)
    fb8, segs8 = step8(scene, camera, fb8, 7, 0)
    np.testing.assert_array_equal(np.asarray(fb1.mean), np.asarray(fb8.mean))
    assert int(segs1) == int(segs8)


def test_fused_recovery_step_matches_device_counts():
    """Fused Pallas fwd+bwd recovery (pmean grads): 1-device and 8-device
    steps produce identical parameter updates."""
    from fspt_tpu.parallel import make_fused_recovery_step

    builder = build_cornell_box()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=2)
    target = np.zeros((cfg.height, cfg.width, 3), np.float32)
    params0 = {"diffuse": scene.materials.diffuse * 0.7,
               "emissive": scene.materials.emissive}

    results = []
    for n in (1, 8):
        mesh = make_mesh(n)
        step = make_fused_recovery_step(mesh, scene, camera, cfg, lr=0.5,
                                        pool=1)
        params, loss = step(dict(params0), scene, camera, target, 5, 0)
        results.append((jax.tree.map(np.asarray, params), float(loss)))
    (p1, l1), (p8, l8) = results
    np.testing.assert_allclose(l1, l8, rtol=1e-6)
    for k in p1:
        np.testing.assert_allclose(p1[k], p8[k], rtol=1e-5, atol=1e-7,
                                   err_msg=k)


def test_fused_recovery_step_reduces_loss():
    from fspt_tpu.parallel import make_fused_recovery_step

    builder = build_cornell_box()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=2)

    mesh = make_mesh(8)
    fb = sharded_framebuffer(mesh, cfg.height, cfg.width)
    step = make_sharded_render_step(mesh, cfg)
    fb, _ = step(scene, camera, fb, 5, 0)
    target = np.asarray(fb.mean)

    params = {"diffuse": scene.materials.diffuse * 0.5}
    recover = make_fused_recovery_step(mesh, scene, camera, cfg,
                                       fields=("diffuse",), lr=0.8)
    losses = []
    for it in range(25):
        params, loss = recover(params, scene, camera, target, 5, 0)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.35, losses


def test_sharded_queued_mesh_matches_single_device():
    """The regenerating ray queue (the mesh bench configuration) runs one
    queue per device band and matches the single-device queued render."""
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
    from fspt_tpu.render.queue import render_queued
    from test_diff_intersect import build_bvh_scene

    builder = build_bvh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=16, height=16, spp=1, max_depth=3)

    inter = make_mesh_intersector(scene)
    assert inter is not None
    out1 = jax.jit(lambda: render_queued(
        scene, camera, cfg, 7, 0, intersector=inter, queue=64))()
    fb1 = fb_mod.accumulate(
        fb_mod.create(cfg.height, cfg.width), out1.radiance, out1.aov_normal,
        out1.aov_depth, out1.aov_mat, cfg.height, cfg.width, cfg.spp)

    mesh = make_mesh(8)
    fb8 = sharded_framebuffer(mesh, cfg.height, cfg.width)
    step8 = make_sharded_render_step(mesh, cfg, intersector=inter, queue=64)
    fb8, segs8 = step8(scene, camera, fb8, 7, 0)
    np.testing.assert_allclose(np.asarray(fb1.mean), np.asarray(fb8.mean),
                               rtol=2e-5, atol=1e-6)
    assert int(out1.segments) == int(segs8)


def test_scene_sharded_matches_replicated():
    """Triangle-sharded rendering (scene split over 8 devices, rays
    replicated, pmin/psum closest-hit merge) matches the replicated-scene
    render."""
    from fspt_tpu.parallel import make_scene_sharded_render_step
    from test_diff_intersect import build_bvh_scene

    builder = build_bvh_scene()
    scene = builder.compile()
    assert scene.bvh is not None
    camera = builder.cameras[0]
    cfg = RenderConfig(width=16, height=16, spp=1, max_depth=3)

    fb1 = fb_mod.create(cfg.height, cfg.width)
    step1 = jax.jit(integrator.render_step, static_argnames=("cfg",))
    fb1, segs1 = step1(scene, camera, cfg, fb1, 7, 0)

    mesh = make_mesh(8)
    fb8 = fb_mod.create(cfg.height, cfg.width)  # replicated output
    step8 = make_scene_sharded_render_step(mesh, cfg, scene)
    fb8, segs8 = step8(scene, camera, fb8, 7, 0)

    np.testing.assert_allclose(np.asarray(fb1.mean), np.asarray(fb8.mean),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fb1.mat), np.asarray(fb8.mat))
    assert int(segs1) == int(segs8)


def test_scene_sharded_fast_matches_replicated():
    """Triangle-sharded rendering on the Pallas treelet sweep (fast=True,
    VERDICT r3 #7): per-shard runtime-table cull+sweep + pmin/psum merge
    matches the replicated fast-path render."""
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
    from fspt_tpu.parallel import make_scene_sharded_render_step
    from test_diff_intersect import build_bvh_scene

    builder = build_bvh_scene()
    scene = builder.compile()
    assert scene.bvh is not None
    camera = builder.cameras[0]
    cfg = RenderConfig(width=16, height=16, spp=1, max_depth=3)

    inter = make_mesh_intersector(scene)
    fb1 = fb_mod.create(cfg.height, cfg.width)
    step1 = jax.jit(integrator.render_step,
                    static_argnames=("cfg", "intersector"))
    fb1, segs1 = step1(scene, camera, cfg, fb1, 7, 0, intersector=inter)

    mesh = make_mesh(8)
    fb8 = fb_mod.create(cfg.height, cfg.width)  # replicated output
    step8 = make_scene_sharded_render_step(mesh, cfg, scene, fast=True)
    fb8, segs8 = step8(scene, camera, fb8, 7, 0)

    np.testing.assert_allclose(np.asarray(fb1.mean), np.asarray(fb8.mean),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fb1.mat), np.asarray(fb8.mat))
    assert int(segs1) == int(segs8)
