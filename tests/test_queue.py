"""Queued (ray-regeneration) integrator ≡ the unrolled wavefront loop.

The queue reschedules the exact same per-lane computation (render/queue.py
docstring): identical RNG streams, identical paths, identical accumulation
order per lane.  Radiance/AOVs agree to float-ulp level (XLA fuses
multiply-adds differently across the two graph shapes, so bit-exactness
across compilations is not guaranteed — tolerances are ~1e-5); integer
outputs (aov_mat, segments) match exactly.  Scenes exercise fog deferral,
light clamp, specular chains, banding, fast-render, and the BVH mesh
path; small queues force many refill iterations."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import build_cornell_box
from test_diff_intersect import build_bvh_scene

from fspt_tpu.config import RenderConfig
from fspt_tpu.render import integrator
from fspt_tpu.render.queue import render_queued


def _compare(scene, camera, cfg, intersector, queue, seed=11, sample0=3):
    ref = integrator.render_wavefront(scene, camera, cfg, seed, sample0,
                                      intersector=intersector)
    out = render_queued(scene, camera, cfg, seed, sample0,
                        intersector=intersector, queue=queue)
    np.testing.assert_allclose(np.asarray(ref.radiance),
                               np.asarray(out.radiance),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.aov_normal),
                               np.asarray(out.aov_normal),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.aov_depth),
                               np.asarray(out.aov_depth), rtol=2e-3)
    np.testing.assert_array_equal(np.asarray(ref.aov_mat),
                                  np.asarray(out.aov_mat))
    assert int(ref.segments) == int(out.segments)


@pytest.mark.parametrize("queue", [256, 1024])
def test_queue_matches_wavefront_cornell(queue):
    """Diffuse+specular Cornell box, small queue → many refill rounds."""
    builder = build_cornell_box(with_specular=True)
    scene = builder.compile()
    cfg = RenderConfig(width=24, height=16, spp=2, max_depth=5)

    def intersector(o, d, alive=None):
        from fspt_tpu.ops.intersect import intersect_scene
        return intersect_scene(scene.geometry, o, d)

    intersector.accepts_alive = True
    _compare(scene, builder.cameras[0], cfg, intersector, queue)


def test_queue_matches_wavefront_fog():
    """Fog absorption is deferred one segment — per-lane depth masks must
    reproduce the unrolled loop's iteration-special-cased logic."""
    builder = build_cornell_box(with_fog=True)
    scene = builder.compile()
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=4)

    def intersector(o, d, alive=None):
        from fspt_tpu.ops.intersect import intersect_scene
        return intersect_scene(scene.geometry, o, d)

    intersector.accepts_alive = True
    _compare(scene, builder.cameras[0], cfg, intersector, queue=512)


def test_queue_matches_wavefront_bvh():
    """Mesh scene through the XLA two-level BVH intersector."""
    builder = build_bvh_scene(grid=10)
    scene = builder.compile()
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=3)

    def intersector(o, d, alive=None):
        return integrator._intersect_with_bvh(scene, o, d)

    intersector.accepts_alive = True
    _compare(scene, builder.cameras[0], cfg, intersector, queue=384)


def test_queue_fast_render_and_banding():
    """fast_render's depth-2 white cap + y0/rows banding."""
    builder = build_cornell_box()
    scene = builder.compile()
    cfg = RenderConfig(width=16, height=16, spp=1, max_depth=6,
                       fast_render=True)

    def intersector(o, d, alive=None):
        from fspt_tpu.ops.intersect import intersect_scene
        return intersect_scene(scene.geometry, o, d)

    intersector.accepts_alive = True
    cam = builder.cameras[0]
    ref = integrator.render_wavefront(scene, cam, cfg, 5, 0, y0=4, rows=8,
                                      intersector=intersector)
    out = render_queued(scene, cam, cfg, 5, 0, y0=4, rows=8,
                        intersector=intersector, queue=128)
    np.testing.assert_allclose(np.asarray(ref.radiance),
                               np.asarray(out.radiance),
                               rtol=2e-3, atol=2e-5)
    assert int(ref.segments) == int(out.segments)


def test_rays_for_lanes_matches_generate_rays():
    from fspt_tpu.camera import generate_rays, rays_for_lanes

    builder = build_cornell_box()
    cam = builder.cameras[0]
    ref = generate_rays(cam, 8, 6, 2, 9, 4, y0=2, rows=3)
    lanes = jnp.arange(3 * 8 * 2, dtype=jnp.int32)
    out = rays_for_lanes(cam, 8, 6, 2, 9, 4, lanes, y0=2)
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_queue_edge_eps_matches_wavefront():
    """Edge reparameterization (cfg.edge_eps > 0) in the queue: identical
    pass-through decisions and throughput ratios as the unrolled loop."""
    from fspt_tpu.ops.diff_intersect import make_diff_mesh_intersector

    builder = build_bvh_scene(grid=10)
    scene = builder.compile()
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=3,
                       edge_eps=0.05)
    diff = make_diff_mesh_intersector(scene)
    ref = integrator.render_wavefront(scene, builder.cameras[0], cfg, 11, 3,
                                      intersector=diff)
    out = render_queued(scene, builder.cameras[0], cfg, 11, 3,
                        intersector=diff, queue=384)
    np.testing.assert_allclose(np.asarray(ref.radiance),
                               np.asarray(out.radiance),
                               rtol=2e-3, atol=2e-5)
    assert int(ref.segments) == int(out.segments)


def test_recorded_replay_matches_queue():
    """Two-phase equivalence: winner ids recorded by the queue, replayed
    through the unrolled loop, reproduce the queued radiance — the
    correctness pin of the two-phase BVH gradient step."""
    import jax

    from fspt_tpu.ops.diff_intersect import (make_diff_mesh_intersector,
                                             make_recorded_replay,
                                             tris_from_scene)

    builder = build_bvh_scene(grid=10)
    scene = builder.compile()
    cam = builder.cameras[0]
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=3,
                       edge_eps=0.05)
    diff = make_diff_mesh_intersector(scene)
    out1, (ids, hitm) = jax.jit(lambda: render_queued(
        scene, cam, cfg, 7, 5, intersector=diff, queue=256,
        record_hits=True))()
    assert ids.shape == (16 * 12 * 2, 3) and hitm.shape == ids.shape
    assert int((ids >= 0).sum()) > 0

    baked = tris_from_scene(scene)
    replay = make_recorded_replay(scene)(baked, ids, hitm)
    out2 = integrator.render_wavefront(scene, cam, cfg, 7, 5,
                                       intersector=replay)
    np.testing.assert_allclose(np.asarray(out1.radiance),
                               np.asarray(out2.radiance),
                               rtol=2e-3, atol=2e-5)


def test_first_hit_cache_matches_uncached():
    """First-hit cache (reference ImagePlaneCache, engine.h:46-65): with
    the camera-uniform stream frozen at ``cam_sample0``, fetching depth-0
    collisions from the G-buffer reproduces the uncached render of the
    same estimator exactly while bounce RNG advances per frame."""
    import jax

    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
    from fspt_tpu.render.queue import compute_first_hits

    builder = build_bvh_scene(grid=10)
    scene = builder.compile()
    cam = builder.cameras[0]
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=3)
    inter = make_mesh_intersector(scene)
    fh = jax.jit(lambda: compute_first_hits(
        scene, cam, cfg, 7, 0, intersector=inter, chunk=128))()
    for frame in (0, 3):  # bounce counter advances, camera stream frozen
        ref = render_queued(scene, cam, cfg, 7, frame * cfg.spp,
                            intersector=inter, queue=256, cam_sample0=0)
        out = render_queued(scene, cam, cfg, 7, frame * cfg.spp,
                            intersector=inter, queue=256, cam_sample0=0,
                            first_hits=fh)
        np.testing.assert_allclose(np.asarray(ref.radiance),
                                   np.asarray(out.radiance),
                                   rtol=2e-3, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(ref.aov_mat),
                                      np.asarray(out.aov_mat))
        assert int(ref.segments) == int(out.segments)


def test_render_session_first_hit_cache_invalidation():
    """RenderSession keys the first-hit G-buffer on the camera pose:
    refine() reuses it while the camera is still, orbit invalidates."""
    from fspt_tpu.interactive import RenderSession

    b = build_bvh_scene(grid=10)
    cfg = RenderConfig(width=16, height=12, spp=1, max_depth=2)
    s = RenderSession(b, cfg, seed=3, first_hit_cache=True)
    assert s.refine(2) > 0
    assert s.path_name.endswith("first-hit cache")
    key1 = s._fh_key
    assert key1 is not None
    s.refine(1)
    assert s._fh_key == key1  # camera still → same G-buffer
    s.orbit(0.2, 0.0)
    s.refine(1)
    assert s._fh_key != key1  # pose changed → rebuilt


def test_warm_start_matches_uncached():
    """Warm-start first-hit design: depth-0 resolved outside the queue
    (pose prefill + per-frame shade + depth-1 enqueue) reproduces the
    uncached frozen-jitter render exactly — radiance, AOVs, and the
    reference segment accounting (cache-served depth-0 counts)."""
    import jax

    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
    from fspt_tpu.render.queue import compute_warm_pose, warm_frame

    builder = build_bvh_scene(grid=10)
    scene = builder.compile()
    cam = builder.cameras[0]
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=3)
    inter = make_mesh_intersector(scene)
    pose = jax.jit(lambda: compute_warm_pose(
        scene, cam, cfg, 7, 0, intersector=inter, chunk=128))()
    assert int(pose.n_live) > 0
    for frame in (0, 3):  # bounce counter advances, camera stream frozen
        ref = render_queued(scene, cam, cfg, 7, frame * cfg.spp,
                            intersector=inter, queue=256, cam_sample0=0)
        warm = warm_frame(scene, cam, cfg, pose, 7, frame * cfg.spp, 0)
        out = render_queued(scene, cam, cfg, 7, frame * cfg.spp,
                            intersector=inter, queue=256, cam_sample0=0,
                            warm=warm)
        np.testing.assert_allclose(np.asarray(ref.radiance),
                                   np.asarray(out.radiance),
                                   rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ref.aov_normal),
                                   np.asarray(out.aov_normal),
                                   rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ref.aov_depth),
                                   np.asarray(out.aov_depth), rtol=2e-3)
        np.testing.assert_array_equal(np.asarray(ref.aov_mat),
                                      np.asarray(out.aov_mat))
        assert int(ref.segments) == int(out.segments)


def test_warm_start_matches_uncached_cornell_fog():
    """Warm start on an analytic scene with fog + specular: the depth-0
    fog deferral and light clamp must survive the restructure (masks run
    per-lane, not per-iteration)."""
    import jax

    from fspt_tpu.ops.intersect import intersect_scene
    from fspt_tpu.render.queue import compute_warm_pose, warm_frame

    builder = build_cornell_box(with_specular=True, with_fog=True)
    scene = builder.compile()
    cam = builder.cameras[0]
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=4)

    def inter(o, d, alive=None):
        return intersect_scene(scene.geometry, o, d)

    inter.accepts_alive = True
    pose = jax.jit(lambda: compute_warm_pose(
        scene, cam, cfg, 11, 0, intersector=inter, chunk=128))()
    for frame in (0, 2):
        ref = render_queued(scene, cam, cfg, 11, frame * cfg.spp,
                            intersector=inter, queue=256, cam_sample0=0)
        warm = warm_frame(scene, cam, cfg, pose, 11, frame * cfg.spp, 0)
        out = render_queued(scene, cam, cfg, 11, frame * cfg.spp,
                            intersector=inter, queue=256, cam_sample0=0,
                            warm=warm)
        np.testing.assert_allclose(np.asarray(ref.radiance),
                                   np.asarray(out.radiance),
                                   rtol=2e-3, atol=2e-5)
        assert int(ref.segments) == int(out.segments)
