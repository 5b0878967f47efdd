"""Render-path selection shared by the app layer (cli, interactive).

The reference wires its fast engine into the app unconditionally
(reference main.cpp:157 → engine.cpp:253 → scene.cpp:227-248 — the octree
is always on); this module is the TPU analog: ONE cascade used by every
app entry point, so the product surface renders on the same machinery the
benchmarks measure —

1. BVH scenes → culled-treelet Pallas MXU sweep intersector streamed
   through the regenerating ray queue (the ``bench_mesh`` configuration),
2. analytic scenes → baked Pallas intersect kernel + XLA shade (the
   camera-fused megakernel is selected by callers with a FIXED camera,
   e.g. cli.py — it bakes camera constants into the kernel),
3. fallback → XLA flattened-BVH walk / brute force.

Steps returned here take the camera as a live argument, so interactive
orbit/focus does not recompile.
"""

from __future__ import annotations

from fspt_tpu.config import RenderConfig
from fspt_tpu.render import framebuffer as fb_mod
from fspt_tpu.render import integrator
from fspt_tpu.scene.builder import ScenePack


def make_scene_step(scene: ScenePack, cfg: RenderConfig, queue: int = None):
    """Fastest camera-dynamic render step for ``scene``.

    Returns ``(name, step)`` with
    ``step(scene, camera, fb, seed, frame_idx) → (fb, segments)``; ``name``
    identifies the chosen path (printed by the apps, pinned by tests).

    Baked-scene contract: fast-path intersectors bake the build-time
    scene's triangles/primitives; the ``scene`` passed to ``step`` feeds
    only live material/texture tables.
    """
    if scene.bvh is not None and cfg.edge_eps == 0.0:
        from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
        from fspt_tpu.render.queue import DEFAULT_QUEUE, render_queued

        inter = make_mesh_intersector(scene)
        if inter is not None:
            q = queue or DEFAULT_QUEUE

            def step(scene_in, camera, fb, seed, frame_idx):
                rows = fb.mean.shape[0]
                out = render_queued(scene_in, camera, cfg, seed,
                                    frame_idx * cfg.spp, rows=rows,
                                    intersector=inter, queue=q)
                fb = fb_mod.accumulate(fb, out.radiance, out.aov_normal,
                                       out.aov_depth, out.aov_mat,
                                       rows, cfg.width, cfg.spp)
                return fb, out.segments

            return "queued wavefront + pallas MXU-treelet BVH", step

    intersector = None
    if scene.bvh is None:
        from fspt_tpu.ops.pallas_trace import make_pallas_intersector

        intersector = make_pallas_intersector(scene.geometry)
    if intersector is not None:
        name = "pallas intersect + XLA shade"
    elif scene.bvh is not None:
        name = "XLA + flattened-BVH traversal"
    else:
        name = "XLA brute force"

    def step(scene_in, camera, fb, seed, frame_idx):
        return integrator.render_step(scene_in, camera, cfg, fb, seed,
                                      frame_idx, intersector=intersector)

    return name, step


def make_cached_scene_step(scene: ScenePack, cfg: RenderConfig,
                           queue: int = None):
    """First-hit-cached progressive step for BVH scenes (reference
    ImagePlaneCache, engine.h:46-65 + engine.cpp:33-105).

    Returns ``(name, step, cache_fn)`` where
    ``cache_fn(scene, camera, seed) → first_hits`` builds the depth-0
    G-buffer for the current camera pose and
    ``step(scene, camera, fb, seed, frame_idx, pose) → (fb, segments)``
    renders one progressive frame in WARM-START form: depth-0 is
    resolved outside the queue (misses/light hits pre-filled from the
    pose bundle; only possibly-alive lanes enqueue, directly at depth 1
    with per-frame shade state), so queue iterations drop by the primary
    share.  Bounce RNG advances per frame; the camera-uniform stream is
    frozen at ``cam_sample0=0`` — the estimator the reference's cache
    also computes, its cached collision being a frozen jittered primary.
    Returns ``(None, None, None)`` when the scene has no BVH-queued path
    or the config can't warm-start (fast_render / depth<2 / edge_eps) —
    callers fall back to :func:`make_scene_step`.  The session layer
    owns invalidation: rebuild the pose bundle whenever the camera
    changes (main.cpp:142-143).
    """
    if (scene.bvh is None or cfg.edge_eps != 0.0
            or cfg.effective_depth < 2 or cfg.fast_render):
        return None, None, None
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
    from fspt_tpu.render.queue import (DEFAULT_QUEUE, compute_warm_pose,
                                       render_queued, warm_frame)

    inter = make_mesh_intersector(scene)
    if inter is None:
        return None, None, None
    q = queue or DEFAULT_QUEUE

    def cache_fn(scene_in, camera, seed):
        return compute_warm_pose(scene_in, camera, cfg, seed, 0,
                                 intersector=inter, chunk=q)

    def step(scene_in, camera, fb, seed, frame_idx, pose):
        rows = fb.mean.shape[0]
        warm = warm_frame(scene_in, camera, cfg, pose, seed,
                          frame_idx * cfg.spp, 0, rows=rows)
        out = render_queued(scene_in, camera, cfg, seed,
                            frame_idx * cfg.spp, rows=rows,
                            intersector=inter, queue=q, cam_sample0=0,
                            warm=warm)
        fb = fb_mod.accumulate(fb, out.radiance, out.aov_normal,
                               out.aov_depth, out.aov_mat,
                               rows, cfg.width, cfg.spp)
        return fb, out.segments

    return ("queued wavefront + pallas MXU-treelet BVH + first-hit cache",
            step, cache_fn)
