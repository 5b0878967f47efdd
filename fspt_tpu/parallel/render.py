"""Sharded forward rendering: scanline bands over a device mesh.

Each device owns ``height/n`` scanlines — the direct TPU analog of the
reference's per-thread bands (reference engine.cpp:174-182, 261-274) — via
``shard_map`` over the 1-D ``"rays"`` mesh axis.  The framebuffer *lives*
band-sharded on device, so the forward path needs no collective at all; only
the segment counter psums.  RNG streams key on global pixel ids, so the
rendered image is bit-identical for any device count (tested in
tests/test_sharding.py).
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from fspt_tpu.config import RenderConfig
from fspt_tpu.parallel.mesh import RAY_AXIS
from fspt_tpu.render import framebuffer as fb_mod
from fspt_tpu.render import integrator


def sharded_framebuffer(mesh, height: int, width: int) -> fb_mod.Framebuffer:
    """Create a framebuffer band-sharded over the mesh's ray axis."""
    fb = fb_mod.create(height, width)
    sharding = NamedSharding(mesh, P(RAY_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), fb)


def make_sharded_render_step(mesh, cfg: RenderConfig, intersector=None,
                             queue: int | None = None):
    """Build a jitted render step running one scanline band per device.

    ``intersector`` (static) is threaded to the integrator — this is how the
    fast per-bounce kernels (scene-specialized Pallas intersector, the
    culled-treelet mesh BVH sweep) run under the device mesh; the reference's
    parallel model is exactly "the hot path × N workers" (engine.cpp:261-274).
    For the camera-fused megakernel use :func:`make_sharded_megakernel_step`.

    ``queue`` switches each device's band onto the regenerating ray queue
    (render/queue.py) — full-occupancy bounce iterations per device, the
    configuration the mesh bench runs single-chip.  Requires a
    liveness-aware ``intersector``.
    """
    n = mesh.devices.size
    if cfg.height % n != 0:
        raise ValueError(f"height {cfg.height} not divisible by {n} devices")
    rows_local = cfg.height // n
    if queue is not None and intersector is None:
        raise ValueError("queue mode needs an intersector")

    def local_step(scene, camera, fb_local, seed, frame_idx):
        band = jax.lax.axis_index(RAY_AXIS)
        y0 = band * rows_local
        if queue is not None:
            from fspt_tpu.render.queue import render_queued

            out = render_queued(scene, camera, cfg, seed,
                                frame_idx * cfg.spp, y0=y0, rows=rows_local,
                                intersector=intersector, queue=queue)
            fb_local = fb_mod.accumulate(
                fb_local, out.radiance, out.aov_normal, out.aov_depth,
                out.aov_mat, rows_local, cfg.width, cfg.spp)
            segs = out.segments
        else:
            fb_local, segs = integrator.render_step(
                scene, camera, cfg, fb_local, seed, frame_idx, y0=y0,
                intersector=intersector,
            )
        return fb_local, jax.lax.psum(segs, RAY_AXIS)

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P(), P()),
        out_specs=(P(RAY_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_megakernel_step(mesh, scene_pack, camera, cfg: RenderConfig,
                                 **tracer_kwargs):
    """Band-sharded render step on the camera-fused Pallas megakernel.

    Each device traces its own contiguous lane band fully in-kernel (raygen
    + all bounces in VMEM) — the flagship forward path × N devices with zero
    forward collectives (only the segment counter psums).  RNG keys on
    global pixel ids, so output is bit-identical to the single-device
    megakernel (tested in tests/test_sharding.py).

    Returns ``step(fb, seed, frame_idx) → (fb, segments)`` with the scene
    and camera baked (recompile on change, like the single-chip tracer), or
    None when the scene can't be specialized.
    """
    from fspt_tpu.ops.pallas_path import make_camera_path_tracer

    tracer = make_camera_path_tracer(scene_pack, camera, cfg, **tracer_kwargs)
    if tracer is None:
        return None
    n = mesh.devices.size
    if cfg.height % n != 0:
        raise ValueError(f"height {cfg.height} not divisible by {n} devices")
    rows_local = cfg.height // n
    lanes_local = rows_local * cfg.width * cfg.spp

    def local_step(fb_local, seed, frame_idx):
        band = jax.lax.axis_index(RAY_AXIS)
        out = tracer(seed, frame_idx * cfg.spp, lane0=band * lanes_local,
                     n_lanes=lanes_local)
        fb_local = fb_mod.accumulate(
            fb_local, out.radiance, out.aov_normal, out.aov_depth,
            out.aov_mat, rows_local, cfg.width, cfg.spp,
        )
        return fb_local, jax.lax.psum(out.segments, RAY_AXIS)

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P(), P()),
        out_specs=(P(RAY_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn)
