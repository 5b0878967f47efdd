"""Multi-host rendering over ICI/DCN.

The reference has no cluster story (SURVEY.md §2.3, §5.8); its "collective
layer" is std::thread::join.  Here multi-host is the same code as
single-host: ``jax.distributed.initialize`` + a global mesh over all chips;
the scanline-band sharding (parallel/render.py) and pmean gradient reduction
(parallel/train.py) run over XLA collectives (ICI within a slice, DCN
across hosts) with no further changes — rendered images stay bit-identical
to single-chip output because RNG streams key on global pixel ids.

Scaling-efficiency harness per the driver metric (BASELINE.md: ≥85% rays/s
efficiency 1 chip → 1 host → N hosts).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from fspt_tpu.parallel.mesh import make_mesh
from fspt_tpu.parallel.render import make_sharded_render_step, sharded_framebuffer


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None):
    """Initialize multi-host JAX; no-op when single-process or already up."""
    if jax.process_count() > 1:
        return
    if coordinator_address is None and num_processes is None:
        return  # single-process (env-configured clusters auto-initialize)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def measure_scaling(scene, camera, cfg, device_counts=None, frames: int = 5,
                    seed: int = 7, use_megakernel: bool = False,
                    work_conserving: bool = False):
    """Rays/s at several mesh sizes → scaling efficiency table.

    Uses the devices visible to this process group (real chips multi-host,
    or the virtual CPU mesh in tests).  ``use_megakernel`` measures the
    camera-fused Pallas megakernel band step instead of the XLA integrator.

    ``work_conserving``: efficiency mode for *virtual* device meshes, where
    N logical devices share the same physical cores and throughput cannot
    scale.  Every mesh size renders the SAME full frame (split N ways), so
    ideal sharding costs constant wall time and ``efficiency =
    t_1dev / t_Ndev`` isolates the sharding overhead (partitioning,
    per-device dispatch, the segment psum).  On real chips leave False:
    each device then adds capacity and efficiency is rays/s vs linear.
    """
    from fspt_tpu.parallel.render import make_sharded_megakernel_step

    if device_counts is None:
        n = len(jax.devices())
        device_counts = sorted({1, max(1, n // 2), n})
    results = []
    for n_dev in device_counts:
        if cfg.height % n_dev:
            continue
        mesh = make_mesh(n_dev)
        fb = sharded_framebuffer(mesh, cfg.height, cfg.width)
        if use_megakernel:
            mk = make_sharded_megakernel_step(mesh, scene, camera, cfg)
            if mk is None:
                raise ValueError("scene can't use the megakernel")
            step = lambda sc, cam, fb_, sd, fr: mk(fb_, sd, fr)
        else:
            step = make_sharded_render_step(mesh, cfg)
        fb, segs = step(scene, camera, fb, seed, 0)  # compile + warm
        jax.block_until_ready(fb)
        t0 = time.time()
        for f in range(frames):
            fb, segs = step(scene, camera, fb, seed, f + 1)
        jax.block_until_ready(fb)
        dt = (time.time() - t0) / frames
        results.append(dict(devices=n_dev, rays_per_sec=int(segs) / dt,
                            wall_s=dt))
    if not results:
        return results
    if work_conserving:
        base_t = results[0]["wall_s"]
        for r in results:
            r["efficiency"] = base_t / r["wall_s"]
    else:
        base = results[0]["rays_per_sec"]
        for r in results:
            ideal = base * r["devices"] / results[0]["devices"]
            r["efficiency"] = r["rays_per_sec"] / ideal
    return results
