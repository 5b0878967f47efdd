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


def make_sharded_render_step(mesh, cfg: RenderConfig):
    """Build a jitted render step running one scanline band per device."""
    n = mesh.devices.size
    if cfg.height % n != 0:
        raise ValueError(f"height {cfg.height} not divisible by {n} devices")
    rows_local = cfg.height // n

    def local_step(scene, camera, fb_local, seed, frame_idx):
        band = jax.lax.axis_index(RAY_AXIS)
        y0 = band * rows_local
        fb_local, segs = integrator.render_step(
            scene, camera, cfg, fb_local, seed, frame_idx, y0=y0
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
