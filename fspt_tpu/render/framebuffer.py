"""Progressive accumulation framebuffer + AOVs + tonemap.

TPU re-design of ``DisplayFrame`` (reference frame.h:49-92, frame.cpp):
instead of per-pixel ``WritePixel`` calls the whole wavefront is folded into
the running mean in one scatter-free reshape, and the gamma/clamp display
conversion (frame.cpp:63-75) is a tiny jitted kernel.  AOV buffers
(normal/depth/material-id, frame.h:85-91) feed the denoiser.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Framebuffer(NamedTuple):
    mean: jnp.ndarray  # [H,W,3] running radiance mean
    count: jnp.ndarray  # [H,W] float32 samples accumulated
    normal: jnp.ndarray  # [H,W,3] last-sample normal AOV
    depth: jnp.ndarray  # [H,W] last-sample depth AOV
    mat: jnp.ndarray  # [H,W] int32 last-sample material id AOV


def create(height: int, width: int) -> Framebuffer:
    return Framebuffer(
        mean=jnp.zeros((height, width, 3), jnp.float32),
        count=jnp.zeros((height, width), jnp.float32),
        normal=jnp.zeros((height, width, 3), jnp.float32),
        depth=jnp.zeros((height, width), jnp.float32),
        mat=jnp.zeros((height, width), jnp.int32),
    )


def accumulate(fb: Framebuffer, radiance, aov_normal, aov_depth, aov_mat,
               height: int, width: int, spp: int) -> Framebuffer:
    """Fold an [H*W*spp,3] wavefront into the running mean.

    Equivalent to ``spp`` sequential WritePixel running-mean updates
    (frame.cpp:53-61): new = (mean·n + Σ samples)/(n + spp).  AOVs keep the
    last sample (frame.cpp:78-85 overwrites per call).
    """
    rad = radiance.reshape(height, width, spp, 3)
    new_count = fb.count + spp
    mean = (fb.mean * fb.count[..., None] + rad.sum(axis=2)) / new_count[..., None]
    return Framebuffer(
        mean=mean,
        count=new_count,
        normal=aov_normal.reshape(height, width, spp, 3)[:, :, -1],
        depth=aov_depth.reshape(height, width, spp)[:, :, -1],
        mat=aov_mat.reshape(height, width, spp)[:, :, -1],
    )


def to_display(image, gamma_correct: bool = True):
    """HDR mean → u8 display; reference frame.cpp:63-75 (gamma 1/2.2)."""
    x = jnp.clip(image, 0.0, 1.0)
    if gamma_correct:
        x = jnp.power(x, 1.0 / 2.2)
    return jnp.floor(255.0 * x + 0.5).astype(jnp.uint8)
