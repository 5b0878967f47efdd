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
    m2: jnp.ndarray  # [H,W,3] running sum of squared deviations (Welford)
    count: jnp.ndarray  # [H,W] float32 samples accumulated
    normal: jnp.ndarray  # [H,W,3] last-sample normal AOV
    depth: jnp.ndarray  # [H,W] last-sample depth AOV
    mat: jnp.ndarray  # [H,W] int32 last-sample material id AOV


def create(height: int, width: int) -> Framebuffer:
    return Framebuffer(
        mean=jnp.zeros((height, width, 3), jnp.float32),
        m2=jnp.zeros((height, width, 3), jnp.float32),
        count=jnp.zeros((height, width), jnp.float32),
        normal=jnp.zeros((height, width, 3), jnp.float32),
        depth=jnp.zeros((height, width), jnp.float32),
        mat=jnp.zeros((height, width), jnp.int32),
    )


def accumulate(fb: Framebuffer, radiance, aov_normal, aov_depth, aov_mat,
               height: int, width: int, spp: int) -> Framebuffer:
    """Fold an [H*W*spp,3] wavefront into the running mean + variance.

    The mean matches ``spp`` sequential WritePixel running-mean updates
    (frame.cpp:53-61): new = (mean·n + Σ samples)/(n + spp).  The m2 buffer
    is a Chan-et-al parallel Welford combine, feeding the variance-adaptive
    denoiser (the statistics.h:45-71 toolkit's intended use).  AOVs keep the
    last sample (frame.cpp:78-85 overwrites per call).
    """
    rad = radiance.reshape(height, width, spp, 3)
    n_old = fb.count[..., None]
    n_new = n_old + spp
    batch_mean = rad.mean(axis=2)
    batch_m2 = ((rad - batch_mean[:, :, None, :]) ** 2).sum(axis=2)
    delta = batch_mean - fb.mean
    mean = (fb.mean * n_old + rad.sum(axis=2)) / n_new
    m2 = fb.m2 + batch_m2 + (delta * delta) * (n_old * spp) / n_new
    return Framebuffer(
        mean=mean,
        m2=m2,
        count=fb.count + spp,
        normal=aov_normal.reshape(height, width, spp, 3)[:, :, -1],
        depth=aov_depth.reshape(height, width, spp)[:, :, -1],
        mat=aov_mat.reshape(height, width, spp)[:, :, -1],
    )


def variance_of_mean(fb: Framebuffer):
    """Per-pixel estimator variance of the accumulated mean, [H,W,3]."""
    n = jnp.maximum(fb.count, 1.0)[..., None]
    sample_var = fb.m2 / jnp.maximum(n - 1.0, 1.0)
    return sample_var / n


def to_display(image, gamma_correct: bool = True):
    """HDR mean → u8 display; reference frame.cpp:63-75 (gamma 1/2.2)."""
    x = jnp.clip(image, 0.0, 1.0)
    if gamma_correct:
        x = jnp.power(x, 1.0 / 2.2)
    return jnp.floor(255.0 * x + 0.5).astype(jnp.uint8)
