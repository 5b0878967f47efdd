"""Camera model and primary-ray generation.

Re-designs the reference's per-thread camera setup + per-pixel ray loop
(reference engine.cpp:184-244, camera.h:43-63, camera.cpp:6-24) as a single
vectorized, differentiable kernel producing a ``[N, 3]`` ray SoA for the full
``H×W×spp`` wavefront.

Rays are *segment-parameterized* exactly like the reference (math/trace.h:40-54):
a ray is ``(start, seg)`` with points ``start + seg * t`` for ``t ∈ [0, 1]``,
where ``seg`` spans all the way to the far plane.  Keeping this convention
gives bit-comparable `t` values against the oracle and sidesteps the
reference's non-normalized direction subtleties.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fspt_tpu.ops import rng
from fspt_tpu.utils import vecmath as vm


class Camera(NamedTuple):
    """Differentiable camera parameters; defaults per reference camera.cpp:6-24."""

    origin: jnp.ndarray  # [3]
    target: jnp.ndarray  # [3]
    fov_y: jnp.ndarray  # degrees
    aperture_size: jnp.ndarray
    focal_depth: jnp.ndarray
    z_near: jnp.ndarray
    z_far: jnp.ndarray

    @classmethod
    def create(
        cls,
        origin=(0.0, 0.0, -200.0),
        target=(0.0, 0.0, 0.0),
        fov_y=45.0,
        aperture_size=1.5,
        focal_depth=80.0,
        z_near=1.0,
        z_far=10000.0,
    ) -> "Camera":
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            origin=f32(origin),
            target=f32(target),
            fov_y=f32(fov_y),
            aperture_size=f32(aperture_size),
            focal_depth=f32(focal_depth),
            z_near=f32(z_near),
            z_far=f32(z_far),
        )


def camera_basis(camera: Camera):
    """Forward/right/up basis; reference engine.cpp:187-189 (world up = +Y)."""
    forward = vm.normalize(camera.target - camera.origin)
    up_world = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    right = vm.normalize(jnp.cross(up_world, forward))
    up = vm.normalize(jnp.cross(forward, right))
    return forward, right, up


def generate_rays(camera: Camera, width: int, height: int, spp: int, seed, sample0,
                  y0=0, rows=None):
    """Build the primary-ray wavefront.

    Returns ``(start[N,3], seg[N,3], pixel_idx[N], sample_idx[N])`` with
    ``N = rows*width*spp``, lanes ordered pixel-major then sample so pixel
    ``p``'s samples are contiguous.

    ``y0``/``rows`` select a horizontal band of scanlines — the sharding unit
    (the TPU analog of the reference's per-thread bands, engine.cpp:181-182).
    ``pixel_idx`` stays *global*, so RNG streams — and therefore the rendered
    image — are invariant to how the band is sharded across devices.

    Semantics per reference engine.cpp:205-244:
    * ±0.5px uniform jitter anti-aliasing,
    * pinhole projection through a far-plane-sized virtual image plane,
    * thin-lens depth of field when ``aperture_size > 0``: intersect the focal
      plane, jitter the origin on a uniform aperture disk, re-aim through the
      focal point.
    """
    if rows is None:
        rows = height
    lanes = jnp.arange(rows * width * spp, dtype=jnp.int32)
    return rays_for_lanes(camera, width, height, spp, seed, sample0, lanes,
                          y0=y0)


def rays_for_lanes(camera: Camera, width: int, height: int, spp: int, seed,
                   sample0, lanes, y0=0):
    """Primary rays for arbitrary band-local lane indices.

    ``lanes`` is any int32 vector of indices into the band's
    ``(rows, width, spp)`` lane space (lane = (row·width + x)·spp + s); the
    full-band iota reproduces :func:`generate_rays` bit-exactly.  This is the
    regeneration hook for the queued integrator (render/queue.py): refilled
    lanes draw the *same* camera-uniform stream as the monolithic wavefront,
    so the two schedules render identical samples.
    """
    forward, right, up = camera_basis(camera)

    fovy = camera.fov_y * (vm.PI / 180.0)
    aspect = jnp.float32(width) / jnp.float32(height)
    fovx = 2.0 * jnp.arctan(jnp.tan(fovy * 0.5) * aspect)
    half_proj_h = jnp.tan(fovy * 0.5) * camera.z_far
    half_proj_w = jnp.tan(fovx * 0.5) * camera.z_far
    proj_origin = camera.origin + forward * camera.z_far

    lanes = jnp.asarray(lanes, jnp.int32)
    ys = lanes // (width * spp) + jnp.asarray(y0, jnp.int32)
    xs = (lanes // spp) % width
    ss = lanes % spp
    pixel_idx = ys * width + xs
    sample_idx = (ss + jnp.asarray(sample0, jnp.int32)).astype(jnp.int32)
    i = xs.astype(jnp.float32)
    j = ys.astype(jnp.float32)

    u = rng.camera_uniforms(seed, pixel_idx, sample_idx)  # [N,4]
    aa_x = u[:, 0] - 0.5
    aa_y = u[:, 1] - 0.5

    x_dist = half_proj_w * (((i + aa_x) / (width - 1)) * 2.0 - 1.0)
    y_dist = half_proj_h * (((j + aa_y) / (height - 1)) * 2.0 - 1.0)
    stop = proj_origin[None, :] + right[None, :] * x_dist[:, None] + up[None, :] * y_dist[:, None]

    start = jnp.broadcast_to(camera.origin, stop.shape)
    seg = stop - start

    # Thin-lens DoF (engine.cpp:221-244). The focal plane faces back at the
    # camera (normal = -forward) and passes through origin + forward*focal_depth.
    focal_plane = vm.make_plane(-forward, camera.origin + forward * camera.focal_depth)
    ts = vm.dot(jnp.broadcast_to(focal_plane[:3], seg.shape), seg)
    ns = -(vm.dot(jnp.broadcast_to(focal_plane[:3], start.shape), start) + focal_plane[3])
    t_focal = ns / jnp.where(jnp.abs(ts) < vm.EPSILON, 1.0, ts)
    focal_valid = (jnp.abs(ts) >= vm.EPSILON) & (t_focal >= 0.0) & (t_focal <= 1.0)
    focal_point = start + seg * t_focal[:, None]

    angle = u[:, 2] * (2.0 * vm.PI)
    mag = jnp.sqrt(u[:, 3]) * camera.aperture_size
    offset = (
        right[None, :] * (jnp.cos(angle) * mag)[:, None]
        + up[None, :] * (jnp.sin(angle) * mag)[:, None]
    )
    dof_start = start + offset
    dof_seg = vm.normalize(focal_point - dof_start) * camera.z_far

    use_dof = (camera.aperture_size > 0.0) & focal_valid
    start = jnp.where(use_dof[:, None], dof_start, start)
    seg = jnp.where(use_dof[:, None], dof_seg, seg)

    return start, seg, pixel_idx, sample_idx


def probe_ray(camera: Camera, width: int, height: int, x, y):
    """Un-jittered center ray for pixel (x, y); reference engine.cpp:298-321.

    Used by the distance probe (click-to-focus / TraceRange).
    """
    forward, right, up = camera_basis(camera)
    fovy = camera.fov_y * (vm.PI / 180.0)
    aspect = jnp.float32(width) / jnp.float32(height)
    fovx = 2.0 * jnp.arctan(jnp.tan(fovy * 0.5) * aspect)
    half_proj_h = jnp.tan(fovy * 0.5) * camera.z_far
    half_proj_w = jnp.tan(fovx * 0.5) * camera.z_far
    proj_origin = camera.origin + forward * camera.z_far
    x_dist = half_proj_w * ((jnp.float32(x) / (width - 1)) * 2.0 - 1.0)
    y_dist = half_proj_h * ((jnp.float32(y) / (height - 1)) * 2.0 - 1.0)
    stop = proj_origin + right * x_dist + up * y_dist
    return camera.origin, stop - camera.origin
