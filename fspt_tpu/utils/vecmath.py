"""Batched 3-vector math over ``[..., 3]`` jnp arrays.

TPU-native re-design of the reference's POD vector toolkit
(reference math/vector3.h, math/plane.h, math/normal.h): free functions over
trailing-axis-3 arrays so everything vmaps/shards trivially.  Semantics match
the reference where it matters for parity:

* ``reflect``: vector3.h:200-203 with the default reflectivity=1 → the
  standard mirror reflection.
* ``refract``: vector3.h:205-214 — ratio applied directly, total internal
  reflection yields the zero vector (the reference then normalizes the zero
  vector producing NaN; we return zero, which kills the lane instead).
* ``rotate``: vector3.h:315-333 (Rodrigues rotation).
* constants: math/base.h:80-83.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159262  # reference math/base.h:80
EPSILON = 1.0e-5  # reference math/base.h:83
INFINITY = 1.0e15  # reference math/base.h:82


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(dot(v, v))


def normalize(v):
    """Normalize; zero vectors map to zero (guards the reference's 0/0)."""
    n2 = dot(v, v)
    inv = jnp.where(n2 > 0.0, jnp.reciprocal(jnp.sqrt(jnp.where(n2 > 0.0, n2, 1.0))), 0.0)
    return v * inv[..., None]


def reflect(v, n):
    """Mirror reflection of incident ``v`` about normal ``n``."""
    return v - n * (2.0 * dot(n, v))[..., None]


def refract(v, n, index):
    """Snell refraction per vector3.h:205-214; TIR → zero vector.

    ``index`` is applied as the ratio directly (the reference does not track
    inside/outside eta); the output is normalized.
    """
    n_dot_v = -dot(v, n)
    sin2 = (index * index) * (1.0 - n_dot_v * n_dot_v)
    # The 1e-12 floor keeps sqrt's gradient finite at grazing/TIR angles.
    refr = v * index[..., None] + n * (index * n_dot_v - jnp.sqrt(jnp.maximum(1.0 - sin2, 1e-12)))[..., None]
    out = normalize(refr)
    return jnp.where((sin2 >= 1.0)[..., None], 0.0, out)


def rotate(v, angle, axis):
    """Rodrigues rotation of ``v`` by ``angle`` (radians) about unit ``axis``.

    Matches reference vector3.h:315-333 term-for-term.
    """
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    ic = 1.0 - c
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    ox = (c + ic * ax * ax) * x + (ic * ax * ay - az * s) * y + (ic * ax * az + ay * s) * z
    oy = (ic * ax * ay + az * s) * x + (c + ic * ay * ay) * y + (ic * ay * az - ax * s) * z
    oz = (ic * ax * az - ay * s) * x + (ic * ay * az + ax * s) * y + (c + ic * az * az) * z
    return jnp.stack([ox, oy, oz], axis=-1)


def make_plane(normal, point):
    """Plane (a,b,c,d) through ``point`` with ``normal``; plane.h:68-102."""
    d = -dot(normal, point)
    return jnp.concatenate([normal, d[..., None]], axis=-1)


def plane_distance(plane, point):
    return dot(plane[..., :3], point) + plane[..., 3]


def sphere_map_texcoords(normal):
    """Spherical environment texcoords; reference intersect.cpp:779-784."""
    u = jnp.arctan2(normal[..., 0], normal[..., 2]) / (2.0 * PI) + 0.5
    v = normal[..., 1] * 0.5 + 0.5
    return jnp.stack([u, 1.0 - v], axis=-1)


def planar_map_texcoords(point, normal):
    """Dominant-axis planar projection; reference intersect.cpp:769-777.

    Note the reference compares *signed* normal components with strict ``>``;
    we reproduce that exactly (including its behavior for negative normals).
    """
    n0, n1, n2 = normal[..., 0], normal[..., 1], normal[..., 2]
    p0, p1, p2 = point[..., 0], point[..., 1], point[..., 2]
    use_x = (n0 > n1) & (n0 > n2)
    use_y = (n1 > n0) & (n1 > n2) & ~use_x
    u = jnp.where(use_x, p1, jnp.where(use_y, p0, p0))
    v = jnp.where(use_x, p2, jnp.where(use_y, p2, p1))
    return jnp.stack([u, v], axis=-1)


def uniform_sphere_dir(u1, u2):
    """Uniform direction on the unit sphere from two uniforms.

    Replaces the reference's 32k-entry rejection-sampled table
    (math/normal.cpp:9-27) with the analytic area-preserving map; the
    distribution is identical (uniform over S²) but needs no table.
    """
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = (2.0 * PI) * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


# ---------------------------------------------------------------------------
# Component-planar ("SoA") variants.
#
# A TPU f32 array tiles its two minor dims to (8, 128); an [N, 3] vector
# array therefore pads 3 → 128 lanes and costs 42× its data in HBM whenever
# XLA materializes it (measured: a single [1M, 3] gather = 506 MB).  The hot
# wavefront paths keep every vector as three separate [N] planes and use
# these helpers; formulas mirror the [..., 3] versions above term-for-term
# so both paths agree to ulp order.


def dot_p(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def normalize_p(vx, vy, vz):
    """Planar :func:`normalize`: zero vectors map to zero."""
    n2 = vx * vx + vy * vy + vz * vz
    inv = jnp.where(n2 > 0.0,
                    jnp.reciprocal(jnp.sqrt(jnp.where(n2 > 0.0, n2, 1.0))),
                    0.0)
    return vx * inv, vy * inv, vz * inv


def reflect_p(vx, vy, vz, nx, ny, nz):
    d2 = 2.0 * (nx * vx + ny * vy + nz * vz)
    return vx - nx * d2, vy - ny * d2, vz - nz * d2


def refract_p(vx, vy, vz, nx, ny, nz, index):
    """Planar :func:`refract`; TIR → zero vector."""
    n_dot_v = -(vx * nx + vy * ny + vz * nz)
    sin2 = (index * index) * (1.0 - n_dot_v * n_dot_v)
    k = index * n_dot_v - jnp.sqrt(jnp.maximum(1.0 - sin2, 1e-12))
    rx, ry, rz = vx * index + nx * k, vy * index + ny * k, vz * index + nz * k
    ox, oy, oz = normalize_p(rx, ry, rz)
    tir = sin2 >= 1.0
    zero = jnp.zeros_like(ox)
    return (jnp.where(tir, zero, ox), jnp.where(tir, zero, oy),
            jnp.where(tir, zero, oz))


def rotate_p(vx, vy, vz, angle, ax, ay, az):
    """Planar Rodrigues rotation (vector3.h:315-333)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    ic = 1.0 - c
    ox = (c + ic * ax * ax) * vx + (ic * ax * ay - az * s) * vy + (ic * ax * az + ay * s) * vz
    oy = (ic * ax * ay + az * s) * vx + (c + ic * ay * ay) * vy + (ic * ay * az - ax * s) * vz
    oz = (ic * ax * az - ay * s) * vx + (ic * ay * az + ax * s) * vy + (c + ic * az * az) * vz
    return ox, oy, oz


def uniform_sphere_dir_p(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = (2.0 * PI) * u2
    return r * jnp.cos(phi), r * jnp.sin(phi), z


def sphere_map_texcoords_p(nx, ny, nz):
    u = jnp.arctan2(nx, nz) / (2.0 * PI) + 0.5
    v = ny * 0.5 + 0.5
    return u, 1.0 - v


def planar_map_texcoords_p(px, py, pz, nx, ny, nz):
    use_x = (nx > ny) & (nx > nz)
    use_y = (ny > nx) & (ny > nz) & ~use_x
    u = jnp.where(use_x, py, jnp.where(use_y, px, px))
    v = jnp.where(use_x, pz, jnp.where(use_y, pz, py))
    return u, v
