"""TPU-native re-designs of the reference's remaining math-foundation modules.

Completes the SURVEY.md §2.2 inventory: quaternions, bezier curves/paths,
interpolation, statistics, linear regression, polynomial solvers, byte
hashing, and 4×4 matrix helpers.  The reference implements these as scalar
C++ (file:line cites below into /root/reference/source/math/); here every
function is batched jnp over arbitrary leading axes so it jits, vmaps, and
differentiates.  The tracer core does not depend on this module — the hot
intersection/shading math lives in ops/ and utils/vecmath.py — but the
capabilities exist for camera paths, scene tooling, and the denoiser's
statistics, matching the reference toolkit's surface.

Deliberate deviations from the reference (documented, not silent):

* ``slerp`` is the textbook great-arc interpolation.  The reference's
  formula (interpolate.h:60-117) divides by ``(1-frac)·ang`` in a way that
  is NaN at frac=1 and does not reduce to a rotation; it is unused in the
  reference tree.
* ``linear_squares`` solves the correct normal equations
  ``[[Σx²,Σx],[Σx,n]]``; the reference builds ``[[Σx²,Σx],[Σx,1]]``
  (regression.cpp:36) which only agrees when n==1.  Tests pin our version
  against numpy.polyfit instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fspt_tpu.utils import vecmath as vm

# ---------------------------------------------------------------------------
# Quaternions (reference math/quaternion.h; [..., 4] arrays ordered w,x,y,z)


def quat_from_axis_angle(axis, angle):
    """Unit quaternion rotating by ``angle`` about ``axis``
    (quaternion.h: from_axis_angle)."""
    v = vm.normalize(jnp.asarray(axis, jnp.float32))
    angle = jnp.asarray(angle, jnp.float32)
    s = jnp.sin(angle * 0.5)
    c = jnp.cos(angle * 0.5)
    return jnp.stack(
        [c, v[..., 0] * s, v[..., 1] * s, v[..., 2] * s], axis=-1)


def quat_to_axis_angle(q):
    """Inverse of :func:`quat_from_axis_angle` → ``(axis[...,3], angle)``
    (quaternion.h: to_axis_angle, returned there as <x,y,z,angle>)."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 1e-20))
    axis = q[..., 1:4] / s[..., None]
    # angle≈0 → axis is arbitrary; pick +x like a normalized zero vector.
    tiny = s[..., None] < 1e-6
    axis = jnp.where(tiny, jnp.array([1.0, 0.0, 0.0]), axis)
    return axis, angle


def quat_mul(a, b):
    """Hamilton product (quaternion.h: operator*)."""
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conjugate(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_normalize(q):
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q / jnp.sqrt(jnp.maximum(n2, 1e-20))


def quat_inverse(q):
    """Conjugate over squared norm (quaternion.h: inverse)."""
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return quat_conjugate(q) / jnp.maximum(n2, 1e-20)


def quat_rotate(q, v):
    """Rotate vector(s) ``v`` by unit quaternion(s) ``q`` — q·(0,v)·q*."""
    zero = jnp.zeros(v.shape[:-1] + (1,), v.dtype)
    p = jnp.concatenate([zero, v], axis=-1)
    return quat_mul(quat_mul(q, p), quat_conjugate(q))[..., 1:4]


def quat_between(v_from, v_to):
    """Quaternion rotating ``v_from`` onto ``v_to``
    (quaternion.h:201-207 rotation(from,to): axis=cross, angle=angle)."""
    f = vm.normalize(v_from)
    t = vm.normalize(v_to)
    axis = jnp.cross(f, t)
    # Parallel vectors → zero cross; fall back to any perpendicular axis.
    deg = vm.length(axis) < 1e-8
    alt = jnp.cross(f, jnp.array([1.0, 0.0, 0.0]))
    alt2 = jnp.cross(f, jnp.array([0.0, 1.0, 0.0]))
    alt = jnp.where((vm.length(alt) < 1e-8)[..., None], alt2, alt)
    axis = jnp.where(deg[..., None], alt, axis)
    cosang = jnp.clip(vm.dot(f, t), -1.0, 1.0)
    return quat_from_axis_angle(axis, jnp.arccos(cosang))


def quat_to_matrix3(q):
    """Row-major 3×3 rotation matrix (quaternion.cpp:26-41 to_matrix)."""
    w, x, y, z = (q[..., i] for i in range(4))
    x2, y2, z2 = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    rows = [
        [1 - 2 * (y2 + z2), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (x2 + z2), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (x2 + y2)],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def quat_slerp(a, b, frac):
    """Spherical interpolation between unit quaternions (shortest arc)."""
    d = jnp.sum(a * b, axis=-1)
    b = jnp.where(d[..., None] < 0, -b, b)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    straight = sin_t < 1e-6
    wa = jnp.where(straight, 1.0 - frac, jnp.sin((1.0 - frac) * theta)
                   / jnp.where(straight, 1.0, sin_t))
    wb = jnp.where(straight, frac, jnp.sin(frac * theta)
                   / jnp.where(straight, 1.0, sin_t))
    return quat_normalize(a * wa[..., None] + b * wb[..., None])


# ---------------------------------------------------------------------------
# Interpolation toolkit (reference math/interpolate.h)


def lerp(a, b, frac):
    """interpolate.h:43-57 — works for scalars and [...,K] alike."""
    return a + (b - a) * frac


def slerp(a, b, frac):
    """Great-arc interpolation of direction vectors (textbook form; see
    module docstring for why we do not transliterate interpolate.h:60-117)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    la = vm.length(a)
    lb = vm.length(b)
    an = vm.normalize(a)
    bn = vm.normalize(b)
    d = jnp.clip(vm.dot(an, bn), -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_t = jnp.sin(theta)
    straight = sin_t < 1e-6
    wa = jnp.where(straight, 1.0 - frac,
                   jnp.sin((1.0 - frac) * theta) / jnp.where(straight, 1.0, sin_t))
    wb = jnp.where(straight, frac,
                   jnp.sin(frac * theta) / jnp.where(straight, 1.0, sin_t))
    out = an * wa[..., None] + bn * wb[..., None]
    return vm.normalize(out) * lerp(la, lb, frac)[..., None]


def color_lerp(p0, c0, p1, c1, p2, c2, pos):
    """Barycentric color interpolation inside a triangle; black outside
    (interpolate.h:121-145).  All args broadcast over leading axes."""
    e0 = p1 - p0
    e1 = p2 - p0
    ep = pos - p0
    d00 = vm.dot(e0, e0)
    d01 = vm.dot(e0, e1)
    d11 = vm.dot(e1, e1)
    d20 = vm.dot(ep, e0)
    d21 = vm.dot(ep, e1)
    denom = d00 * d11 - d01 * d01
    safe = jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)
    u = (d11 * d20 - d01 * d21) / safe
    v = (d00 * d21 - d01 * d20) / safe
    inside = (u >= 0) & (v >= 0) & (u + v <= 1) & (jnp.abs(denom) > 1e-20)
    color = c0 + (c1 - c0) * u[..., None] + (c2 - c0) * v[..., None]
    return jnp.where(inside[..., None], color, 0.0)


def ease_in(a, b, frac):
    """Quadratic ease-in (interpolate.h:147-169)."""
    return (b - a) * (frac * frac) + a


def ease_over(a, b, frac):
    """Overshooting cosine ease (interpolate.h:171-199): travels past ``b``
    by 25% of a half period before settling."""
    over = 1.25
    trav = over * vm.PI
    sent = 1.0 / (1.0 - np.cos(trav))
    return a + (b - a) * (sent * (1.0 - jnp.cos(trav * frac)))


# ---------------------------------------------------------------------------
# Bezier curves and paths (reference math/curve.{h,cpp})
#
# The reference holds 2-4 control points per curve and evaluates one scalar
# t at a time (curve.cpp:5-52 de Casteljau).  TPU-native form: control
# points are a [K,3] array (K∈{2,3,4}) and ``t`` may be any-shaped — one
# fused evaluation yields the whole batch of samples, e.g. every camera
# position along a flythrough in one op.


def eval_bezier(control, t):
    """de Casteljau over ``control [K,3]`` at ``t [...]`` → ``[...,3]``.

    K=2/3/4 match evaluate_linear/quadratic/cubic_bezier (curve.cpp:5-52);
    t is clamped to [0,1] like curve::evaluate (curve.cpp:74-75).
    """
    control = jnp.asarray(control, jnp.float32)
    k = control.shape[0]
    if k < 2 or k > 4:
        raise ValueError("bezier curves take 2-4 control points "
                         "(reference curve.h:41-44)")
    t = jnp.clip(jnp.asarray(t, jnp.float32), 0.0, 1.0)[..., None]
    pts = [jnp.broadcast_to(c, t.shape[:-1] + (3,)) for c in control]
    while len(pts) > 1:
        pts = [a * (1.0 - t) + b * t for a, b in zip(pts[:-1], pts[1:])]
    return pts[0]


def eval_path(curves, t):
    """Evaluate a multi-curve path at global ``t∈[0,1]`` (curve.h:94-110).

    ``curves`` is a list of [K,3] control arrays; t is split into equal
    buckets, one per curve, exactly like path::evaluate.
    """
    n = len(curves)
    if n == 0:
        raise ValueError("empty path")
    t = jnp.clip(jnp.asarray(t, jnp.float32), 0.0, 1.0)
    scaled = jnp.minimum(t * n, n - 1e-6)
    idx = scaled.astype(jnp.int32)
    local = scaled - idx.astype(jnp.float32)
    outs = jnp.stack([eval_bezier(c, local) for c in curves], axis=0)
    return jnp.take_along_axis(
        outs, idx[None, ..., None].astype(jnp.int32), axis=0)[0]


# ---------------------------------------------------------------------------
# Statistics (reference math/statistics.{h,cpp}; population normalization)


def mean(x, axis=0):
    return jnp.mean(jnp.asarray(x, jnp.float32), axis=axis)


def variance(x, axis=0):
    """Population variance, ÷count (statistics.cpp compute_variance)."""
    x = jnp.asarray(x, jnp.float32)
    m = jnp.mean(x, axis=axis, keepdims=True)
    return jnp.mean((x - m) ** 2, axis=axis)


def deviation(x, axis=0):
    return jnp.sqrt(variance(x, axis=axis))


def covariance(a, b, axis=0):
    """Component-wise population covariance (statistics.cpp)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    ma = jnp.mean(a, axis=axis, keepdims=True)
    mb = jnp.mean(b, axis=axis, keepdims=True)
    return jnp.mean((a - ma) * (b - mb), axis=axis)


def linear_squares(points):
    """Least-squares line through 2-D ``points [N,2]`` → (start, end).

    Returns the segment spanning [min x, max x] on the fitted line, the
    shape of regression.cpp:6-105's output (see module docstring for the
    normal-equation fix).
    """
    p = jnp.asarray(points, jnp.float32)
    x, y = p[..., 0], p[..., 1]
    n = jnp.float32(p.shape[-2])
    sx = jnp.sum(x, axis=-1)
    sy = jnp.sum(y, axis=-1)
    sxx = jnp.sum(x * x, axis=-1)
    sxy = jnp.sum(x * y, axis=-1)
    det = sxx * n - sx * sx
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    m = (sxy * n - sx * sy) / safe
    b = (sxx * sy - sx * sxy) / safe
    x0 = jnp.min(x, axis=-1)
    x1 = jnp.max(x, axis=-1)
    start = jnp.stack([x0, m * x0 + b], axis=-1)
    end = jnp.stack([x1, m * x1 + b], axis=-1)
    return start, end


# ---------------------------------------------------------------------------
# Polynomial solvers (reference math/solver.h), branch-free and batched:
# roots come back as a fixed-width array + count, NaN-free for any input.


def solve_quadratic(a, b, c):
    """Real roots of at²+bt+c → ``(roots[...,2], count[...])``
    (solver.h:48-84; root order matches: (-b+√D)/2a first)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = 1.0 / jnp.where(jnp.abs(a) > 1e-30, 2.0 * a, 1.0)
    r0 = (-b + sq) * inv2a
    r1 = (-b - sq) * inv2a
    count = jnp.where(disc > 0, 2, jnp.where(disc == 0, 1, 0))
    roots = jnp.stack([r0, jnp.where(count == 2, r1, 0.0)], axis=-1)
    roots = jnp.where(count[..., None] > 0, roots, 0.0)
    return roots, count


def solve_cubic(e, a, b, c):
    """Real roots of et³+at²+bt+c → ``(roots[...,3], count[...])``.

    Trigonometric/Cardano closed form following solver.h:146-216: one root
    when the discriminant d<0, three (with multiplicity) otherwise.
    """
    e = jnp.asarray(e, jnp.float32)
    a = jnp.asarray(a, jnp.float32) / e
    b = jnp.asarray(b, jnp.float32) / e
    c = jnp.asarray(c, jnp.float32) / e
    p = (-1.0 / 3.0) * a * a + b
    q = (2.0 / 27.0) * a * a * a - (1.0 / 3.0) * a * b + c
    d = -4.0 * p * p * p - 27.0 * q * q
    d_pr = -d / 108.0
    p_pr = p / 3.0
    q_pr = q / 2.0
    sq = jnp.sqrt(jnp.maximum(d_pr, 0.0))
    r_base = -q_pr + sq
    s_base = -q_pr - sq
    cbrt = lambda v: jnp.sign(v) * jnp.abs(v) ** (1.0 / 3.0)
    r = cbrt(r_base)
    s = cbrt(s_base)
    one = (r + s) - a / 3.0

    # d >= 0 → three real roots via the trig form (solver.h:182-215).
    pp = jnp.maximum(-p_pr, 1e-30)
    # pp³ underflows f32 for tiny pp (e.g. a triple root has p=q=0); the
    # clamped denominator keeps 0/0 out while amp≈0 still collapses all
    # three trig roots onto -a/3, the correct multiplicity-3 root.
    denom = jnp.sqrt(jnp.maximum(pp * pp * pp, 1e-30))
    cos_arg = jnp.clip(-q_pr / denom, -1.0, 1.0)
    theta = jnp.arccos(cos_arg) / 3.0
    amp = 2.0 * jnp.sqrt(pp)
    t0 = amp * jnp.cos(theta) - a / 3.0
    t1 = amp * jnp.cos(theta + 2.0 * vm.PI / 3.0) - a / 3.0
    t2 = amp * jnp.cos(theta - 2.0 * vm.PI / 3.0) - a / 3.0

    three = d >= 0
    roots = jnp.stack([
        jnp.where(three, t0, one),
        jnp.where(three, t1, 0.0),
        jnp.where(three, t2, 0.0),
    ], axis=-1)
    count = jnp.where(three, 3, 1)
    return roots, count


# ---------------------------------------------------------------------------
# Byte hashing (reference math/hash.h:40-51) — host-side scene/asset util.


def hash_bytes(data) -> int:
    """Modified-Bernstein hash, bit-exact with hash.h:40-51 (uint32 wrap)."""
    arr = np.frombuffer(bytes(data), dtype=np.uint8)
    h = 5381
    for cbyte in arr:
        c = int(cbyte)
        h = ((h << 5) + h + (h << 16) * c * c) & 0xFFFFFFFF
    return h


# ---------------------------------------------------------------------------
# 4×4 matrix helpers (reference math/matrix4.h; row-vector convention —
# the reference stores column-major GL-style m[col*4+row] and multiplies
# M·v; we expose standard row-major [...,4,4] acting on column vectors).


def mat4_identity():
    return jnp.eye(4, dtype=jnp.float32)


def mat4_translation(t):
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(jnp.asarray(t, jnp.float32))


def mat4_scale(s):
    s = jnp.asarray(s, jnp.float32)
    return jnp.diag(jnp.concatenate([s, jnp.ones(1, jnp.float32)]))


def mat4_rotation(axis, angle):
    """Axis-angle rotation (matrix4.h rotation; same Rodrigues terms as
    vecmath.rotate)."""
    r3 = quat_to_matrix3(quat_from_axis_angle(axis, angle))
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, :3].set(r3)


def mat4_perspective(fov_y, aspect, z_near, z_far):
    """D3D-style projection with fovx=fovy·aspect (matrix4.h:422-438)."""
    fov_x = fov_y * aspect
    w = 1.0 / np.tan(fov_x * 0.5)
    h = 1.0 / np.tan(fov_y * 0.5)
    clip = z_far / (z_far - z_near)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(w).at[1, 1].set(h)
    m = m.at[2, 2].set(clip).at[2, 3].set(-clip * z_near)
    m = m.at[3, 2].set(1.0)
    return m


def mat4_look_at(origin, target, up=(0.0, 1.0, 0.0)):
    """Camera-to-world orientation at ``origin`` facing ``target``
    (matrix4.h:455-466: right = up×view, up' = view×right)."""
    origin = jnp.asarray(origin, jnp.float32)
    view = vm.normalize(jnp.asarray(target, jnp.float32) - origin)
    right = vm.normalize(jnp.cross(jnp.asarray(up, jnp.float32), view))
    new_up = vm.normalize(jnp.cross(view, right))
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, 0].set(right).at[:3, 1].set(new_up).at[:3, 2].set(view)
    return m.at[:3, 3].set(origin)


def mat4_inverse(m):
    return jnp.linalg.inv(m)


def transform_points(m, pts):
    """Apply ``m [4,4]`` to ``pts [...,3]`` with w-divide."""
    pts = jnp.asarray(pts, jnp.float32)
    homo = jnp.concatenate([pts, jnp.ones(pts.shape[:-1] + (1,), jnp.float32)],
                           axis=-1)
    out = homo @ m.T
    return out[..., :3] / out[..., 3:4]


def transform_dirs(m, dirs):
    """Apply the linear part of ``m`` to direction vectors."""
    return jnp.asarray(dirs, jnp.float32) @ m[:3, :3].T
