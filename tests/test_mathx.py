"""Tests for fspt_tpu.utils.mathx — the SURVEY §2.2 math-foundation parity
module (reference math/{quaternion,interpolate,curve,statistics,regression,
solver,hash,matrix4}).  Oracles are NumPy closed forms, not the reference
binary, because several reference functions are unused/buggy there (see the
module docstring's documented deviations)."""

import numpy as np
import pytest

from fspt_tpu.utils import mathx as mx


# ---------------------------------------------------------------------------
# Quaternions


def test_quat_axis_angle_roundtrip():
    rng = np.random.default_rng(0)
    axis = rng.normal(size=3)
    angle = 1.234
    q = np.asarray(mx.quat_from_axis_angle(axis, angle))
    ax2, ang2 = mx.quat_to_axis_angle(q)
    np.testing.assert_allclose(float(ang2), angle, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ax2), axis / np.linalg.norm(axis), rtol=1e-4, atol=1e-6)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    axis = rng.normal(size=3)
    angle = 0.77
    v = rng.normal(size=(5, 3)).astype(np.float32)
    q = mx.quat_from_axis_angle(axis, angle)
    r = np.asarray(mx.quat_to_matrix3(q))
    out_q = np.asarray(mx.quat_rotate(np.broadcast_to(np.asarray(q), (5, 4)), v))
    out_m = v @ r.T
    np.testing.assert_allclose(out_q, out_m, rtol=1e-4, atol=1e-5)


def test_quat_mul_identity_and_inverse():
    rng = np.random.default_rng(2)
    q = np.asarray(mx.quat_normalize(rng.normal(size=4).astype(np.float32)))
    ident = np.array([1.0, 0, 0, 0], np.float32)
    np.testing.assert_allclose(np.asarray(mx.quat_mul(q, ident)), q, atol=1e-6)
    qq = np.asarray(mx.quat_mul(q, np.asarray(mx.quat_inverse(q))))
    np.testing.assert_allclose(qq, ident, atol=1e-5)


def test_quat_between_rotates_from_onto_to():
    rng = np.random.default_rng(3)
    f = rng.normal(size=3)
    t = rng.normal(size=3)
    q = mx.quat_between(f, t)
    out = np.asarray(mx.quat_rotate(np.asarray(q), np.asarray(f, np.float32)))
    np.testing.assert_allclose(out / np.linalg.norm(out),
                               t / np.linalg.norm(t), atol=1e-4)


def test_quat_between_parallel_degenerate():
    v = np.array([0.0, 2.0, 0.0])
    q = np.asarray(mx.quat_between(v, v))
    out = np.asarray(mx.quat_rotate(q, np.asarray(v, np.float32)))
    np.testing.assert_allclose(out, v, atol=1e-4)


def test_quat_slerp_endpoints_and_midpoint():
    a = np.asarray(mx.quat_from_axis_angle([0, 1, 0], 0.0))
    b = np.asarray(mx.quat_from_axis_angle([0, 1, 0], 1.0))
    np.testing.assert_allclose(np.asarray(mx.quat_slerp(a, b, 0.0)), a, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mx.quat_slerp(a, b, 1.0)), b, atol=1e-6)
    mid = np.asarray(mx.quat_slerp(a, b, 0.5))
    expect = np.asarray(mx.quat_from_axis_angle([0, 1, 0], 0.5))
    np.testing.assert_allclose(mid, expect, atol=1e-5)


# ---------------------------------------------------------------------------
# Interpolation


def test_lerp_and_eases():
    assert float(mx.lerp(2.0, 4.0, 0.25)) == pytest.approx(2.5)
    assert float(mx.ease_in(0.0, 1.0, 0.5)) == pytest.approx(0.25)
    # ease_over hits its endpoints exactly (interpolate.h:171-199).
    assert float(mx.ease_over(1.0, 3.0, 0.0)) == pytest.approx(1.0, abs=1e-5)
    assert float(mx.ease_over(1.0, 3.0, 1.0)) == pytest.approx(3.0, abs=1e-5)
    # ... and overshoots in between.
    vals = [float(mx.ease_over(0.0, 1.0, f)) for f in np.linspace(0, 1, 21)]
    assert max(vals) > 1.01


def test_slerp_unit_vectors_great_arc():
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    mid = np.asarray(mx.slerp(a, b, 0.5))
    s2 = np.sqrt(0.5)
    np.testing.assert_allclose(mid, [s2, s2, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(mx.slerp(a, b, 0.0)), a, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mx.slerp(a, b, 1.0)), b, atol=1e-6)


def test_slerp_interpolates_length():
    a = np.array([2.0, 0.0, 0.0])
    b = np.array([0.0, 4.0, 0.0])
    mid = np.asarray(mx.slerp(a, b, 0.5))
    assert np.linalg.norm(mid) == pytest.approx(3.0, rel=1e-5)


def test_color_lerp_inside_and_outside():
    p0, p1, p2 = (np.array([0.0, 0, 0]), np.array([1.0, 0, 0]),
                  np.array([0.0, 1, 0]))
    c0, c1, c2 = (np.array([1.0, 0, 0]), np.array([0.0, 1, 0]),
                  np.array([0.0, 0, 1]))
    centroid = (p0 + p1 + p2) / 3
    out = np.asarray(mx.color_lerp(p0, c0, p1, c1, p2, c2, centroid))
    np.testing.assert_allclose(out, [1 / 3, 1 / 3, 1 / 3], atol=1e-5)
    outside = np.asarray(mx.color_lerp(p0, c0, p1, c1, p2, c2,
                                       np.array([5.0, 5.0, 0.0])))
    np.testing.assert_allclose(outside, 0.0)
    # Vertices return their own colors.
    np.testing.assert_allclose(
        np.asarray(mx.color_lerp(p0, c0, p1, c1, p2, c2, p1)), c1, atol=1e-5)


# ---------------------------------------------------------------------------
# Bezier curves / paths


def _de_casteljau_np(control, t):
    pts = [np.asarray(c, np.float64) for c in control]
    while len(pts) > 1:
        pts = [a * (1 - t) + b * t for a, b in zip(pts[:-1], pts[1:])]
    return pts[0]


@pytest.mark.parametrize("k", [2, 3, 4])
def test_bezier_matches_de_casteljau(k):
    rng = np.random.default_rng(k)
    control = rng.normal(size=(k, 3))
    ts = np.linspace(0, 1, 9)
    got = np.asarray(mx.eval_bezier(control, ts))
    want = np.stack([_de_casteljau_np(control, t) for t in ts])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bezier_clamps_t():
    control = np.array([[0.0, 0, 0], [1.0, 0, 0]])
    np.testing.assert_allclose(np.asarray(mx.eval_bezier(control, -3.0)),
                               [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(mx.eval_bezier(control, 7.0)),
                               [1, 0, 0], atol=1e-6)


def test_bezier_rejects_bad_order():
    with pytest.raises(ValueError):
        mx.eval_bezier(np.zeros((5, 3)), 0.5)


def test_path_buckets_t_per_curve():
    # Two linear segments: (0,0,0)->(1,0,0) then (1,0,0)->(1,1,0).
    curves = [np.array([[0.0, 0, 0], [1.0, 0, 0]]),
              np.array([[1.0, 0, 0], [1.0, 1, 0]])]
    np.testing.assert_allclose(np.asarray(mx.eval_path(curves, 0.25)),
                               [0.5, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(mx.eval_path(curves, 0.75)),
                               [1.0, 0.5, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(mx.eval_path(curves, 1.0)),
                               [1.0, 1.0, 0], atol=1e-4)


# ---------------------------------------------------------------------------
# Statistics / regression


def test_statistics_match_numpy_population_forms():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(64, 3)).astype(np.float32)
    y = rng.normal(size=(64, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(mx.mean(x)), x.mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mx.variance(x)), x.var(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mx.deviation(x)), x.std(0), rtol=1e-4)
    want_cov = ((x - x.mean(0)) * (y - y.mean(0))).mean(0)
    np.testing.assert_allclose(np.asarray(mx.covariance(x, y)), want_cov,
                               rtol=1e-4, atol=1e-6)


def test_linear_squares_matches_polyfit():
    rng = np.random.default_rng(8)
    x = rng.uniform(-3, 5, size=32)
    y = 2.5 * x - 1.25 + rng.normal(scale=0.3, size=32)
    pts = np.stack([x, y], axis=-1).astype(np.float32)
    start, end = mx.linear_squares(pts)
    start, end = np.asarray(start), np.asarray(end)
    m, b = np.polyfit(x, y, 1)
    np.testing.assert_allclose(start[0], x.min(), rtol=1e-5)
    np.testing.assert_allclose(end[0], x.max(), rtol=1e-5)
    np.testing.assert_allclose(start[1], m * x.min() + b, rtol=1e-3)
    np.testing.assert_allclose(end[1], m * x.max() + b, rtol=1e-3)


# ---------------------------------------------------------------------------
# Solvers


def test_solve_quadratic_two_one_zero_roots():
    roots, count = mx.solve_quadratic(1.0, -3.0, 2.0)  # (t-1)(t-2)
    assert int(count) == 2
    np.testing.assert_allclose(sorted(np.asarray(roots)), [1.0, 2.0], atol=1e-5)
    # Root ordering matches solver.h:67-68: (-b+sqrt)/2a first.
    np.testing.assert_allclose(np.asarray(roots), [2.0, 1.0], atol=1e-5)
    _, count1 = mx.solve_quadratic(1.0, -2.0, 1.0)  # (t-1)^2
    assert int(count1) == 1
    _, count0 = mx.solve_quadratic(1.0, 0.0, 1.0)  # no real roots
    assert int(count0) == 0


def test_solve_quadratic_batched():
    a = np.ones(3, np.float32)
    b = np.array([-3.0, -2.0, 0.0], np.float32)
    c = np.array([2.0, 1.0, 1.0], np.float32)
    roots, count = mx.solve_quadratic(a, b, c)
    assert list(np.asarray(count)) == [2, 1, 0]
    assert np.all(np.isfinite(np.asarray(roots)))


@pytest.mark.parametrize("coeffs", [
    (1.0, -6.0, 11.0, -6.0),   # roots 1,2,3
    (2.0, 0.0, -8.0, 0.0),     # roots -2,0,2 (scaled leading coeff)
    (1.0, 0.0, 0.0, -8.0),     # single real root 2
    (1.0, -3.0, 3.0, -1.0),    # triple root 1
])
def test_solve_cubic_matches_numpy_roots(coeffs):
    roots, count = mx.solve_cubic(*coeffs)
    roots = np.asarray(roots)[: int(count)]
    want = np.roots(coeffs)
    want = np.sort(want[np.abs(want.imag) < 1e-6].real)
    got = np.sort(roots)
    # count may exceed the number of *distinct* real roots (multiplicity);
    # every returned root must satisfy the polynomial.
    e, a, b, c = coeffs
    resid = e * got**3 + a * got**2 + b * got + c
    np.testing.assert_allclose(resid, 0.0, atol=1e-3)
    assert got.min() >= want.min() - 1e-3 and got.max() <= want.max() + 1e-3


# ---------------------------------------------------------------------------
# Hash


def test_hash_bytes_matches_reference_formula():
    # Bit-exact mirror of hash.h:40-51 in pure Python.
    def ref_hash(data):
        h = 5381
        for ch in data:
            h = ((h << 5) + h + (h << 16) * ch * ch) & 0xFFFFFFFF
        return h

    for data in (b"", b"a", b"hello world", bytes(range(256))):
        assert mx.hash_bytes(data) == ref_hash(data)


# ---------------------------------------------------------------------------
# mat4 helpers


def test_mat4_trs_compose_and_apply():
    t = mx.mat4_translation([1.0, 2.0, 3.0])
    s = mx.mat4_scale([2.0, 2.0, 2.0])
    p = np.array([[1.0, 1.0, 1.0]], np.float32)
    out = np.asarray(mx.transform_points(np.asarray(t) @ np.asarray(s), p))
    np.testing.assert_allclose(out, [[3.0, 4.0, 5.0]], atol=1e-6)


def test_mat4_rotation_matches_quat():
    axis, angle = [0.3, -0.5, 0.81], 0.9
    r = np.asarray(mx.mat4_rotation(axis, angle))
    v = np.array([1.0, 2.0, -0.5], np.float32)
    got = np.asarray(mx.transform_dirs(r, v))
    want = np.asarray(mx.quat_rotate(
        np.asarray(mx.quat_from_axis_angle(axis, angle)), v))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mat4_look_at_basis_is_orthonormal_and_faces_target():
    m = np.asarray(mx.mat4_look_at([0.0, 0, -10], [0.0, 0, 0]))
    basis = m[:3, :3]
    np.testing.assert_allclose(basis.T @ basis, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(basis[:, 2], [0, 0, 1], atol=1e-6)  # view +z
    np.testing.assert_allclose(m[:3, 3], [0, 0, -10], atol=1e-6)


def test_mat4_perspective_maps_near_far():
    znear, zfar = 1.0, 100.0
    m = np.asarray(mx.mat4_perspective(np.deg2rad(45.0), 4 / 3, znear, zfar))
    near_pt = np.asarray(mx.transform_points(m, np.array([0.0, 0, znear])))
    far_pt = np.asarray(mx.transform_points(m, np.array([0.0, 0, zfar])))
    np.testing.assert_allclose(near_pt[2], 0.0, atol=1e-5)
    np.testing.assert_allclose(far_pt[2], 1.0, atol=1e-5)


def test_mat4_inverse_roundtrip():
    m = (np.asarray(mx.mat4_translation([1.0, -2, 0.5]))
         @ np.asarray(mx.mat4_rotation([0, 1, 0], 0.4))
         @ np.asarray(mx.mat4_scale([2.0, 3.0, 4.0])))
    inv = np.asarray(mx.mat4_inverse(m))
    np.testing.assert_allclose(inv @ m, np.eye(4), atol=1e-5)
