"""Intersection kernel unit tests vs. tiny closed-form oracles.

Covers the reference edge cases called out in SURVEY.md §4.1: origin inside
sphere (intersect.cpp:450-456), one-sided planes (728-744), quad bounds
(object.cpp:213-237), cuboid faces (object.cpp:126-165), triangles.
"""

import jax.numpy as jnp
import numpy as np

from fspt_tpu import materials as M
from fspt_tpu.materials import MaterialSpec
from fspt_tpu.ops import intersect as I
from fspt_tpu.scene.builder import SceneBuilder


def geom_of(b):
    return b.compile().geometry


def trace(b, start, seg):
    g = geom_of(b)
    start = jnp.atleast_2d(jnp.asarray(start, jnp.float32))
    seg = jnp.atleast_2d(jnp.asarray(seg, jnp.float32))
    return I.intersect_scene(g, start, seg)


def simple_builder():
    b = SceneBuilder()
    b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(1, 1, 1)))
    return b


def test_sphere_outside_hit():
    b = simple_builder()
    b.add_sphere((0, 0, 10), 2.0, 0)
    h = trace(b, [0, 0, 0], [0, 0, 100])
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]) * 100, 8.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, -1], atol=1e-5)


def test_sphere_inside_chooses_far_root():
    b = simple_builder()
    b.add_sphere((0, 0, 0), 5.0, 0)
    h = trace(b, [0, 0, 0], [0, 0, 100])
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]) * 100, 5.0, rtol=1e-5)
    # Outward normal at the exit point; the scene-level flip handles interiors.
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-5)


def test_sphere_miss_and_behind():
    b = simple_builder()
    b.add_sphere((0, 0, -10), 2.0, 0)  # behind the ray
    h = trace(b, [0, 0, 0], [0, 0, 100])
    assert not bool(h.hit[0])
    assert float(h.t[0]) == 2.0


def test_plane_two_sided_param():
    b = simple_builder()
    b.add_plane((0, 0, -1), (0, 0, 50), 0)
    h = trace(b, [0, 0, 0], [0, 0, 100])
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 0.5, rtol=1e-5)
    # Parallel ray → no hit (intersect.cpp:736-739).
    h2 = trace(b, [0, 0, 0], [100, 0, 0])
    assert not bool(h2.hit[0])


def test_quad_bounds():
    b = simple_builder()
    b.add_quad_uv((-10, -10, 50), (20, 0, 0), (0, 20, 0), 0)
    h = trace(b, [0, 0, 0], [0, 0, 100])
    assert bool(h.hit[0])
    h2 = trace(b, [40, 0, 0], [0, 0, 100])
    assert not bool(h2.hit[0])


def test_disc_bounds():
    b = simple_builder()
    b.add_disc((0, 0, 50), (0, 0, -1), 5.0, 0)
    assert bool(trace(b, [0, 0, 0], [0, 0, 100]).hit[0])
    assert not bool(trace(b, [8, 0, 0], [0, 0, 100]).hit[0])


def test_cuboid_faces_and_rotation():
    b = simple_builder()
    b.add_cuboid((0, 0, 50), 10, 10, 10, 0)
    h = trace(b, [0, 0, 0], [0, 0, 100])
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]) * 100, 45.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, -1], atol=1e-5)
    # Miss past the corner.
    assert not bool(trace(b, [8, 8, 0], [0, 0, 100]).hit[0])

    b2 = simple_builder()
    b2.add_cuboid((0, 0, 50), 10, 10, 10, 0, rot_axis=(0, 1, 0), rot_angle=np.pi / 4)
    h2 = trace(b2, [0, 0, 0], [0, 0, 100])
    assert bool(h2.hit[0])
    # Rotated 45°: the near corner now points at the camera at z = 50-5√2.
    np.testing.assert_allclose(float(h2.t[0]) * 100, 50 - 5 * np.sqrt(2), rtol=1e-4)


def test_triangle_hit_and_barycentrics():
    b = simple_builder()
    b.add_triangles(
        v0=[[-10, -10, 50]], v1=[[10, -10, 50]], v2=[[0, 10, 50]], mat=0,
        t0=[[0, 0]], t1=[[1, 0]], t2=[[0, 1]],
    )
    h = trace(b, [0, -5, 0], [0, 0, 100])
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 0.5, rtol=1e-5)
    assert not bool(trace(b, [0, 20, 0], [0, 0, 100]).hit[0])


def test_closest_wins_across_types():
    b = simple_builder()
    b.add_sphere((0, 0, 30), 2.0, 0)
    b.add_quad_uv((-10, -10, 50), (20, 0, 0), (0, 20, 0), 0)
    h = trace(b, [0, 0, 0], [0, 0, 100])
    assert int(h.prim_kind[0]) == I.KIND_SPHERE
    np.testing.assert_allclose(float(h.t[0]) * 100, 28.0, rtol=1e-5)


def test_random_scene_brute_force_vs_oracle():
    """Device intersector vs. the NumPy oracle tracer on random rays."""
    from fspt_tpu.render import oracle

    rs = np.random.RandomState(0)
    b = simple_builder()
    for _ in range(8):
        b.add_sphere(rs.uniform(-20, 20, 3), rs.uniform(1, 5), 0)
    for _ in range(4):
        p = rs.uniform(-20, 20, 3)
        u = rs.uniform(-10, 10, 3)
        v = rs.uniform(-10, 10, 3)
        b.add_quad_uv(p, u, v, 0)
    for _ in range(3):
        b.add_cuboid(rs.uniform(-20, 20, 3), *rs.uniform(2, 8, 3), 0)

    starts = rs.uniform(-30, 30, (64, 3)).astype(np.float32)
    dirs = rs.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    segs = dirs * 200.0

    h = trace(b, starts, segs)
    for k in range(64):
        ohit = oracle.trace_scene(b, starts[k], segs[k])
        if ohit is None:
            assert not bool(h.hit[k]), k
        else:
            assert bool(h.hit[k]), k
            np.testing.assert_allclose(float(h.t[k]), ohit.t, rtol=1e-4, atol=1e-6)
