"""Flat device-tensor scene geometry.

Re-designs the reference's polymorphic ``Object`` hierarchy
(reference object.h:84-152, object.cpp) as typed primitive struct-of-arrays
that batched kernels intersect in parallel (SURVEY.md §7 "pointer trees →
tensor trees").  Host-side construction mirrors each reference constructor's
math exactly so hit results are comparable:

* spheres: object.cpp:17-21
* planes: object.cpp:38-57
* discs: object.cpp:75-95
* quads: object.cpp:167-211 (including the *unnormalized* tangent frame and
  its degenerate-for-axis-aligned-normals behavior)
* cuboids: object.cpp:115-124 + math/volume.cpp:230-247, 434-445 (8 vertices,
  6 outward face planes, rotation about the center)
* triangle meshes: mesh.cpp:135-152 (per-face plane precompute) with
  per-vertex shading normals/texcoords for barycentric interpolation
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Invalid-collision sentinel; reference math/trace.cpp:18-21.
INVALID_PARAM = 2.0


class GeometryPack(NamedTuple):
    """All scene primitives as padded device tensors (each type ≥1 row)."""

    sph_center: jnp.ndarray  # [S,3]
    sph_radius: jnp.ndarray  # [S]
    sph_mat: jnp.ndarray  # [S] int32
    sph_valid: jnp.ndarray  # [S] bool

    pln_plane: jnp.ndarray  # [P,4]
    pln_mat: jnp.ndarray
    pln_valid: jnp.ndarray

    dsc_plane: jnp.ndarray  # [D,4]
    dsc_origin: jnp.ndarray  # [D,3]
    dsc_radius: jnp.ndarray  # [D]
    dsc_mat: jnp.ndarray
    dsc_valid: jnp.ndarray

    qud_plane: jnp.ndarray  # [Q,4]
    qud_origin: jnp.ndarray  # [Q,3]
    qud_tangent: jnp.ndarray  # [Q,3] (unnormalized, reference semantics)
    qud_bitangent: jnp.ndarray  # [Q,3]
    qud_half_w: jnp.ndarray  # [Q]
    qud_half_h: jnp.ndarray  # [Q]
    qud_mat: jnp.ndarray
    qud_valid: jnp.ndarray

    cub_planes: jnp.ndarray  # [C,6,4]
    cub_mat: jnp.ndarray
    cub_valid: jnp.ndarray

    tri_v0: jnp.ndarray  # [T,3]
    tri_e1: jnp.ndarray  # [T,3] v1-v0
    tri_e2: jnp.ndarray  # [T,3] v2-v0
    tri_ng: jnp.ndarray  # [T,3] unit geometric normal (face plane normal)
    tri_area2: jnp.ndarray  # [T] |e1×e2| for the parallel-ray epsilon
    tri_n0: jnp.ndarray  # [T,3] shading normals (== ng when mesh lacks them)
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_t0: jnp.ndarray  # [T,2] vertex texcoords (zeros when absent)
    tri_t1: jnp.ndarray
    tri_t2: jnp.ndarray
    tri_mat: jnp.ndarray  # [T] int32
    tri_valid: jnp.ndarray  # [T] bool

    @property
    def counts(self):
        return {
            "spheres": int(self.sph_valid.sum()),
            "planes": int(self.pln_valid.sum()),
            "discs": int(self.dsc_valid.sum()),
            "quads": int(self.qud_valid.sum()),
            "cuboids": int(self.cub_valid.sum()),
            "triangles": int(self.tri_valid.sum()),
        }


# ---------------------------------------------------------------------------
# Host-side (NumPy) constructors


def _normalize(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v * 0.0


def make_plane(normal, point):
    normal = np.asarray(normal, np.float32)
    point = np.asarray(point, np.float32)
    return np.concatenate([normal, [-float(np.dot(normal, point))]]).astype(np.float32)


def plane_from_points(a, b, c):
    """calculate_plane over three CCW points (reference math/plane.h)."""
    a, b, c = (np.asarray(p, np.float32) for p in (a, b, c))
    n = _normalize(np.cross(b - a, c - a))
    return make_plane(n, a)


def quad_from_normal(origin, normal, width, height):
    """QuadObject(origin, normal, w, h); reference object.cpp:167-189."""
    origin = np.asarray(origin, np.float32)
    normalized = _normalize(np.asarray(normal, np.float32))
    up = np.array([0.0, 1.0, 0.0], np.float32)
    bitangent = np.cross(normalized, up)  # NOT normalized (reference quirk)
    tangent = np.cross(normalized, bitangent)
    return dict(
        plane=make_plane(normalized, origin),
        origin=origin,
        tangent=tangent.astype(np.float32),
        bitangent=bitangent.astype(np.float32),
        half_w=np.float32(width * 0.5),
        half_h=np.float32(height * 0.5),
    )


def quad_from_uv(position, u, v):
    """QuadObject(position, u, v); reference object.cpp:191-211."""
    position = np.asarray(position, np.float32)
    u = np.asarray(u, np.float32)
    v = np.asarray(v, np.float32)
    normal = _normalize(np.cross(u, v))
    origin = position + u * 0.5 + v * 0.5
    return dict(
        plane=make_plane(normal, position),
        origin=origin.astype(np.float32),
        tangent=_normalize(v).astype(np.float32),
        bitangent=_normalize(u).astype(np.float32),
        half_w=np.float32(np.linalg.norm(u) * 0.5),
        half_h=np.float32(np.linalg.norm(v) * 0.5),
    )


def _cube_vertices(vmin, vmax):
    """Vertex ordering of cube::operator=(bounds); volume.cpp:262-280."""
    (x0, y0, z0), (x1, y1, z1) = vmin, vmax
    return np.array(
        [
            [x0, y0, z0], [x1, y0, z0], [x1, y0, z1], [x0, y0, z1],
            [x0, y1, z0], [x1, y1, z0], [x1, y1, z1], [x0, y1, z1],
        ],
        np.float32,
    )


def _cube_planes(v):
    """Face planes of a (possibly rotated) cube; volume.cpp:234-247."""
    return np.stack(
        [
            plane_from_points(v[0], v[1], v[2]),  # bottom
            plane_from_points(v[6], v[5], v[4]),  # top
            plane_from_points(v[5], v[6], v[2]),  # right
            plane_from_points(v[7], v[4], v[0]),  # left
            plane_from_points(v[4], v[5], v[1]),  # front
            plane_from_points(v[6], v[7], v[3]),  # back
        ]
    )


def _rotate_about_axis(points, angle, axis):
    axis = _normalize(np.asarray(axis, np.float32))
    c, s = np.cos(angle), np.sin(angle)
    ic = 1.0 - c
    ax, ay, az = axis
    rot = np.array(
        [
            [c + ic * ax * ax, ic * ax * ay - az * s, ic * ax * az + ay * s],
            [ic * ax * ay + az * s, c + ic * ay * ay, ic * ay * az - ax * s],
            [ic * ax * az - ay * s, ic * ay * az + ax * s, c + ic * az * az],
        ],
        np.float32,
    )
    return points @ rot.T


def cuboid_planes(origin, width, height, depth, rot_axis=None, rot_angle=0.0):
    """CuboidObject + optional Rotate; object.cpp:115-124, volume.cpp:434-445."""
    origin = np.asarray(origin, np.float32)
    half = np.array([width, height, depth], np.float32) * 0.5
    verts = _cube_vertices(origin - half, origin + half)
    if rot_axis is not None and rot_angle:
        center = verts.mean(axis=0)
        verts = _rotate_about_axis(verts - center, rot_angle, rot_axis) + center
    return _cube_planes(verts)


# ---------------------------------------------------------------------------
# Packing


def _pad_rows(rows, pad_row, count=None):
    rows = list(rows)
    n = max(1, len(rows)) if count is None else count
    valid = np.zeros(n, bool)
    valid[: len(rows)] = True
    while len(rows) < n:
        rows.append(pad_row)
    return np.asarray(rows, np.float32), valid


def pack_geometry(spheres, planes, discs, quads, cuboids, triangles) -> GeometryPack:
    """Pack host-side primitive dicts into the device SoA pack.

    ``triangles`` is a dict of arrays (v0, v1, v2, n0..n2, t0..t2, mat) or None.
    """
    j = jnp.asarray

    sph, sph_valid = _pad_rows(
        [list(s["center"]) + [s["radius"], s["mat"]] for s in spheres],
        [0, 0, 0, -1, 0],
    )
    pln, pln_valid = _pad_rows(
        [list(p["plane"]) + [p["mat"]] for p in planes], [0, 1, 0, 1e9, 0]
    )
    dsc, dsc_valid = _pad_rows(
        [list(d["plane"]) + list(d["origin"]) + [d["radius"], d["mat"]] for d in discs],
        [0, 1, 0, 1e9, 0, 0, 0, -1, 0],
    )
    qud, qud_valid = _pad_rows(
        [
            list(q["plane"]) + list(q["origin"]) + list(q["tangent"])
            + list(q["bitangent"]) + [q["half_w"], q["half_h"], q["mat"]]
            for q in quads
        ],
        [0, 1, 0, 1e9] + [0] * 9 + [-1, -1, 0],
    )
    if cuboids:
        cub_planes = np.stack([c["planes"] for c in cuboids]).astype(np.float32)
        cub_mat = np.array([c["mat"] for c in cuboids], np.int32)
        cub_valid = np.ones(len(cuboids), bool)
    else:
        cub_planes = np.zeros((1, 6, 4), np.float32)
        cub_planes[:, :, 3] = 1e9
        cub_mat = np.zeros(1, np.int32)
        cub_valid = np.zeros(1, bool)

    if triangles is not None and len(triangles["v0"]):
        v0 = np.asarray(triangles["v0"], np.float32)
        v1 = np.asarray(triangles["v1"], np.float32)
        v2 = np.asarray(triangles["v2"], np.float32)
        e1, e2 = v1 - v0, v2 - v0
        cr = np.cross(e1, e2)
        area2 = np.linalg.norm(cr, axis=-1)
        ng = cr / np.where(area2 > 0, area2, 1.0)[:, None]
        n0 = np.asarray(triangles.get("n0", ng), np.float32)
        n1 = np.asarray(triangles.get("n1", ng), np.float32)
        n2 = np.asarray(triangles.get("n2", ng), np.float32)
        t0 = np.asarray(triangles.get("t0", np.zeros((len(v0), 2))), np.float32)
        t1 = np.asarray(triangles.get("t1", np.zeros((len(v0), 2))), np.float32)
        t2 = np.asarray(triangles.get("t2", np.zeros((len(v0), 2))), np.float32)
        tri_mat = np.asarray(triangles["mat"], np.int32)
        tri_valid = np.ones(len(v0), bool)
    else:
        v0 = np.zeros((1, 3), np.float32)
        e1 = np.array([[1.0, 0, 0]], np.float32)
        e2 = np.array([[0, 1.0, 0]], np.float32)
        ng = np.array([[0, 0, 1.0]], np.float32)
        area2 = np.ones(1, np.float32)
        n0 = n1 = n2 = ng
        t0 = t1 = t2 = np.zeros((1, 2), np.float32)
        tri_mat = np.zeros(1, np.int32)
        tri_valid = np.zeros(1, bool)

    sph_mat = np.array([s["mat"] for s in spheres], np.int32) if spheres else np.zeros(1, np.int32)
    pln_mat = np.array([p["mat"] for p in planes], np.int32) if planes else np.zeros(1, np.int32)
    dsc_mat = np.array([d["mat"] for d in discs], np.int32) if discs else np.zeros(1, np.int32)
    qud_mat = np.array([q["mat"] for q in quads], np.int32) if quads else np.zeros(1, np.int32)

    return GeometryPack(
        sph_center=j(sph[:, :3]),
        sph_radius=j(sph[:, 3]),
        sph_mat=j(sph_mat, jnp.int32),
        sph_valid=j(sph_valid),
        pln_plane=j(pln[:, :4]),
        pln_mat=j(pln_mat, jnp.int32),
        pln_valid=j(pln_valid),
        dsc_plane=j(dsc[:, :4]),
        dsc_origin=j(dsc[:, 4:7]),
        dsc_radius=j(dsc[:, 7]),
        dsc_mat=j(dsc_mat, jnp.int32),
        dsc_valid=j(dsc_valid),
        qud_plane=j(qud[:, :4]),
        qud_origin=j(qud[:, 4:7]),
        qud_tangent=j(qud[:, 7:10]),
        qud_bitangent=j(qud[:, 10:13]),
        qud_half_w=j(qud[:, 13]),
        qud_half_h=j(qud[:, 14]),
        qud_mat=j(qud_mat, jnp.int32),
        qud_valid=j(qud_valid),
        cub_planes=j(cub_planes),
        cub_mat=j(cub_mat, jnp.int32),
        cub_valid=j(cub_valid),
        tri_v0=j(v0),
        tri_e1=j(e1),
        tri_e2=j(e2),
        tri_ng=j(ng),
        tri_area2=j(area2),
        tri_n0=j(n0),
        tri_n1=j(n1),
        tri_n2=j(n2),
        tri_t0=j(t0),
        tri_t1=j(t1),
        tri_t2=j(t2),
        tri_mat=j(tri_mat, jnp.int32),
        tri_valid=j(tri_valid),
    )
