"""Batched ray–primitive intersection kernels.

Re-designs the reference's scalar intersection library
(reference math/intersect.cpp) as mask-based, branch-free kernels over the
whole ray wavefront — the TPU replacement for the "HOT LOOP" inner calls of
SURVEY.md §3.2.  Rays are segment-parameterized ``start + seg·t, t∈[0,1]``
(math/trace.h:40-54); a miss is ``t = 2.0`` (math/trace.cpp:18-21).

Parity notes per kernel:

* sphere — intersect.cpp:421-488 including the inside-origin farthest-root
  choice.
* plane — the "faster but less stable" one-sided path intersect.cpp:728-745:
  any |n·seg| ≥ ε with t∈[0,1] hits; the normal is the plane normal
  regardless of facing (the scene-level backface flip happens later,
  scene.cpp:238-247).
* quad — object.cpp:213-237 (plane hit + unnormalized tangent-frame bound
  test).
* disc — object.cpp:97-113.
* cuboid — object.cpp:126-165: nearest face plane whose hit point is inside
  all four adjacent half-spaces.
* triangle — Möller–Trumbore instead of the reference's planar-projected
  barycentrics (intersect.cpp:348-419): same u/v convention
  (u along v1−v0, v along v2−v0), chosen for differentiability and fewer
  FLOPs; the parallel-ray epsilon is scaled to match the reference's
  unit-normal test.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fspt_tpu.scene.geometry import GeometryPack, INVALID_PARAM
from fspt_tpu.utils import vecmath as vm


class Hit(NamedTuple):
    """Per-lane closest-hit record (the wavefront ObjectCollision,
    reference object.h:47-61)."""

    t: jnp.ndarray  # [N] param in [0,1]; INVALID_PARAM = miss
    point: jnp.ndarray  # [N,3]
    normal: jnp.ndarray  # [N,3] shading normal (pre backface-flip)
    texcoords: jnp.ndarray  # [N,2]
    mat: jnp.ndarray  # [N] int32 material row
    prim_kind: jnp.ndarray  # [N] int32 (0..5) winning primitive type
    hit: jnp.ndarray  # [N] bool
    # World-space distance from the hit point to the winning triangle's
    # nearest edge (+inf for non-triangles); differentiable w.r.t. vertices.
    # Drives the edge-reparameterized silhouette gradients (integrator).
    edge_dist: jnp.ndarray | None = None
    # Winning triangle's original index (−1 for analytic prims / misses).
    # Set by the BVH mesh path; lets hit-id replay (ops/diff_intersect.py)
    # re-derive the hit differentiably from traced vertex arrays.
    prim_id: jnp.ndarray | None = None


# Primitive kind codes (argmin tie order = this order).
KIND_SPHERE, KIND_PLANE, KIND_DISC, KIND_QUAD, KIND_CUBOID, KIND_TRIANGLE = range(6)


def _best(t_candidates, valid):
    """Masked min over the primitive axis → (t_best [N], idx [N])."""
    t = jnp.where(valid, t_candidates, INVALID_PARAM)
    idx = jnp.argmin(t, axis=-1)
    return jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0], idx


def _plane_t(plane, start, seg):
    """One-sided fast ray-plane over [N,P]; intersect.cpp:728-745."""
    n = plane[..., :3]
    ts = jnp.einsum("pk,nk->np", n, seg, precision="highest")
    ns = -(jnp.einsum("pk,nk->np", n, start, precision="highest") + plane[..., 3][None, :])
    not_parallel = jnp.abs(ts) >= vm.EPSILON
    t = ns / jnp.where(not_parallel, ts, 1.0)
    valid = not_parallel & (t >= 0.0) & (t <= 1.0)
    return t, valid


def intersect_spheres(g: GeometryPack, start, seg):
    oc = start[:, None, :] - g.sph_center[None, :, :]  # [N,S,3]
    a = vm.dot(seg, seg)[:, None]
    b = 2.0 * jnp.sum(oc * seg[:, None, :], axis=-1)
    oc2 = jnp.sum(oc * oc, axis=-1)
    c = oc2 - (g.sph_radius * g.sph_radius)[None, :]
    d = b * b - 4.0 * a * c
    # where-guard (not max) so missing rays (d<0) don't emit 0·inf = NaN in
    # the backward pass: sqrt is only evaluated where the hit is valid.
    sq = jnp.sqrt(jnp.where(d >= 0.0, d, 1.0))
    inside = oc2 <= (g.sph_radius * g.sph_radius)[None, :]
    t = jnp.where(inside, -b + sq, -b - sq) / (2.0 * a)
    valid = (d >= 0.0) & (t >= 0.0) & (t <= 1.0) & g.sph_valid[None, :]
    t_best, idx = _best(t, valid)
    center = g.sph_center[idx]
    point = start + seg * t_best[:, None]
    normal = vm.normalize(point - center)
    return t_best, dict(point=point, normal=normal, mat=g.sph_mat[idx], center=center)


def intersect_planes(g: GeometryPack, start, seg):
    t, valid = _plane_t(g.pln_plane, start, seg)
    t_best, idx = _best(t, valid & g.pln_valid[None, :])
    point = start + seg * t_best[:, None]
    normal = g.pln_plane[idx, :3]
    return t_best, dict(point=point, normal=normal, mat=g.pln_mat[idx])


def intersect_discs(g: GeometryPack, start, seg):
    t, valid = _plane_t(g.dsc_plane, start, seg)
    point_all = start[:, None, :] + seg[:, None, :] * t[..., None]
    in_radius = vm.length(point_all - g.dsc_origin[None]) <= g.dsc_radius[None, :]
    t_best, idx = _best(t, valid & in_radius & g.dsc_valid[None, :])
    point = start + seg * t_best[:, None]
    normal = g.dsc_plane[idx, :3]
    return t_best, dict(point=point, normal=normal, mat=g.dsc_mat[idx])


def intersect_quads(g: GeometryPack, start, seg):
    t, valid = _plane_t(g.qud_plane, start, seg)
    point_all = start[:, None, :] + seg[:, None, :] * t[..., None]
    ph = point_all - g.qud_origin[None]
    tangent_dist = jnp.sum(g.qud_tangent[None] * ph, axis=-1)
    bitangent_dist = jnp.sum(g.qud_bitangent[None] * ph, axis=-1)
    inside = (jnp.abs(bitangent_dist) <= g.qud_half_w[None, :]) & (
        jnp.abs(tangent_dist) <= g.qud_half_h[None, :]
    )
    t_best, idx = _best(t, valid & inside & g.qud_valid[None, :])
    point = start + seg * t_best[:, None]
    normal = g.qud_plane[idx, :3]
    return t_best, dict(point=point, normal=normal, mat=g.qud_mat[idx])


def intersect_cuboids(g: GeometryPack, start, seg):
    planes = g.cub_planes  # [C,6,4]
    n = planes[..., :3]
    ts = jnp.einsum("cfk,nk->ncf", n, seg, precision="highest")
    ns = -(jnp.einsum("cfk,nk->ncf", n, start, precision="highest") + planes[..., 3][None])
    not_parallel = jnp.abs(ts) >= vm.EPSILON
    t = ns / jnp.where(not_parallel, ts, 1.0)  # [N,C,6]
    valid = not_parallel & (t >= 0.0) & (t <= 1.0)

    point = start[:, None, None, :] + seg[:, None, None, :] * t[..., None]  # [N,C,6,3]
    # Adjacent-face half-space test (object.cpp:140-150): for face i, every
    # face j with j//2 != i//2 must have plane_distance(point) <= 0.
    dists = jnp.einsum("cjk,ncfk->ncfj", n, point, precision="highest") + planes[..., 3][None, :, None, :]
    fi = jnp.arange(6)[:, None] // 2
    fj = jnp.arange(6)[None, :] // 2
    adjacent = (fi != fj)[None, None]  # [1,1,6,6]
    inside = jnp.all(jnp.where(adjacent, dists <= 0.0, True), axis=-1)  # [N,C,6]

    t_face = jnp.where(valid & inside, t, INVALID_PARAM)
    t_cub = jnp.min(t_face, axis=-1)  # [N,C]
    face = jnp.argmin(t_face, axis=-1)
    t_best, idx = _best(t_cub, (t_cub < INVALID_PARAM) & g.cub_valid[None, :])
    face_best = jnp.take_along_axis(face, idx[:, None], axis=-1)[:, 0]
    point_best = start + seg * t_best[:, None]
    normal = planes[idx, face_best, :3]
    return t_best, dict(point=point_best, normal=normal, mat=g.cub_mat[idx])


def intersect_triangles(g: GeometryPack, start, seg):
    """Möller–Trumbore over [N,T]; barycentric outputs for interpolation."""
    pvec = jnp.cross(seg[:, None, :], g.tri_e2[None])  # [N,T,3]
    det = jnp.sum(g.tri_e1[None] * pvec, axis=-1)
    # Parallel-ray rejection equivalent to |n·seg| < ε with unit n
    # (intersect.cpp:736-739): |det| = |n·seg|·|e1×e2|.
    not_parallel = jnp.abs(det) >= vm.EPSILON * g.tri_area2[None, :]
    inv_det = 1.0 / jnp.where(not_parallel, det, 1.0)
    tvec = start[:, None, :] - g.tri_v0[None]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, g.tri_e1[None])
    v = jnp.sum(seg[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(g.tri_e2[None] * qvec, axis=-1) * inv_det
    valid = (
        not_parallel
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= 0.0)
        & (t <= 1.0)
        & g.tri_valid[None, :]
    )
    t_best, idx = _best(t, valid)
    point = start + seg * t_best[:, None]
    u_best = jnp.take_along_axis(u, idx[:, None], axis=-1)[:, 0]
    v_best = jnp.take_along_axis(v, idx[:, None], axis=-1)[:, 0]
    # Barycentric interpolation (intersect.cpp:131-145, mesh.cpp:277-322).
    n0, n1, n2 = g.tri_n0[idx], g.tri_n1[idx], g.tri_n2[idx]
    normal = n0 + (n1 - n0) * u_best[:, None] + (n2 - n0) * v_best[:, None]
    t0, t1, t2 = g.tri_t0[idx], g.tri_t1[idx], g.tri_t2[idx]
    texcoords = t0 + (t1 - t0) * u_best[:, None] + (t2 - t0) * v_best[:, None]
    # World distance from the hit to the nearest triangle edge: barycentric
    # coordinate × the triangle height over that edge (2A / edge length).
    # Differentiable w.r.t. vertices; drives silhouette reparameterization.
    e1b, e2b = g.tri_e1[idx], g.tri_e2[idx]
    a2 = g.tri_area2[idx]
    w_best = 1.0 - u_best - v_best
    d_u = u_best * a2 / jnp.maximum(vm.length(e2b), 1e-30)
    d_v = v_best * a2 / jnp.maximum(vm.length(e1b), 1e-30)
    d_w = w_best * a2 / jnp.maximum(vm.length(e2b - e1b), 1e-30)
    edge_dist = jnp.minimum(jnp.minimum(d_u, d_v), d_w)
    return t_best, dict(point=point, normal=normal, mat=g.tri_mat[idx],
                        texcoords=texcoords, edge_dist=edge_dist)


def intersect_scene(g: GeometryPack, start, seg) -> Hit:
    """Closest hit across every primitive type (brute force, no BVH).

    Mirrors Scene::Trace's linear fallback path (scene.cpp:230-233); the BVH
    path (ops/bvh.py) must produce identical results, which tests assert.
    """
    t_sph, a_sph = intersect_spheres(g, start, seg)
    t_pln, a_pln = intersect_planes(g, start, seg)
    t_dsc, a_dsc = intersect_discs(g, start, seg)
    t_qud, a_qud = intersect_quads(g, start, seg)
    t_cub, a_cub = intersect_cuboids(g, start, seg)
    t_tri, a_tri = intersect_triangles(g, start, seg)

    ts = jnp.stack([t_sph, t_pln, t_dsc, t_qud, t_cub, t_tri], axis=0)  # [6,N]
    kind = jnp.argmin(ts, axis=0).astype(jnp.int32)
    t_best = jnp.min(ts, axis=0)
    hit = t_best < INVALID_PARAM

    def sel(k, field, default=None):
        arrs = [a_sph, a_pln, a_dsc, a_qud, a_cub, a_tri]
        return arrs[k].get(field, default)

    point = start + seg * t_best[:, None]
    normal = a_sph["normal"]
    mat = a_sph["mat"]
    for k, attrs in enumerate([a_pln, a_dsc, a_qud, a_cub, a_tri], start=1):
        m = kind == k
        normal = jnp.where(m[:, None], attrs["normal"], normal)
        mat = jnp.where(m, attrs["mat"], mat)

    # Texcoords by winner type (object.cpp:31, 67, 106, 158, 231; mesh interp).
    tc_sphere = vm.sphere_map_texcoords(a_sph["normal"])
    tc_planar = vm.planar_map_texcoords(point, normal)
    texcoords = tc_sphere
    texcoords = jnp.where((kind == KIND_PLANE)[:, None], tc_planar, texcoords)
    texcoords = jnp.where((kind == KIND_DISC)[:, None], tc_planar, texcoords)
    texcoords = jnp.where((kind == KIND_QUAD)[:, None], tc_planar, texcoords)
    texcoords = jnp.where((kind == KIND_CUBOID)[:, None], tc_planar * 0.1, texcoords)
    texcoords = jnp.where((kind == KIND_TRIANGLE)[:, None], a_tri["texcoords"], texcoords)

    edge_dist = jnp.where(kind == KIND_TRIANGLE, a_tri["edge_dist"],
                          jnp.float32(3.0e38))

    return Hit(
        t=t_best,
        point=point,
        normal=normal,
        texcoords=texcoords,
        mat=mat,
        prim_kind=kind,
        hit=hit,
        edge_dist=edge_dist,
    )
