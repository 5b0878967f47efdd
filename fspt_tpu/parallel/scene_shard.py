"""Scene-level sharding: triangles distributed over the device mesh.

The replication-first design (SURVEY §2.3) keeps the whole scene on every
chip — right for every scene that fits (100k-triangle scenes are ~5 MB).
This module is the capacity escape hatch for scenes that do NOT fit: each
device owns a spatially-contiguous SHARD of the triangle set (its own
sub-BVH + shading attributes), rays are replicated, every device traverses
only its shard, and the closest hit merges across the mesh with one
``pmin`` + winner-selected ``psum`` per Hit field.

The reference has no analog (its octree lives in one address space,
bvh.h:145-231); the design follows the standard distributed-scene path
tracing decomposition (geometry-partitioned ray tracing), expressed with
XLA collectives instead of message passing.

Throughput note: this path trades speed for capacity — the per-shard
traversal is the XLA miss-link walk, and N devices do replicated-ray work.
The Pallas treelet sweep keeps scene replication (its MXU weight tables
are kernel constants); scenes that fit should use it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from fspt_tpu.config import RenderConfig
from fspt_tpu.ops.bvh import FlatBVH, build_bvh, traverse_bvh
from fspt_tpu.ops.intersect import Hit, KIND_TRIANGLE, intersect_scene
from fspt_tpu.parallel.mesh import RAY_AXIS
from fspt_tpu.render import framebuffer as fb_mod
from fspt_tpu.render import integrator
from fspt_tpu.render import queue as queue_mod
from fspt_tpu.scene.builder import ScenePack, TriShade

_BIG = jnp.float32(3.0e38)


def shard_scene_triangles(scene: ScenePack, n_shards: int):
    """Split a BVH scene's triangles into ``n_shards`` stacked shards.

    Triangles are ordered by centroid Morton-major axis sort (spatially
    contiguous shards → tight per-shard bounds), split evenly, and each
    shard gets its own flattened BVH and TriShade slice, padded to common
    shapes and stacked on a leading shard axis.  Returns
    ``(stacked_bvh, stacked_shade, stacked_gids, order, bounds)`` — the
    stacked pytrees ready to shard over the mesh with ``P(RAY_AXIS)``,
    plus the centroid sort order / split bounds so companion tables
    (:func:`shard_treelet_tables`) can slice identically.
    """
    assert scene.bvh is not None, "scene sharding needs a BVH scene"
    f = np.asarray
    if int(np.asarray(scene.bvh.tri_v0).shape[0]) < n_shards:
        raise ValueError(
            f"scene has {int(np.asarray(scene.bvh.tri_v0).shape[0])} "
            f"triangles but {n_shards} shards were requested; scene "
            "sharding is the capacity path for large scenes — replicate "
            "small scenes instead (or use fewer shards)")
    order0 = np.argsort(f(scene.bvh.tri_id))
    v0 = f(scene.bvh.tri_v0)[order0]
    v1 = v0 + f(scene.bvh.tri_e1)[order0]
    v2 = v0 + f(scene.bvh.tri_e2)[order0]
    n_tris = len(v0)
    cent = (v0 + v1 + v2) / 3.0
    axis = int(np.argmax(cent.max(axis=0) - cent.min(axis=0)))
    order = np.argsort(cent[:, axis], kind="stable")

    bounds = np.linspace(0, n_tris, n_shards + 1).astype(np.int64)
    shard_bvhs, shard_shades, shard_gids = [], [], []
    max_nodes = max_tris = 0
    ts = scene.tri_shade
    for s in range(n_shards):
        idx = order[bounds[s]:bounds[s + 1]]
        # The sub-BVH's tri_id column holds SHARD-INPUT-LOCAL ids (its
        # builder contract), which index the shard's shade slice directly;
        # the separate gid array maps them to mesh-global triangle ids.
        bvh = build_bvh(v0[idx], v1[idx], v2[idx])
        shard_bvhs.append(bvh)
        shard_gids.append(jnp.asarray(idx.astype(np.int32)))
        shard_shades.append(TriShade(
            n0=jnp.asarray(f(ts.n0)[idx]), n1=jnp.asarray(f(ts.n1)[idx]),
            n2=jnp.asarray(f(ts.n2)[idx]), t0=jnp.asarray(f(ts.t0)[idx]),
            t1=jnp.asarray(f(ts.t1)[idx]), t2=jnp.asarray(f(ts.t2)[idx]),
            mat=jnp.asarray(f(ts.mat)[idx]),
        ))
        max_nodes = max(max_nodes, bvh.n_nodes)
        max_tris = max(max_tris, len(idx))

    def pad_bvh(b: FlatBVH) -> FlatBVH:
        pn = max_nodes - b.n_nodes
        pt = max_tris - b.tri_v0.shape[0]

        def padn(x, fill=0):
            return jnp.pad(x, [(0, pn)] + [(0, 0)] * (x.ndim - 1),
                           constant_values=fill)

        def padt(x, fill=0):
            return jnp.pad(x, [(0, pt)] + [(0, 0)] * (x.ndim - 1),
                           constant_values=fill)

        # Padding nodes: empty leaves whose miss link ends traversal.
        return FlatBVH(
            bmin=padn(b.bmin, 3.0e38), bmax=padn(b.bmax, -3.0e38),
            first=padn(b.first), count=padn(b.count),
            miss=padn(b.miss, max_nodes), tri_v0=padt(b.tri_v0),
            tri_e1=padt(b.tri_e1), tri_e2=padt(b.tri_e2),
            tri_area2=padt(b.tri_area2, 3.0e38),
            tri_id=padt(b.tri_id, -1),
        )

    def pad_shade(sh: TriShade) -> TriShade:
        pt = max_tris - sh.n0.shape[0]
        return jax.tree.map(
            lambda x: jnp.pad(x, [(0, pt)] + [(0, 0)] * (x.ndim - 1)), sh)

    stacked_bvh = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[pad_bvh(b) for b in shard_bvhs])
    stacked_shade = jax.tree.map(lambda *xs: jnp.stack(xs),
                                 *[pad_shade(s) for s in shard_shades])
    stacked_gids = jnp.stack([
        jnp.pad(g, (0, max_tris - g.shape[0]), constant_values=-1)
        for g in shard_gids])
    return stacked_bvh, stacked_shade, stacked_gids, order, bounds


def _merge_hits(hit: Hit, axis_name, n_dev: int | None = None) -> Hit:
    """Cross-device closest hit: pmin on t, lowest-rank winner on ties.

    ``n_dev=1`` (static) short-circuits to identity: a single-shard mesh
    needs no merge, and each collective is an XLA fusion barrier — ~10 of
    them per bounce iteration measurably slow the 1-device path even
    though they lower to copies."""
    if n_dev == 1:
        return hit
    t_cand = jnp.where(hit.hit, hit.t, _BIG)
    t_min = jax.lax.pmin(t_cand, axis_name)
    n_dev = jax.lax.psum(1, axis_name)
    rank = jax.lax.axis_index(axis_name)
    is_min = hit.hit & (t_cand == t_min)
    win_rank = jax.lax.pmin(jnp.where(is_min, rank, n_dev), axis_name)
    sel = is_min & (rank == win_rank)

    def pick(x):
        expand = sel[:, None] if x.ndim == 2 else sel
        return jax.lax.psum(jnp.where(expand, x, jnp.zeros_like(x)),
                            axis_name)

    any_hit = jax.lax.pmax(hit.hit, axis_name)
    return Hit(
        t=jnp.where(any_hit, pick(hit.t), hit.t),
        point=pick(hit.point),
        normal=pick(hit.normal),
        texcoords=pick(hit.texcoords),
        mat=pick(hit.mat),
        prim_kind=pick(hit.prim_kind),
        hit=any_hit,
        prim_id=jnp.where(any_hit, pick(hit.prim_id), -1),
    )


def shard_treelet_tables(scene: ScenePack, n_shards: int,
                         order=None, bounds=None):
    """Per-shard culled-traverser tables, padded to common shapes and
    stacked on a leading shard axis (the fast scene-sharded path).

    Uses the same centroid-sorted contiguous split as
    :func:`shard_scene_triangles` so the two stay consistent; returns
    ``(stacked_tables, stacked_box_lo, stacked_box_hi)`` where the boxes
    are each shard's triangle AABB (t-clip + Morton domain).
    """
    from fspt_tpu.ops.pallas_bvh import build_treelet_chunks, treelet_tables

    f = np.asarray
    order0 = np.argsort(f(scene.bvh.tri_id))
    v0 = f(scene.bvh.tri_v0)[order0]
    v1 = v0 + f(scene.bvh.tri_e1)[order0]
    v2 = v0 + f(scene.bvh.tri_e2)[order0]
    n_tris = len(v0)
    if order is None:
        cent = (v0 + v1 + v2) / 3.0
        axis = int(np.argmax(cent.max(axis=0) - cent.min(axis=0)))
        order = np.argsort(cent[:, axis], kind="stable")
        bounds = np.linspace(0, n_tris, n_shards + 1).astype(np.int64)

    chunks = []
    for s in range(n_shards):
        idx = order[bounds[s]:bounds[s + 1]]
        chunks.append((idx, build_treelet_chunks(v0[idx], v1[idx], v2[idx])))
    l_max = max(int(np.count_nonzero(f(c.count) > 0)) for _, c in chunks)
    t_max = max(int(f(c.tri_v0).shape[0]) for _, c in chunks)

    tabs, blos, bhis = [], [], []
    for idx, chunk in chunks:
        tabs.append(treelet_tables(chunk, n_leaves_pad=l_max,
                                   n_tris_pad=t_max))
        blos.append(np.minimum(v0[idx], np.minimum(v1[idx], v2[idx]))
                    .min(axis=0).astype(np.float32))
        bhis.append(np.maximum(v0[idx], np.maximum(v1[idx], v2[idx]))
                    .max(axis=0).astype(np.float32))
    stacked = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *tabs)
    return stacked, jnp.asarray(np.stack(blos)), jnp.asarray(np.stack(bhis))


def make_scene_sharded_render_step(mesh, cfg: RenderConfig,
                                   scene: ScenePack, fast: bool = False,
                                   block_rays: int = 64,
                                   sub_bundles: int = 64, group: int = 8,
                                   queue: int = 1 << 17,
                                   pipeline_depth: int = 4):
    """Render step with the TRIANGLES sharded over the mesh, rays
    replicated.

    Each device intersects the full wavefront against its own sub-BVH
    (local shading attributes included — no device ever touches another
    shard's tables) and the per-bounce closest hit merges with pmin/psum.
    Output framebuffer is replicated (identical on every device).

    Returns ``step(scene, camera, fb, seed, frame_idx) → (fb, segments)``.

    Baked-scene contract: the triangle shards (sub-BVHs, shading tables,
    global ids) are built ONCE from the ``scene`` passed here and closed
    over; ``step``'s ``scene_in`` argument supplies only the live analytic
    geometry/materials/textures.  Passing a ``scene_in`` whose triangles
    differ from the build-time scene renders the baked triangles against
    the new materials — rebuild the step for a new triangle set.

    ``fast=True`` (VERDICT r3 #7) replaces each shard's XLA miss-link walk
    with the culled-treelet Pallas MXU sweep: every device Morton-sorts the
    replicated wavefront against ITS shard's box, culls and sweeps its own
    treelet tables (runtime-table form of ops/pallas_bvh.
    make_culled_traverser), and the same pmin/psum merge combines the
    per-shard closest hits — capacity AND speed are no longer exclusive.
    """
    n = mesh.devices.size
    (stacked_bvh, stacked_shade, stacked_gids, order,
     bounds) = shard_scene_triangles(scene, n)
    base_fn = None
    if fast:
        from fspt_tpu.ops.pallas_trace import make_pallas_intersector

        stacked_tabs, box_lo, box_hi = shard_treelet_tables(
            scene, n, order=order, bounds=bounds)
        # Analytic primitives ride the baked Pallas kernel (same cascade
        # as the replicated make_mesh_intersector): the XLA brute pass
        # materializes full Hit SoAs through HBM every bounce iteration.
        # Baked from the build-time scene — consistent with the baked
        # triangle contract below; falls back to the live XLA pass when
        # the geometry can't be specialized.
        base_fn = make_pallas_intersector(scene.geometry)
    else:
        stacked_tabs = box_lo = box_hi = None

    def fast_intersector(tabs, blo, bhi, shade, global_of, scene_in):
        from fspt_tpu.ops.pallas_bvh import (make_culled_traverser,
                                             morton_keys)

        trav = make_culled_traverser(None, block_rays=block_rays,
                                     sub_bundles=sub_bundles, group=group,
                                     tables=tabs,
                                     pipeline_depth=pipeline_depth)

        def box_exit(start, seg):
            inv = 1.0 / jnp.where(jnp.abs(seg) < 1e-30,
                                  jnp.where(seg >= 0, 1e-30, -1e-30), seg)
            ta = (blo - start) * inv
            tb = (bhi - start) * inv
            tnear = jnp.max(jnp.minimum(ta, tb), axis=-1)
            tfar = jnp.min(jnp.maximum(ta, tb), axis=-1)
            hitbox = (tnear <= tfar) & (tfar > 0.0)
            return jnp.where(hitbox, tfar * 1.0001 + 1e-5, 0.0)

        def intersect(start, seg, alive=None):
            base = (base_fn(start, seg) if base_fn is not None
                    else intersect_scene(scene_in.geometry, start, seg))
            t_init = jnp.minimum(base.t, box_exit(start, seg))
            if alive is not None:
                t_init = jnp.where(alive, t_init, 0.0)
            nlanes = start.shape[0]
            key = morton_keys(start, seg, alive, blo, bhi)
            ordr = jnp.argsort(key)
            t_kern, packed = trav.raw(start[ordr], seg[ordr],
                                      t_init=t_init[ordr])
            inv = jnp.zeros((nlanes,), jnp.int32).at[ordr].set(
                jnp.arange(nlanes, dtype=jnp.int32))
            t_kern, packed = t_kern[inv], packed[inv]
            t_tri, tid_l, u, v = trav.post(start, seg, t_kern, packed)
            gid = jnp.where(tid_l >= 0, global_of[jnp.maximum(tid_l, 0)], -1)
            tri_hit = gid >= 0
            tid = jnp.maximum(tid_l, 0)
            n0, n1, n2 = shade.n0[tid], shade.n1[tid], shade.n2[tid]
            normal = n0 + (n1 - n0) * u[:, None] + (n2 - n0) * v[:, None]
            t0, t1, t2 = shade.t0[tid], shade.t1[tid], shade.t2[tid]
            tex = t0 + (t1 - t0) * u[:, None] + (t2 - t0) * v[:, None]
            t = jnp.where(tri_hit, t_tri, base.t)
            local = Hit(
                t=t,
                point=start + seg * t[:, None],
                normal=jnp.where(tri_hit[:, None], normal, base.normal),
                texcoords=jnp.where(tri_hit[:, None], tex, base.texcoords),
                mat=jnp.where(tri_hit, shade.mat[tid], base.mat),
                prim_kind=jnp.where(tri_hit, KIND_TRIANGLE, base.prim_kind),
                hit=base.hit | tri_hit,
                prim_id=jnp.where(tri_hit, gid, -1),
            )
            return _merge_hits(local, RAY_AXIS, n)

        intersect.accepts_alive = True
        return intersect

    def local_step(shard_bvh, shard_shade, shard_gids, shard_tabs,
                   shard_blo, shard_bhi, scene_in, camera, fb,
                   seed, frame_idx):
        bvh = jax.tree.map(lambda x: x[0], shard_bvh)
        shade = jax.tree.map(lambda x: x[0], shard_shade)
        global_of = shard_gids[0]
        if fast:
            tabs = jax.tree.map(lambda x: x[0], shard_tabs)
            intersector = fast_intersector(tabs, shard_blo[0], shard_bhi[0],
                                           shade, global_of, scene_in)
            intersector.accepts_alive = True
            # Regenerating queue, not the unrolled wavefront: the unrolled
            # loop re-runs the full-wavefront sort/cull/sweep at every
            # depth on 5-20% live lanes (the replicated path's r3 lesson,
            # render/queue.py) and compiles depth× copies of the sweep
            # graph.  Queue state is replicated and the shard merge's
            # collectives sit inside the intersector, so every device runs
            # the while_loop in lockstep with identical trip counts.
            out = queue_mod.render_queued(
                scene_in, camera, cfg, seed, frame_idx * cfg.spp,
                intersector=intersector, queue=queue)
            fb = fb_mod.accumulate(
                fb, out.radiance, out.aov_normal, out.aov_depth,
                out.aov_mat, cfg.height, cfg.width, cfg.spp)
            return fb, out.segments

        def intersector(start, seg, alive=None):
            base = intersect_scene(scene_in.geometry, start, seg)
            # tri_id here is shard-input-local: it indexes ``shade`` rows
            # directly and maps to mesh-global ids through ``global_of``.
            t_tri, tid_l, u, v = traverse_bvh(bvh, start, seg)
            # Padding slots carry tri_id −1 globally: treat as miss.
            gid = jnp.where(tid_l >= 0, global_of[jnp.maximum(tid_l, 0)], -1)
            tri_hit = gid >= 0
            tid = jnp.maximum(tid_l, 0)
            n0, n1, n2 = shade.n0[tid], shade.n1[tid], shade.n2[tid]
            normal = n0 + (n1 - n0) * u[:, None] + (n2 - n0) * v[:, None]
            t0, t1, t2 = shade.t0[tid], shade.t1[tid], shade.t2[tid]
            tex = t0 + (t1 - t0) * u[:, None] + (t2 - t0) * v[:, None]
            tri_wins = tri_hit & (t_tri < base.t)
            t = jnp.where(tri_wins, t_tri, base.t)
            local = Hit(
                t=t,
                point=start + seg * t[:, None],
                normal=jnp.where(tri_wins[:, None], normal, base.normal),
                texcoords=jnp.where(tri_wins[:, None], tex, base.texcoords),
                mat=jnp.where(tri_wins, shade.mat[tid], base.mat),
                prim_kind=jnp.where(tri_wins, KIND_TRIANGLE, base.prim_kind),
                hit=base.hit | tri_wins,
                prim_id=jnp.where(tri_wins, gid, -1),
            )
            return _merge_hits(local, RAY_AXIS, n)

        intersector.accepts_alive = True
        fb, segs = integrator.render_step(
            scene_in, camera, cfg, fb, seed, frame_idx,
            intersector=intersector)
        # All devices hold identical results; segments counted once.
        return fb, segs

    if stacked_tabs is None:
        # Placeholder leaves so the shard_map signature is uniform.
        stacked_tabs = {"_": jnp.zeros((n, 1), jnp.float32)}
        box_lo = box_hi = jnp.zeros((n, 3), jnp.float32)

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS),
                  P(RAY_AXIS), P(RAY_AXIS), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    # Commit replicated inputs to their post-step sharding up front —
    # an unspecified-sharding first call would compile a second
    # executable for every later call (the duplicate-compile bug fixed
    # in parallel/train.py, same mechanism).
    _rep = jax.sharding.NamedSharding(mesh, P())

    def _commit(tree):
        return jax.tree.map(
            lambda x: jax.device_put(x, _rep)
            if isinstance(x, jax.Array) else x, tree)

    jfn = jax.jit(fn)

    def step(scene_in, camera, fb, seed, frame_idx):
        return jfn(stacked_bvh, stacked_shade, stacked_gids, stacked_tabs,
                   box_lo, box_hi, _commit(scene_in), _commit(camera),
                   _commit(fb), seed, frame_idx)

    return step
