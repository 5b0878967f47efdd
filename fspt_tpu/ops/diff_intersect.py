"""Differentiable BVH-scene intersection by hit-id replay.

SURVEY.md §7 (differentiability pass): "custom VJPs for traversal — hit-id
treated as piecewise-constant; t, barycentrics, shading differentiable".
The fast culled-treelet sweep (ops/pallas_bvh.py) is a Pallas kernel with no
VJP, and reverse-differentiating a BVH walk is meaningless anyway: which
primitive a ray hits is piecewise-constant in every continuous parameter, so
its exact derivative is zero almost everywhere.  The replay construction
makes that precise and cheap:

1. the fast intersector runs under ``stop_gradient`` and decides WHAT each
   lane hits (``Hit.prim_id``, −1 for analytic prims / misses);
2. an XLA replay recomputes t / point / normal / texcoords / edge_dist with
   one Möller–Trumbore evaluation of the single winning triangle, reading
   (optionally traced) vertex arrays — every continuous quantity is exactly
   differentiable w.r.t. ray origin/direction and vertices;
3. analytic-primitive lanes fall through to the brute-force XLA intersector
   (ops/intersect.py), which is differentiable and cheap because BVH scenes
   keep only analytic primitives in ``scene.geometry``
   (scene/builder.py:compile — triangle SoAs move into the BVH).

Silhouette terms (where the winner id *does* change) are handled one level
up by the integrator's edge reparameterization (render/integrator.py,
``cfg.edge_eps``), which consumes the replayed ``edge_dist``.

This enables gradient-based vertex/material recovery on 100k-triangle BVH
scenes — the brute-force differentiable path is O(N·T) and only viable for
toy meshes.  The reference has no differentiable anything; this capability
is the TPU build's own (BASELINE configs 4-5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.ops.intersect import Hit, KIND_TRIANGLE, intersect_scene
from fspt_tpu.utils import vecmath as vm


def tris_from_scene(scene_pack):
    """Baked original-order triangle arrays (constants) from a BVH scene.

    Returns the dict layout ``bind`` expects; pass traced replacements of
    the same shapes for vertex optimization.
    """
    bvh = scene_pack.bvh
    order = np.argsort(np.asarray(bvh.tri_id))
    v0 = jnp.asarray(np.asarray(bvh.tri_v0)[order])
    e1 = jnp.asarray(np.asarray(bvh.tri_e1)[order])
    e2 = jnp.asarray(np.asarray(bvh.tri_e2)[order])
    ts = scene_pack.tri_shade
    return dict(v0=v0, v1=v0 + e1, v2=v0 + e2,
                n0=ts.n0, n1=ts.n1, n2=ts.n2,
                t0=ts.t0, t1=ts.t1, t2=ts.t2, mat=ts.mat)


def flat_normals(v0, v1, v2):
    """Geometric normals from traced vertices (all three shading slots)."""
    cr = jnp.cross(v1 - v0, v2 - v0)
    n = cr / jnp.maximum(jnp.linalg.norm(cr, axis=-1, keepdims=True), 1e-30)
    return n


def _replay_hit(tr, geometry, start, seg, tid_raw, fh_hit):
    """Differentiable Hit from a decided winner id.

    ``tid_raw`` (int32, −1 = analytic-or-miss) and ``fh_hit`` (bool) carry
    the piecewise-constant traversal decision; every continuous field is
    recomputed differentiably: one Möller–Trumbore evaluation of the
    winning triangle reading the (optionally traced) ``tr`` arrays, with
    analytic lanes falling through to the brute-force XLA intersector.
    """
    tri_hit = tid_raw >= 0
    tid = jnp.maximum(tid_raw, 0)

    # Differentiable Möller–Trumbore replay of the single winner.
    v0 = tr["v0"][tid]
    e1 = tr["v1"][tid] - v0
    e2 = tr["v2"][tid] - v0
    pvec = jnp.cross(seg, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    tvec = start - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(seg * qvec, axis=-1) * inv
    t_tri = jnp.sum(e2 * qvec, axis=-1) * inv

    n0, n1, n2 = tr["n0"][tid], tr["n1"][tid], tr["n2"][tid]
    normal = n0 + (n1 - n0) * u[:, None] + (n2 - n0) * v[:, None]
    t0, t1, t2 = tr["t0"][tid], tr["t1"][tid], tr["t2"][tid]
    texcoords = t0 + (t1 - t0) * u[:, None] + (t2 - t0) * v[:, None]

    # World distance to the nearest triangle edge (drives the
    # integrator's silhouette reparameterization) — same formula as
    # ops/intersect.intersect_triangles.
    cr = jnp.cross(e1, e2)
    a2 = jnp.linalg.norm(cr, axis=-1)
    w = 1.0 - u - v
    d_u = u * a2 / jnp.maximum(vm.length(e2), 1e-30)
    d_v = v * a2 / jnp.maximum(vm.length(e1), 1e-30)
    d_w = w * a2 / jnp.maximum(vm.length(e2 - e1), 1e-30)
    edge_dist = jnp.minimum(jnp.minimum(d_u, d_v), d_w)

    # Analytic lanes: the brute-force XLA intersector is differentiable
    # and BVH scenes keep only analytic prims in scene.geometry.  The
    # fast path already decided the winner; base is only consulted where
    # that winner is not a triangle.
    base = intersect_scene(geometry, start, seg)

    th = tri_hit[:, None]
    t = jnp.where(tri_hit, t_tri, base.t)
    return Hit(
        t=t,
        point=start + seg * t[:, None],
        normal=jnp.where(th, normal, base.normal),
        texcoords=jnp.where(th, texcoords, base.texcoords),
        mat=jnp.where(tri_hit, tr["mat"][tid], base.mat),
        prim_kind=jnp.where(tri_hit, KIND_TRIANGLE, base.prim_kind),
        hit=fh_hit,
        edge_dist=jnp.where(tri_hit, edge_dist, base.edge_dist),
        prim_id=tid_raw,
    )


def make_recorded_replay(scene_pack):
    """Replay intersector over PRE-recorded winner ids.

    The second phase of the two-phase differentiable mesh path
    (parallel/train.make_bvh_vertex_recovery_step): phase 1 streams the
    scene through the queued fast sweep with ``record_hits=True``
    (render/queue.py) under stop_gradient; the ``bind(tris, ids, hit)``
    intersector returned here replays those decisions depth by depth —
    the AD graph contains one Möller–Trumbore per segment and none of the
    sort/cull/sweep machinery (compile shrinks ~6×, VERDICT r3 weak #2).

    Each ``bind`` result is single-use per traced render: it counts the
    integrator's per-depth calls to index ``ids[:, d]``.
    """
    geometry = scene_pack.geometry

    def bind(tris, ids, hitm):
        counter = iter(range(int(ids.shape[1])))

        def intersect(start, seg, alive=None):
            d = next(counter)
            return _replay_hit(tris, geometry, start, seg, ids[:, d],
                               hitm[:, d])

        intersect.accepts_alive = True
        return intersect

    return bind


def make_planar_recorded_replay(scene_pack, cfg, z_far: float):
    """Planar ``[N]``-state replay renderer — the fast phase-2 of the
    two-phase differentiable mesh path.

    The wavefront replay (integrator.render_wavefront + make_recorded_replay)
    carries ``[N,3]``/``[N,1]`` loop state, which XLA pads to (8,128) tiles
    on TPU — a 42×/128× HBM-traffic expansion paid again by every saved
    residual in the backward pass (the ops/diff_path.py analysis).  This
    renderer instantiates the SAME path body (pallas_path.build_path_core,
    XlaOps) over component-planar arrays with a per-depth recorded-winner
    Möller–Trumbore intersect: all triangle attributes gather as planar
    ``[N]`` columns, and the edge-reparameterized silhouette term rides the
    core's ``use_edge`` block (integrator.py:171-201 parity).

    Returns ``render(tris, ids, hitm, camera, seed, sample0, y0=0,
    rows=None) → (radiance[N,3], segments)`` differentiable w.r.t. the
    ``tris`` dict (tris_from_scene layout), or None when the scene can't
    use the planar body (textured materials / too many analytic prims).
    """
    from fspt_tpu.camera import generate_rays
    from fspt_tpu.ops import rng as rng_mod
    from fspt_tpu.ops.pallas_path import (MAX_SPECIALIZED_PRIMS,
                                          HostMaterials, HostScene, XlaOps,
                                          build_path_core)
    from fspt_tpu.ops.pallas_trace import intersect_lanes
    from fspt_tpu.scene.geometry import INVALID_PARAM

    mats = HostMaterials(scene_pack.materials)
    if mats.any_textured:
        return None
    scene = HostScene(scene_pack.geometry)
    if scene.prim_count > MAX_SPECIALIZED_PRIMS:
        return None
    sky_idx = int(scene_pack.sky_mat)
    zf = float(z_far)
    inf = jnp.float32(3.0e38)

    def render(tris, ids, hitm, camera, seed, sample0, y0=0, rows=None):
        # Planar component views: [N] gathers of [T] columns stay densely
        # tiled; a [T,3] gather would save padded [N,3] residuals.
        comp = {k: [tris[k][:, i] for i in range(3)]
                for k in ("v0", "v1", "v2", "n0", "n1", "n2")}
        mat_col = tris["mat"]
        counter = iter(range(int(ids.shape[1])))

        def intersect(sx, sy, sz, dx, dy, dz):
            d = next(counter)
            tid_raw = ids[:, d]
            fh = hitm[:, d]
            tri_hit = tid_raw >= 0
            tid = jnp.maximum(tid_raw, 0)
            g = lambda k, i: comp[k][i][tid]
            v0x, v0y, v0z = g("v0", 0), g("v0", 1), g("v0", 2)
            e1x, e1y, e1z = g("v1", 0) - v0x, g("v1", 1) - v0y, g("v1", 2) - v0z
            e2x, e2y, e2z = g("v2", 0) - v0x, g("v2", 1) - v0y, g("v2", 2) - v0z
            # Möller–Trumbore of the single recorded winner (planar form of
            # _replay_hit).
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
            tvx, tvy, tvz = sx - v0x, sy - v0y, sz - v0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (dx * qvx + dy * qvy + dz * qvz) * inv
            t_tri = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
            nx = g("n0", 0) + (g("n1", 0) - g("n0", 0)) * u \
                + (g("n2", 0) - g("n0", 0)) * v
            ny = g("n0", 1) + (g("n1", 1) - g("n0", 1)) * u \
                + (g("n2", 1) - g("n0", 1)) * v
            nz = g("n0", 2) + (g("n1", 2) - g("n0", 2)) * u \
                + (g("n2", 2) - g("n0", 2)) * v
            # World distance to the nearest edge (drives use_edge).
            crx = e1y * e2z - e1z * e2y
            cry = e1z * e2x - e1x * e2z
            crz = e1x * e2y - e1y * e2x
            a2 = jnp.sqrt(crx * crx + cry * cry + crz * crz)
            w_ = 1.0 - u - v
            l1 = jnp.sqrt(e1x * e1x + e1y * e1y + e1z * e1z)
            l2 = jnp.sqrt(e2x * e2x + e2y * e2y + e2z * e2z)
            dex, dey, dez = e2x - e1x, e2y - e1y, e2z - e1z
            l12 = jnp.sqrt(dex * dex + dey * dey + dez * dez)
            d_u = u * a2 / jnp.maximum(l2, 1e-30)
            d_v = v * a2 / jnp.maximum(l1, 1e-30)
            d_w = w_ * a2 / jnp.maximum(l12, 1e-30)
            ed = jnp.minimum(jnp.minimum(d_u, d_v), d_w)

            # Analytic lanes fall through to the baked planar merge (BVH
            # scenes keep only analytic prims in scene.geometry).
            bt, bnx, bny, bnz, bmat, bkind, buu, bvv = intersect_lanes(
                scene, sx, sy, sz, dx, dy, dz)
            t = jnp.where(tri_hit, t_tri, bt)
            # The recorded hit flag IS the traversal decision: misses get
            # the sentinel so the core's `t < INVALID_PARAM` test agrees.
            t = jnp.where(fh, t, jnp.float32(INVALID_PARAM))
            return (t,
                    jnp.where(tri_hit, nx, bnx),
                    jnp.where(tri_hit, ny, bny),
                    jnp.where(tri_hit, nz, bnz),
                    jnp.where(tri_hit, mat_col[tid], bmat),
                    jnp.where(tri_hit, KIND_TRIANGLE, bkind),
                    buu, bvv,
                    jnp.where(tri_hit, ed, inf))

        intersect.has_edge_dist = True
        core = build_path_core(scene, mats, cfg, sky_idx, zf, ops=XlaOps,
                               intersect=intersect)
        start, seg, pixel_idx, sample_idx = generate_rays(
            camera, cfg.width, cfg.height, cfg.spp, seed, sample0,
            y0=y0, rows=rows)
        seed_u = jnp.asarray(seed).astype(jnp.uint32)
        h0 = rng_mod.pcg_hash(seed_u ^ jnp.uint32(0x9E3779B9))
        h0 = jax.lax.bitcast_convert_type(h0, jnp.int32)
        outs = core(h0, start[:, 0], start[:, 1], start[:, 2],
                    seg[:, 0], seg[:, 1], seg[:, 2],
                    pixel_idx.astype(jnp.int32),
                    sample_idx.astype(jnp.int32))
        return jnp.stack(outs[:3], axis=-1), jnp.sum(outs[8])

    return render


def make_diff_mesh_intersector(scene_pack, **fast_kwargs):
    """Build the replay intersector for a BVH scene.

    Returns ``inter(start, seg[, alive]) → Hit`` bound to the scene's baked
    triangles, with ``inter.bind(tris) → fn`` to rebind traced triangle
    arrays (dict from :func:`tris_from_scene`, possibly with optimizable
    leaves swapped in) inside a loss function.  Returns None for scenes
    without a BVH (use the brute-force differentiable path directly).
    """
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector

    if scene_pack.bvh is None:
        return None
    fast = make_mesh_intersector(scene_pack, **fast_kwargs)
    if fast is None:
        return None
    baked = tris_from_scene(scene_pack)
    geometry = scene_pack.geometry

    def bind(tris=None):
        tr = baked if tris is None else tris

        def intersect(start, seg, alive=None):
            sg = jax.lax.stop_gradient
            fh = fast(sg(start), sg(seg),
                      None if alive is None else sg(alive))
            return _replay_hit(tr, geometry, start, seg, sg(fh.prim_id),
                               sg(fh.hit))

        intersect.accepts_alive = True
        return intersect

    inter = bind()
    inter.bind = bind
    return inter
