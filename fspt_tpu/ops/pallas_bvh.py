"""Pallas packet-BVH traversal kernel for triangle-heavy scenes.

TPU has no per-lane gather (Mosaic supports none of the scatter/gather a GPU
BVH walker leans on), so per-ray stackful traversal is out.  Instead each
grid block of lanes walks the flattened miss-link BVH (ops/bvh.py)
*block-synchronously* — classic packet tracing (Wald et al.) re-shaped for
the VPU:

* one scalar node cursor per block; node records live lane-packed in VMEM
  ([M/128, 128] per component) and are read with a dynamic row slice + a
  one-hot lane reduction (the TPU idiom for "scalar load at runtime index"),
* the block's rays are summarized by interval arithmetic (origin box +
  direction box + current worst ``t``): a conservative swept-box/AABB
  overlap culls nodes for the whole block with pure scalar math,
* at surviving leaves every lane runs Möller–Trumbore against the leaf's
  triangles (vector math, triangle constants broadcast from VMEM).

Conservatism only costs speed, never correctness: tests assert equality with
the XLA traversal and brute force.  Coherent primary blocks cull most of the
tree; bounce batches are less coherent and lean on the per-lane ``t`` prune.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fspt_tpu.ops.bvh import FlatBVH
from fspt_tpu.scene.geometry import INVALID_PARAM
from fspt_tpu.utils import vecmath as vm

LANE = 128
DEFAULT_BLOCK_ROWS = 8  # small blocks → tighter frustums


def _pack_lanes(x, dtype):
    """[K] → [ceil(K/128), 128] lane-packed array."""
    x = np.asarray(x)
    k = len(x)
    rows = (k + LANE - 1) // LANE
    out = np.zeros((rows, LANE), dtype)
    out.reshape(-1)[:k] = x
    return out


def _read_scalar(ref, idx):
    """Runtime-index scalar read from a lane-packed [R,128] VMEM ref."""
    row = ref[pl.ds(idx // LANE, 1), :]  # (1,128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1) == (idx % LANE)
    return jnp.sum(jnp.where(lane, row, jnp.zeros_like(row)))


class PackedBVH:
    """Host-side lane-packed copies of a FlatBVH for the kernel."""

    def __init__(self, bvh: FlatBVH):
        f = np.asarray
        self.n_nodes = int(bvh.n_nodes)
        self.n_tris = int(bvh.tri_v0.shape[0])
        self.node_f32 = [
            _pack_lanes(f(bvh.bmin)[:, 0], np.float32),
            _pack_lanes(f(bvh.bmin)[:, 1], np.float32),
            _pack_lanes(f(bvh.bmin)[:, 2], np.float32),
            _pack_lanes(f(bvh.bmax)[:, 0], np.float32),
            _pack_lanes(f(bvh.bmax)[:, 1], np.float32),
            _pack_lanes(f(bvh.bmax)[:, 2], np.float32),
        ]
        self.node_i32 = [
            _pack_lanes(f(bvh.first), np.int32),
            _pack_lanes(f(bvh.count), np.int32),
            _pack_lanes(f(bvh.miss), np.int32),
        ]
        tri_cols = []
        for arr in (bvh.tri_v0, bvh.tri_e1, bvh.tri_e2):
            a = f(arr)
            tri_cols += [a[:, 0], a[:, 1], a[:, 2]]
        tri_cols.append(f(bvh.tri_area2))
        self.tri_f32 = [_pack_lanes(c, np.float32) for c in tri_cols]
        self.tri_id = _pack_lanes(f(bvh.tri_id), np.int32)


def make_bvh_traverser(bvh: FlatBVH, max_leaf: int,
                       block_rows: int = DEFAULT_BLOCK_ROWS,
                       interpret: bool | None = None):
    """Compile ``fn(start[N,3], seg[N,3], t_init[N]) → (t, tri_id, u, v)``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    packed = PackedBVH(bvh)
    m = packed.n_nodes

    def kernel(sx_ref, sy_ref, sz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
               bmnx_ref, bmny_ref, bmnz_ref, bmxx_ref, bmxy_ref, bmxz_ref,
               first_ref, count_ref, miss_ref,
               v0x_ref, v0y_ref, v0z_ref, e1x_ref, e1y_ref, e1z_ref,
               e2x_ref, e2y_ref, e2z_ref, area_ref, tid_ref,
               t_ref, id_ref, u_ref, v_ref):
        sx, sy, sz = sx_ref[:], sy_ref[:], sz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_best = t0_ref[:]

        # Per-block ray bundle summary for interval-arithmetic slab tests
        # (Wald-style packet frustum, conservative for any ray in the block).
        ox0, ox1 = jnp.min(sx), jnp.max(sx)
        oy0, oy1 = jnp.min(sy), jnp.max(sy)
        oz0, oz1 = jnp.min(sz), jnp.max(sz)
        dx0, dx1 = jnp.min(dx), jnp.max(dx)
        dy0, dy1 = jnp.min(dy), jnp.max(dy)
        dz0, dz1 = jnp.min(dz), jnp.max(dz)

        big = jnp.float32(3.0e38)

        def islab(bmn, bmx, o0, o1, d0, d1):
            """Conservative t-interval where o + t·d may lie in [bmn, bmx]."""
            a, b_ = bmn - o1, bmx - o0  # numerator interval (a ≤ b_)
            crosses = (d0 <= 0.0) & (d1 >= 0.0)
            sd0 = jnp.where(jnp.abs(d0) < 1e-30, 1e-30, d0)
            sd1 = jnp.where(jnp.abs(d1) < 1e-30, 1e-30, d1)
            q = jnp.stack([a / sd0, a / sd1, b_ / sd0, b_ / sd1])
            lo = jnp.where(crosses, -big, jnp.min(q))
            hi = jnp.where(crosses, big, jnp.max(q))
            # Inside-the-slab origins admit t=0 regardless of direction.
            inside = (b_ >= 0.0) & (a <= 0.0)
            lo = jnp.where(inside, jnp.minimum(lo, 0.0), lo)
            hi = jnp.where(inside, jnp.maximum(hi, 0.0), hi)
            return lo, hi

        tri0 = jnp.full(sx.shape, -1, jnp.int32)
        uz = jnp.zeros_like(sx)

        def cond(state):
            return state[0] < m

        def body(state):
            node, t_best, tri, uu, vv = state
            t_blk = jnp.minimum(jnp.max(t_best), 1.0)

            bmnx = _read_scalar(bmnx_ref, node)
            bmny = _read_scalar(bmny_ref, node)
            bmnz = _read_scalar(bmnz_ref, node)
            bmxx = _read_scalar(bmxx_ref, node)
            bmxy = _read_scalar(bmxy_ref, node)
            bmxz = _read_scalar(bmxz_ref, node)
            tx0, tx1 = islab(bmnx, bmxx, ox0, ox1, dx0, dx1)
            ty0, ty1 = islab(bmny, bmxy, oy0, oy1, dy0, dy1)
            tz0, tz1 = islab(bmnz, bmxz, oz0, oz1, dz0, dz1)
            t_lo = jnp.maximum(jnp.maximum(tx0, ty0), tz0)
            t_hi = jnp.minimum(jnp.minimum(tx1, ty1), tz1)
            overlap = (t_lo <= t_hi) & (t_hi >= 0.0) & (t_lo <= t_blk)

            count = _read_scalar(count_ref, node)
            first = _read_scalar(first_ref, node)
            miss = _read_scalar(miss_ref, node)
            is_leaf = count > 0

            def leaf_tests(args):
                t_best, tri, uu, vv = args
                for k in range(max_leaf):
                    tj = first + k

                    def tri_test(args):
                        t_best, tri, uu, vv = args
                        v0x = _read_scalar(v0x_ref, tj)
                        v0y = _read_scalar(v0y_ref, tj)
                        v0z = _read_scalar(v0z_ref, tj)
                        e1x = _read_scalar(e1x_ref, tj)
                        e1y = _read_scalar(e1y_ref, tj)
                        e1z = _read_scalar(e1z_ref, tj)
                        e2x = _read_scalar(e2x_ref, tj)
                        e2y = _read_scalar(e2y_ref, tj)
                        e2z = _read_scalar(e2z_ref, tj)
                        area2 = _read_scalar(area_ref, tj)
                        tid = _read_scalar(tid_ref, tj)

                        pvx = dy * e2z - dz * e2y
                        pvy = dz * e2x - dx * e2z
                        pvz = dx * e2y - dy * e2x
                        det = e1x * pvx + e1y * pvy + e1z * pvz
                        np_ = jnp.abs(det) >= vm.EPSILON * area2
                        inv = 1.0 / jnp.where(np_, det, 1.0)
                        tx, ty, tz = sx - v0x, sy - v0y, sz - v0z
                        ub = (tx * pvx + ty * pvy + tz * pvz) * inv
                        qvx = ty * e1z - tz * e1y
                        qvy = tz * e1x - tx * e1z
                        qvz = tx * e1y - ty * e1x
                        vb = (dx * qvx + dy * qvy + dz * qvz) * inv
                        tc = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
                        ok = (np_ & (ub >= 0) & (vb >= 0) & (ub + vb <= 1)
                              & (tc >= 0) & (tc <= 1) & (tc < t_best))
                        return (jnp.where(ok, tc, t_best),
                                jnp.where(ok, tid, tri),
                                jnp.where(ok, ub, uu),
                                jnp.where(ok, vb, vv))

                    t_best, tri, uu, vv = jax.lax.cond(
                        k < count, tri_test, lambda a: a, (t_best, tri, uu, vv)
                    )
                return t_best, tri, uu, vv

            t_best, tri, uu, vv = jax.lax.cond(
                overlap & is_leaf, leaf_tests, lambda a: a, (t_best, tri, uu, vv)
            )
            nxt = jnp.where(overlap & ~is_leaf, node + 1, miss)
            return nxt, t_best, tri, uu, vv

        node0 = jnp.zeros((), jnp.int32)
        _, t_best, tri, uu, vv = jax.lax.while_loop(
            cond, body, (node0, t_best, tri0, uz, uz)
        )
        t_ref[:] = t_best
        id_ref[:] = tri
        u_ref[:] = uu
        v_ref[:] = vv

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    def traverse(start, seg, t_init=None):
        n = start.shape[0]
        rows = pl.cdiv(n, LANE)
        pad_rows = pl.cdiv(rows, block_rows) * block_rows
        n_pad = pad_rows * LANE

        def fcomp(x, i):
            return jnp.pad(x[:, i], (0, n_pad - n)).reshape(pad_rows, LANE)

        if t_init is None:
            t0 = jnp.full((n,), INVALID_PARAM, jnp.float32)
        else:
            t0 = t_init
        # Padding lanes get t=0 so they never trigger leaf work via t_blk.
        t0p = jnp.pad(t0, (0, n_pad - n)).reshape(pad_rows, LANE)

        args = [fcomp(start, 0), fcomp(start, 1), fcomp(start, 2),
                fcomp(seg, 0), fcomp(seg, 1), fcomp(seg, 2), t0p]
        args += [jnp.asarray(a) for a in packed.node_f32]
        args += [jnp.asarray(a) for a in packed.node_i32]
        args += [jnp.asarray(a) for a in packed.tri_f32]
        args += [jnp.asarray(packed.tri_id)]

        grid = (pad_rows // block_rows,)
        out_shapes = [
            jax.ShapeDtypeStruct((pad_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((pad_rows, LANE), jnp.int32),
            jax.ShapeDtypeStruct((pad_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((pad_rows, LANE), jnp.float32),
        ]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bspec] * 7 + [full] * (6 + 3 + 10 + 1),
            out_specs=[bspec, bspec, bspec, bspec],
            out_shape=out_shapes,
            interpret=interpret,
        )(*args)
        t, tid, uu, vv = [o.reshape(-1)[:n] for o in outs]
        return t, tid, uu, vv

    return traverse


def make_mesh_intersector(scene_pack, block_rays: int = 64,
                          sub_bundles: int = 64, group: int = 8,
                          interpret: bool | None = None, sort: bool = True,
                          pipeline_depth: int = 4, **trav_kwargs):
    """Full-scene intersector for BVH scenes: Pallas analytic kernel seeds
    ``t``, the culled MXU treelet kernel refines, triangle shading attributes
    gather in XLA.  Returns ``fn(start, seg[, alive]) → Hit`` or None if not
    applicable.  With ``sort`` the whole wavefront is reordered by
    (direction octant, origin Morton) before blocking — see
    make_sorted_intersector."""
    from fspt_tpu.ops.bvh import build_bvh
    from fspt_tpu.ops.intersect import Hit, KIND_TRIANGLE
    from fspt_tpu.ops.pallas_trace import make_pallas_intersector

    if scene_pack.bvh is None:
        return None
    base_fn = make_pallas_intersector(scene_pack.geometry, interpret=interpret)
    if base_fn is None:
        return None
    # Rebuild a treelet-granularity tree (the scene's fine BVH serves the
    # XLA path); reorder back to original ids first so tri_id gathers align.
    fine = scene_pack.bvh
    order = np.argsort(np.asarray(fine.tri_id))
    v0 = np.asarray(fine.tri_v0)[order]
    v1 = v0 + np.asarray(fine.tri_e1)[order]
    v2 = v0 + np.asarray(fine.tri_e2)[order]
    coarse = build_treelet_chunks(v0, v1, v2)
    tt = {k: jnp.asarray(vv) for k, vv in treelet_tables(coarse).items()}
    trav = make_culled_traverser(coarse, block_rays=block_rays,
                                 sub_bundles=sub_bundles, group=group,
                                 interpret=interpret,
                                 pipeline_depth=pipeline_depth,
                                 tables=tt, **trav_kwargs)
    ts = scene_pack.tri_shade

    # Mesh bounds for t clipping: every triangle hit lies inside this box,
    # so a ray's box-exit param bounds its deepest possible hit.  Rays that
    # escape the mesh (sky-bound bounces) get near-zero traversal work.
    mlo = np.minimum(v0, np.minimum(v1, v2)).min(axis=0)
    mhi = np.maximum(v0, np.maximum(v1, v2)).max(axis=0)
    box_lo = jnp.asarray(mlo, jnp.float32)
    box_hi = jnp.asarray(mhi, jnp.float32)

    def _box_exit(start, seg):
        inv = 1.0 / jnp.where(jnp.abs(seg) < 1e-30,
                              jnp.where(seg >= 0, 1e-30, -1e-30), seg)
        ta = (box_lo - start) * inv
        tb = (box_hi - start) * inv
        tnear = jnp.max(jnp.minimum(ta, tb), axis=-1)
        tfar = jnp.min(jnp.maximum(ta, tb), axis=-1)
        hitbox = (tnear <= tfar) & (tfar > 0.0)
        return jnp.where(hitbox, tfar * 1.0001 + 1e-5, 0.0)

    lo_j = jnp.asarray(mlo, jnp.float32)
    hi_j = jnp.asarray(mhi, jnp.float32)

    def intersect(start, seg, alive=None):
        # Everything except the block-culled sweep is order-independent
        # per-lane math, so only the sweep sees the Morton-sorted wavefront
        # and only its two scalar outputs (t, packed best) get unsorted —
        # not a 7-field Hit (3 of them [N,3]) as the old sorted wrapper did.
        base = base_fn(start, seg)
        t_init = jnp.minimum(base.t, _box_exit(start, seg))
        if alive is not None:
            t_init = jnp.where(alive, t_init, 0.0)
        if sort:
            n = start.shape[0]
            if sort == "seg" and n % SORT_SEG == 0:
                order = morton_order_segmented(start, seg, alive, lo_j, hi_j)
            elif sort == "cullsim":
                key = cullsim_keys(start, seg, alive, t_init, lo_j, hi_j,
                                   tt["lbmin"], tt["lbmax"])
                order = jnp.argsort(key)
            else:
                key = morton_keys(start, seg, alive, lo_j, hi_j)
                order = jnp.argsort(key)
            t_kern, packed = trav.raw(start[order], seg[order],
                                      t_init=t_init[order])
            inv = jnp.zeros((n,), jnp.int32).at[order].set(
                jnp.arange(n, dtype=jnp.int32))
            t_kern, packed = t_kern[inv], packed[inv]
        else:
            t_kern, packed = trav.raw(start, seg, t_init=t_init)
        t_tri, tri_id, u, v = trav.post(start, seg, t_kern, packed)
        tri_hit = tri_id >= 0
        tid = jnp.maximum(tri_id, 0)
        n0, n1, n2 = ts.n0[tid], ts.n1[tid], ts.n2[tid]
        normal = n0 + (n1 - n0) * u[:, None] + (n2 - n0) * v[:, None]
        t0, t1, t2 = ts.t0[tid], ts.t1[tid], ts.t2[tid]
        texcoords = t0 + (t1 - t0) * u[:, None] + (t2 - t0) * v[:, None]
        # trav was seeded with base.t, so any tri_hit is strictly closer.
        t = jnp.where(tri_hit, t_tri, base.t)
        return Hit(
            t=t,
            point=start + seg * t[:, None],
            normal=jnp.where(tri_hit[:, None], normal, base.normal),
            texcoords=jnp.where(tri_hit[:, None], texcoords, base.texcoords),
            mat=jnp.where(tri_hit, ts.mat[tid], base.mat),
            prim_kind=jnp.where(tri_hit, KIND_TRIANGLE, base.prim_kind),
            hit=base.hit | tri_hit,
            prim_id=tri_id,
        )

    intersect.accepts_alive = True
    return intersect


# ---------------------------------------------------------------------------
# MXU treelet traverser: Möller–Trumbore as matmul.
#
# Every MT quantity is a scalar triple product, hence *linear* in the
# per-ray feature vector F = [d, c=o×d, o, 1] with per-triangle weights:
#
#   det   = d·(e2×e1)
#   u_num = c·e2 − d·(e2×v0)
#   v_num = −c·e1 − d·(v0×e1)
#   t_num = o·(e1×e2) − v0·(e1×e2)
#
# So a 128-triangle treelet is ONE (lanes,16)@(16,512) MXU matmul whose
# weight block loads with a single contiguous VMEM row read — no per-
# triangle scalar traffic at all.  The treelet-level BVH (max_leaf=128)
# is still walked per block with the interval frustum, but it is ~50×
# smaller than a per-triangle tree.

TREELET = 128
_NF = 16  # ray feature padding (10 used)
_NQ = 4  # det, u_num, v_num, t_num


def build_treelet_chunks(v0, v1, v2, leaf: int = TREELET) -> FlatBVH:
    """Balanced k-d chunking into FULL treelets (leaf-only FlatBVH).

    The median-split builder leaves treelets ~76% full (97/128 tris on the
    bench scene), so the MXU sweep pays for 1024 leaves where 778 suffice.
    This builder recursively splits the widest centroid axis at a
    multiple-of-``leaf`` boundary nearest the median: every treelet is
    exactly full except one, cutting leaf count — and with it cull lattice
    width, sort width, and sweep visits — by ~24% at equal spatial quality.

    The result has no internal nodes (count>0 everywhere, miss=i+1): the
    culled traverser never walks the tree — it culls every leaf directly —
    so only leaf bounds/ranges are meaningful.  Not usable with
    make_treelet_traverser (which needs a walkable hierarchy).
    """
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    n = v0.shape[0]
    cent = (v0 + v1 + v2) / 3.0
    chunks = []

    def split(idx):
        m = len(idx)
        if m <= leaf:
            chunks.append(idx)
            return
        c = cent[idx]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        k = int(round((m / 2) / leaf)) * leaf
        k = min(max(k, leaf), ((m - 1) // leaf) * leaf)
        split(idx[order[:k]])
        split(idx[order[k:]])

    split(np.arange(n, dtype=np.int64))
    order = np.concatenate(chunks)
    tv0, tv1, tv2 = v0[order], v1[order], v2[order]
    e1, e2 = tv1 - tv0, tv2 - tv0
    lo = np.minimum(tv0, np.minimum(tv1, tv2))
    hi = np.maximum(tv0, np.maximum(tv1, tv2))
    sizes = np.array([len(c) for c in chunks], np.int32)
    first = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
    bmin = np.stack([
        np.minimum.reduceat(lo[:, a], first) for a in range(3)], axis=1)
    bmax = np.stack([
        np.maximum.reduceat(hi[:, a], first) for a in range(3)], axis=1)
    m_nodes = len(chunks)
    return FlatBVH(
        bmin=jnp.asarray(bmin), bmax=jnp.asarray(bmax),
        first=jnp.asarray(first), count=jnp.asarray(sizes),
        miss=jnp.asarray(np.arange(1, m_nodes + 1, dtype=np.int32)),
        tri_v0=jnp.asarray(tv0), tri_e1=jnp.asarray(e1),
        tri_e2=jnp.asarray(e2),
        tri_area2=jnp.asarray(np.linalg.norm(np.cross(e1, e2), axis=-1)),
        tri_id=jnp.asarray(order.astype(np.int32)),
    )


class PackedTreelets:
    """Aligned treelet layout + MT weight blocks for the MXU kernel."""

    def __init__(self, bvh: FlatBVH):
        f = np.asarray
        count = f(bvh.count)
        first = f(bvh.first)
        leaf_nodes = np.nonzero(count > 0)[0]
        n_leaves = len(leaf_nodes)
        self.n_nodes = int(bvh.n_nodes)
        self.n_leaves = n_leaves

        v0 = f(bvh.tri_v0)
        e1 = f(bvh.tri_e1)
        e2 = f(bvh.tri_e2)
        tid = f(bvh.tri_id)

        # W[leaf, f, q, j]: feature × quantity × tri-column.
        W = np.zeros((n_leaves, _NF, _NQ, TREELET), np.float32)
        # Padding slots carry a huge area so |det| >= EPSILON·area is never
        # satisfied — they can't produce hits in either kernel.
        area = np.full((n_leaves, TREELET), 3.0e38, np.float32)
        ids = np.full((n_leaves, TREELET), -1, np.int32)
        leaf_base = np.zeros(self.n_nodes, np.int32)
        for ord_, node in enumerate(leaf_nodes):
            leaf_base[node] = ord_
            c = int(count[node])
            sl = slice(int(first[node]), int(first[node]) + c)
            lv0, le1, le2 = v0[sl], e1[sl], e2[sl]
            g = np.cross(le2, le1)  # det weights (d slots)
            e2xv0 = np.cross(le2, lv0)
            v0xe1 = np.cross(lv0, le1)
            h = np.cross(le1, le2)
            W[ord_, 0:3, 0, :c] = g.T
            W[ord_, 0:3, 1, :c] = -e2xv0.T
            W[ord_, 3:6, 1, :c] = le2.T
            W[ord_, 0:3, 2, :c] = -v0xe1.T
            W[ord_, 3:6, 2, :c] = -le1.T
            W[ord_, 6:9, 3, :c] = h.T
            W[ord_, 9, 3, :c] = -(lv0 * h).sum(-1)
            area[ord_, :c] = np.linalg.norm(np.cross(le1, le2), axis=-1)
            ids[ord_, :c] = tid[sl]

        # Flatten for single-row-range dynamic loads: [n_leaves*64, 128].
        self.w_rows = W.reshape(n_leaves * _NF * _NQ, TREELET)
        # MXU-ready layout: one leaf = 16 rows of (NQ·128) columns, so the
        # sweep kernel DMAs a (16,512) block it can feed to jnp.dot with no
        # in-kernel relayout (the (64,128)→(16,512) reshape is a cross-lane
        # shuffle Mosaic pays for on every leaf visit).
        self.w_mxu = np.ascontiguousarray(
            W.transpose(0, 1, 2, 3).reshape(n_leaves, _NF, _NQ * TREELET)
        ).reshape(n_leaves * _NF, _NQ * TREELET)
        self.area = area
        self.ids = ids
        self.node_f32 = [
            _pack_lanes(f(bvh.bmin)[:, 0], np.float32),
            _pack_lanes(f(bvh.bmin)[:, 1], np.float32),
            _pack_lanes(f(bvh.bmin)[:, 2], np.float32),
            _pack_lanes(f(bvh.bmax)[:, 0], np.float32),
            _pack_lanes(f(bvh.bmax)[:, 1], np.float32),
            _pack_lanes(f(bvh.bmax)[:, 2], np.float32),
        ]
        self.node_i32 = [
            _pack_lanes(count, np.int32),
            _pack_lanes(leaf_base, np.int32),
            _pack_lanes(f(bvh.miss), np.int32),
        ]


def make_treelet_traverser(bvh: FlatBVH, block_rays: int = 512,
                           interpret: bool | None = None):
    """Compile the MXU treelet traverser (bvh must use max_leaf=TREELET).

    Ray-major layout: each grid block owns ``block_rays`` rays in the
    sublane dimension — per-ray state is an ``(R,1)`` column, the leaf test
    is full-width ``(R,128)`` vector math, and the MT matmul consumes the
    caller-built ``(R,16)`` ray-feature matrix with no in-kernel relayout
    (Mosaic cannot move data between lanes and sublanes).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    packed = PackedTreelets(bvh)
    m = packed.n_nodes
    R = block_rays

    def kernel(F_ref,
               bmnx_ref, bmny_ref, bmnz_ref, bmxx_ref, bmxy_ref, bmxz_ref,
               count_ref, base_ref, miss_ref, w_ref, area_ref, ids_ref,
               out_ref, w_scratch, w_sem):
        F = F_ref[:]  # (R,16): [d, o×d, o, 1, t0, pad] — col 10 seeds t_best
        t_best = F[:, 10:11]  # (R,1)

        dxc, dyc, dzc = F[:, 0:1], F[:, 1:2], F[:, 2:3]
        oxc, oyc, ozc = F[:, 6:7], F[:, 7:8], F[:, 8:9]
        ox0, ox1 = jnp.min(oxc), jnp.max(oxc)
        oy0, oy1 = jnp.min(oyc), jnp.max(oyc)
        oz0, oz1 = jnp.min(ozc), jnp.max(ozc)
        dxl, dxh = jnp.min(dxc), jnp.max(dxc)
        dyl, dyh = jnp.min(dyc), jnp.max(dyc)
        dzl, dzh = jnp.min(dzc), jnp.max(dzc)
        big = jnp.float32(3.0e38)

        def islab(bmn, bmx, o0, o1, d0, d1):
            a, b_ = bmn - o1, bmx - o0
            crosses = (d0 <= 0.0) & (d1 >= 0.0)
            sd0 = jnp.where(jnp.abs(d0) < 1e-30, 1e-30, d0)
            sd1 = jnp.where(jnp.abs(d1) < 1e-30, 1e-30, d1)
            q = jnp.stack([a / sd0, a / sd1, b_ / sd0, b_ / sd1])
            lo = jnp.where(crosses, -big, jnp.min(q))
            hi = jnp.where(crosses, big, jnp.max(q))
            inside = (b_ >= 0.0) & (a <= 0.0)
            lo = jnp.where(inside, jnp.minimum(lo, 0.0), lo)
            hi = jnp.where(inside, jnp.maximum(hi, 0.0), hi)
            return lo, hi

        tri0 = jnp.full((R, 1), -1, jnp.int32)
        uz = jnp.zeros((R, 1), jnp.float32)

        def cond(state):
            return state[0] < m

        def body(state):
            node, t_best, tri, uu, vv = state
            t_blk = jnp.minimum(jnp.max(t_best), 1.0)
            bmnx = _read_scalar(bmnx_ref, node)
            bmny = _read_scalar(bmny_ref, node)
            bmnz = _read_scalar(bmnz_ref, node)
            bmxx = _read_scalar(bmxx_ref, node)
            bmxy = _read_scalar(bmxy_ref, node)
            bmxz = _read_scalar(bmxz_ref, node)
            tx0, tx1 = islab(bmnx, bmxx, ox0, ox1, dxl, dxh)
            ty0, ty1 = islab(bmny, bmxy, oy0, oy1, dyl, dyh)
            tz0, tz1 = islab(bmnz, bmxz, oz0, oz1, dzl, dzh)
            t_lo = jnp.maximum(jnp.maximum(tx0, ty0), tz0)
            t_hi = jnp.minimum(jnp.minimum(tx1, ty1), tz1)
            overlap = (t_lo <= t_hi) & (t_hi >= 0.0) & (t_lo <= t_blk)

            count = _read_scalar(count_ref, node)
            base = _read_scalar(base_ref, node)
            miss = _read_scalar(miss_ref, node)
            is_leaf = count > 0

            def leaf_mxu(args):
                t_best, tri, uu, vv = args
                # The 32KB weight block lives in HBM (too large for VMEM at
                # 100k+ tris); DMA it into scratch for this leaf.
                wrow = base * (_NF * _NQ)
                dma = pltpu.make_async_copy(
                    w_ref.at[pl.ds(wrow, _NF * _NQ), :], w_scratch, w_sem
                )
                dma.start()
                dma.wait()
                W = w_scratch[:].reshape(_NF, _NQ * TREELET)  # (16,512)
                out = jnp.dot(F, W, preferred_element_type=jnp.float32,
                              precision="highest")  # (R,512)
                out = out.reshape(R, _NQ, TREELET)
                det = out[:, 0, :]
                u_num = out[:, 1, :]
                v_num = out[:, 2, :]
                t_num = out[:, 3, :]
                area = area_ref[pl.ds(base, 1), :]  # (1,128)
                ids = ids_ref[pl.ds(base, 1), :]
                np_ = jnp.abs(det) >= vm.EPSILON * area
                inv = 1.0 / jnp.where(np_, det, 1.0)
                ub = u_num * inv
                vb = v_num * inv
                tc = t_num * inv
                ok = (np_ & (ub >= 0) & (vb >= 0) & (ub + vb <= 1)
                      & (tc >= 0) & (tc <= 1) & (tc < t_best)
                      & (ids >= 0))
                tc_m = jnp.where(ok, tc, big)
                t_min = jnp.min(tc_m, axis=1, keepdims=True)  # (R,1)
                any_hit = t_min < big
                col = jax.lax.broadcasted_iota(jnp.int32, (R, TREELET), 1)
                j_min = jnp.min(jnp.where(tc_m <= t_min, col, TREELET),
                                axis=1, keepdims=True)
                sel = col == j_min
                pick = lambda x: jnp.sum(jnp.where(sel, x, 0), axis=1,
                                         keepdims=True)
                new_t = jnp.where(any_hit, t_min, t_best)
                new_id = jnp.where(any_hit,
                                   pick(jnp.broadcast_to(ids, (R, TREELET))), tri)
                new_u = jnp.where(any_hit, pick(ub), uu)
                new_v = jnp.where(any_hit, pick(vb), vv)
                return new_t, new_id, new_u, new_v

            t_best, tri, uu, vv = jax.lax.cond(
                overlap & is_leaf, leaf_mxu, lambda a: a, (t_best, tri, uu, vv)
            )
            nxt = jnp.where(overlap & ~is_leaf, node + 1, miss)
            return nxt, t_best, tri, uu, vv

        node0 = jnp.zeros((), jnp.int32)
        _, t_best, tri, uu, vv = jax.lax.while_loop(
            cond, body, (node0, t_best, tri0, uz, uz)
        )
        out_ref[:] = jnp.concatenate(
            [t_best, pltpu.bitcast(tri, jnp.float32), uu, vv], axis=1
        )

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((R, _NF), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def traverse(start, seg, t_init=None):
        n = start.shape[0]
        n_pad = pl.cdiv(n, R) * R

        c = jnp.cross(start, seg)
        ones = jnp.ones((n, 1), jnp.float32)
        t0 = jnp.full((n,), INVALID_PARAM, jnp.float32) if t_init is None else t_init
        zeros = jnp.zeros((n, _NF - 11), jnp.float32)
        F = jnp.concatenate([seg, c, start, ones, t0[:, None], zeros], axis=1)
        # Padding rays get t0=0 so they never contribute leaf work via t_blk.
        F = jnp.pad(F, ((0, n_pad - n), (0, 0)))

        args = [F]
        args += [jnp.asarray(a) for a in packed.node_f32]
        args += [jnp.asarray(a) for a in packed.node_i32]
        args += [jnp.asarray(packed.w_rows), jnp.asarray(packed.area),
                 jnp.asarray(packed.ids)]

        grid = (n_pad // R,)
        ospec = pl.BlockSpec((R, 4), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[fspec] + [full] * 9
            + [pl.BlockSpec(memory_space=pl.ANY)] + [full] * 2,
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((_NF * _NQ, TREELET), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(*args)
        t = out[:n, 0]
        tid = jax.lax.bitcast_convert_type(out[:n, 1], jnp.int32)
        return t, tid, out[:n, 2], out[:n, 3]

    return traverse


# ---------------------------------------------------------------------------
# Wavefront sorting: the TPU answer to bounce-ray divergence.
#
# Packet culling only works while a block's rays share a frustum.  Primary
# rays do (tile order); bounce rays scatter.  Sorting every wavefront by
# (direction octant, origin Morton) restores coherence for *all* bounces —
# an XLA argsort on a single int32 key is dense, fast, and differentiable-
# safe (only integer permutations flow through it).  Dead lanes sort to the
# end, so trailing blocks carry t_init=0 frustums and exit immediately:
# stream compaction without a dynamic shape (SURVEY.md §7 hard part 3).


def _spread6(x, bits):
    """Spread the low ``bits`` bits of x so consecutive bits are 6 apart."""
    out = jnp.zeros_like(x)
    for i in range(bits):
        out = out | (((x >> i) & 1) << (6 * i))
    return out


SORT_SEG = 4096  # segmented value-sort granularity (rays per segment)


def morton_order_segmented(start, seg, alive, lo, hi):
    """Segmented packed value-sort: ``order`` permuting rays within disjoint
    SORT_SEG-ray segments by an 18-bit 6-D Morton key.

    One int32 carries (dead flag << 30) | (key18 << 12) | local index, and
    ``jnp.sort`` runs along the segment axis — bitonic depth log²(4096)≈144
    vs ≈400 for a flat 1M argsort, and no (key, iota) variadic sort.  The
    coarser key (3 bits/axis vs 5) only matters *within* a segment: segments
    are contiguous raster/pixel runs, so origins are already clustered and
    the key mostly buys direction coherence.  Requires n % SORT_SEG == 0.
    """
    n = start.shape[0]
    assert n % SORT_SEG == 0
    scale = 7.0 / jnp.maximum(hi - lo, 1e-6)
    qo = jnp.clip((start - lo) * scale, 0.0, 7.0).astype(jnp.int32)
    dn = seg / jnp.maximum(
        jnp.linalg.norm(seg, axis=-1, keepdims=True), 1e-30)
    qd = jnp.clip((dn + 1.0) * 3.999, 0.0, 7.0).astype(jnp.int32)
    key = jnp.zeros((n,), jnp.int32)
    for a in range(3):
        key = key | (_spread6(qd[:, a], 3) << a)
        key = key | (_spread6(qo[:, a], 3) << (a + 3))
    if alive is not None:
        key = jnp.where(alive, key, jnp.int32(1 << 18))
    local = jnp.tile(jnp.arange(SORT_SEG, dtype=jnp.int32), n // SORT_SEG)
    packed = (key << 12) | local
    packed = jnp.sort(packed.reshape(-1, SORT_SEG), axis=1).reshape(-1)
    base = (jnp.arange(n, dtype=jnp.int32) // SORT_SEG) * SORT_SEG
    return base + (packed & 0xFFF)


def morton_keys(start, seg, alive, lo, hi):
    """int32 sort key: 6-D Morton over (origin, direction), 5 bits/axis.

    Blocks need BOTH a tight origin box and a tight direction box for the
    interval frustum to cull; interleaving all six quantized coordinates
    clusters on both at every scale.  Origin-only keys degenerate for
    pinhole primaries (all origins equal), direction-only keys degenerate
    for diffuse bounces off a small patch.
    """
    scale = 31.0 / jnp.maximum(hi - lo, 1e-6)
    qo = jnp.clip((start - lo) * scale, 0.0, 31.0).astype(jnp.int32)
    dn = seg / jnp.maximum(
        jnp.linalg.norm(seg, axis=-1, keepdims=True), 1e-30)
    qd = jnp.clip((dn + 1.0) * 15.999, 0.0, 31.0).astype(jnp.int32)
    key = jnp.zeros(start.shape[:1], jnp.int32)
    for a in range(3):
        key = key | (_spread6(qd[:, a], 5) << a)
        key = key | (_spread6(qo[:, a], 5) << (a + 3))
    if alive is not None:
        key = jnp.where(alive, key, jnp.int32(1 << 30))
    return key


def nearest_leaf_ids(start, seg, t_init, lbmin, lbmax, chunk: int = 1 << 13):
    """Per-ray id of the nearest culled treelet (argmin slab entry-t).

    The cull-list-similarity blocking key (VERDICT r3 #1c / r4 #3b): two
    rays whose nearest treelet matches tend to share most of their cull
    list, so sorting on (nearest leaf, Morton tiebreak) forms blocks with
    tighter unions than raw 6-D Morton.  Runs the exact per-ray slab test
    (the same math as the per-ray cull) in ``chunk``-ray slices via
    ``lax.map`` to bound the [rays, leaves] lattice.  Rays overlapping no
    leaf (or dead, t_init<=0) report ``L`` so they cluster at the end.
    """
    n = start.shape[0]
    L = lbmin.shape[0]
    big = jnp.float32(3.0e38)
    pad = (-n) % chunk
    s = jnp.pad(start, ((0, pad), (0, 0)))
    g = jnp.pad(seg, ((0, pad), (0, 0)), constant_values=1.0)
    t0 = jnp.pad(t_init, (0, pad))

    def one(args):
        sb, gb, tb = args
        r = 1.0 / jnp.where(jnp.abs(gb) < 1e-30,
                            jnp.where(gb >= 0, 1e-30, -1e-30), gb)
        ta = (lbmin[None] - sb[:, None]) * r[:, None]
        tbx = (lbmax[None] - sb[:, None]) * r[:, None]
        t_lo = jnp.max(jnp.minimum(ta, tbx), axis=-1)
        t_hi = jnp.min(jnp.maximum(ta, tbx), axis=-1)
        ok = ((t_lo <= t_hi) & (t_hi >= 0.0)
              & (t_lo <= jnp.minimum(tb, 1.0)[:, None])
              & (tb > 0.0)[:, None])
        key = jnp.where(ok, jnp.maximum(t_lo, 0.0), big)
        nl = jnp.argmin(key, axis=1).astype(jnp.int32)
        return jnp.where(jnp.any(ok, axis=1), nl, L)

    nl = jax.lax.map(one, (s.reshape(-1, chunk, 3),
                           g.reshape(-1, chunk, 3),
                           t0.reshape(-1, chunk)))
    return nl.reshape(-1)[:n]


def cullsim_keys(start, seg, alive, t_init, lo, hi, lbmin, lbmax):
    """Block-formation sort key: nearest-treelet id (major) with a 6-D
    Morton tiebreak (minor).  Dead lanes sort last."""
    nl = nearest_leaf_ids(start, seg, t_init, lbmin, lbmax)
    L = lbmin.shape[0]
    if alive is not None:
        nl = jnp.where(alive, nl, L + 1)
    mk = morton_keys(start, seg, None, lo, hi)
    return nl * (1 << 20) + ((mk >> 10) & 0xFFFFF)


def make_sorted_intersector(inner, scene_lo, scene_hi):
    """Wrap an ``fn(start, seg, alive)`` intersector with wavefront sorting."""
    lo = jnp.asarray(scene_lo, jnp.float32)
    hi = jnp.asarray(scene_hi, jnp.float32)

    def intersect(start, seg, alive=None):
        key = morton_keys(start, seg, alive, lo, hi)
        order = jnp.argsort(key)
        hit = inner(start[order], seg[order],
                    None if alive is None else alive[order])
        n = start.shape[0]
        inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        return jax.tree.map(lambda a: a[inv], hit)

    intersect.accepts_alive = True
    return intersect


# ---------------------------------------------------------------------------
# Culled treelet traversal: the tree walk, inverted for the TPU.
#
# The sequential miss-link walk costs ~1-2 µs per node visit (dynamic row
# slice + one-hot reduction per scalar, ×9, plus while_loop overhead) and
# visits every node when blocks are incoherent.  At treelet granularity the
# whole "tree" is only a few hundred leaves, so we drop the hierarchy
# entirely and split traversal into two TPU-shaped stages:
#
#   1. XLA cull: every ray block's interval frustum is tested against EVERY
#      treelet AABB at once — a dense [blocks, leaves] batch of slab tests
#      (pure VPU math, ~30 flops each), then one argsort orders each block's
#      surviving leaves front-to-back by conservative entry t.
#   2. Pallas sweep: each block walks only its own compacted list — per
#      leaf: one scalar read, one 32 KB weight DMA, one (R,16)@(16,512) MXU
#      Möller–Trumbore matmul — and exits as soon as the sorted entry t
#      exceeds the block's worst hit (the classic closest-hit early-out).
#
# No per-lane gather, no divergence, and the expensive stage scales with
# *surviving* leaves, not tree size.


GROUP = 4  # treelets swept per kernel iteration (amortizes fixed costs)
CULL_BATCH = 8  # ray blocks per cull-kernel grid step (sublane-tiling min)


def treelet_tables(bvh: FlatBVH, n_leaves_pad: int = None,
                   n_tris_pad: int = None):
    """Host-side packed table pytree for :func:`make_culled_traverser`.

    With ``n_leaves_pad``/``n_tris_pad`` the tables pad to common shapes so
    per-shard tables can stack on a leading axis and ride a device mesh
    (parallel/scene_shard fast path): pad leaves carry inverted bounds and
    huge areas (they survive neither the cull nor the MT validity test),
    pad triangles carry ``tri_id`` −1.
    """
    packed = PackedTreelets(bvh)
    f = np.asarray
    L = packed.n_leaves
    Lp = n_leaves_pad or L
    assert Lp >= L
    count_np = f(bvh.count)
    leaf_nodes = np.nonzero(count_np > 0)[0]
    lbmin = f(bvh.bmin)[leaf_nodes].astype(np.float32)
    lbmax = f(bvh.bmax)[leaf_nodes].astype(np.float32)
    pl_ = Lp - L
    lbmin = np.concatenate([lbmin, np.full((pl_, 3), 3.0e38, np.float32)])
    lbmax = np.concatenate([lbmax, np.full((pl_, 3), -3.0e38, np.float32)])
    w = packed.w_mxu
    w = np.concatenate([w, np.zeros((pl_ * _NF, w.shape[1]), np.float32)])
    area = np.concatenate(
        [packed.area, np.full((pl_, TREELET), 3.0e38, np.float32)])
    leaf_first = np.concatenate([
        f(bvh.first)[leaf_nodes].astype(np.int32), np.zeros(pl_, np.int32)])
    Tn = f(bvh.tri_v0).shape[0]
    Tp = n_tris_pad or Tn
    assert Tp >= Tn
    pt = Tp - Tn

    def padt(a, fill=0):
        a = f(a)
        pad = np.full((pt,) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, pad])

    return dict(
        lbmin=lbmin, lbmax=lbmax, w_mxu=w, area=area, leaf_first=leaf_first,
        tri_v0=padt(bvh.tri_v0), tri_e1=padt(bvh.tri_e1),
        tri_e2=padt(bvh.tri_e2), tri_id=padt(bvh.tri_id, -1),
    )


def make_culled_traverser(bvh: FlatBVH, block_rays: int = 128,
                          sub_bundles: int = 128, group: int = GROUP,
                          precision=jax.lax.Precision.HIGHEST,
                          interpret: bool | None = None,
                          ablate: str = "", early_exit: bool = True,
                          tables=None, pipeline_depth: int = 2):
    """Compile ``fn(start[N,3], seg[N,3], t_init[N]) → (t, tri_id, u, v)``.

    ``bvh`` must be built with max_leaf=TREELET.  Lanes with t_init<=0 are
    treated as dead: they contribute nothing to block frustums and trigger
    no leaf work.  Each block's leaf list is the union of ``sub_bundles``
    tighter per-bundle frustum culls (strictly fewer survivors than one
    block-wide frustum).

    ``ablate`` / ``early_exit`` are DEV-ONLY roofline knobs (results are
    wrong under ablation): ``"dot"`` strips the per-leaf epilogue (isolates
    MXU+DMA cost), ``"lite"`` keeps the validity/depth math but drops the
    winner-id bookkeeping; ``early_exit=False`` pins the trip count so
    variants sweep identical visit counts.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tables is None:
        tables = {k: jnp.asarray(v) for k, v in treelet_tables(bvh).items()}
    T = tables  # baked constants or traced per-shard arrays (scene sharding)
    R = block_rays
    S = sub_bundles
    assert R % S == 0
    G = group
    assert LANE % G == 0
    n_leaves = int(T["area"].shape[0])
    l_rows = max(1, (n_leaves + LANE - 1) // LANE)
    l_pad = l_rows * LANE
    big = jnp.float32(3.0e38)

    lbmin = T["lbmin"]  # [L,3], pad leaves carry inverted boxes
    lbmax = T["lbmax"]

    # Lane-packed leaf bounds for the Pallas cull kernel.  Pad slots get
    # inverted boxes (lo=+big, hi=-big): t_lo > t_hi for every ray, so they
    # can never survive the cull.
    def _lane_pack_bounds(col, fill):
        return jnp.concatenate([
            col, jnp.full((l_pad - n_leaves,), fill, jnp.float32)
        ]).reshape(l_rows, LANE)

    cull_bounds = [_lane_pack_bounds(lbmin[:, a], 3.0e38) for a in range(3)] \
        + [_lane_pack_bounds(lbmax[:, a], -3.0e38) for a in range(3)]

    def cull(start_b, seg_b, t0_b):
        """[B,R,3]×2, [B,R] → sorted leaf ids [B,Lp], entry t [B,Lp], counts [B,1]."""
        bb = start_b.shape[0]
        if S == R:
            # Per-ray granularity: the interval frustum degenerates to an
            # EXACT ray/AABB slab test with the ray's own t limit — the
            # tightest possible block list for this blocking, at half the
            # flops of the generic interval form.
            sb = start_b.reshape(bb * R, 3)
            gb = seg_b.reshape(bb * R, 3)
            tb = t0_b.reshape(bb * R)
            r = 1.0 / jnp.where(jnp.abs(gb) < 1e-30,
                                jnp.where(gb >= 0, 1e-30, -1e-30), gb)
            ta = (lbmin[None] - sb[:, None]) * r[:, None]  # [B·R,L,3]
            tbx = (lbmax[None] - sb[:, None]) * r[:, None]
            t_lo = jnp.max(jnp.minimum(ta, tbx), axis=-1)  # [B·R,L]
            t_hi = jnp.min(jnp.maximum(ta, tbx), axis=-1)
            overlap = ((t_lo <= t_hi) & (t_hi >= 0.0)
                       & (t_lo <= jnp.minimum(tb, 1.0)[:, None])
                       & (tb > 0.0)[:, None])
            key_s = jnp.where(overlap, jnp.maximum(t_lo, 0.0), big)
            key = jnp.min(key_s.reshape(bb, R, n_leaves), axis=1)  # [B,L]
        else:
            sb = start_b.reshape(bb * S, R // S, 3)
            gb = seg_b.reshape(bb * S, R // S, 3)
            tb = t0_b.reshape(bb * S, R // S)
            valid = tb > 0.0
            vmask = valid[..., None]
            o0 = jnp.min(jnp.where(vmask, sb, big), axis=1)  # [B·S,3]
            o1 = jnp.max(jnp.where(vmask, sb, -big), axis=1)
            d0 = jnp.min(jnp.where(vmask, gb, big), axis=1)
            d1 = jnp.max(jnp.where(vmask, gb, -big), axis=1)
            t_blk = jnp.minimum(jnp.max(tb, axis=1), 1.0)  # [B·S]
            any_valid = jnp.any(valid, axis=1)

            a = lbmin[None] - o1[:, None]  # [B·S,L,3]
            b_ = lbmax[None] - o0[:, None]
            crosses = ((d0 <= 0.0) & (d1 >= 0.0))[:, None, :]
            # Reciprocals once per bundle (divides on the [B·S,L,3] lattice
            # cost ~10x a multiply on the VPU and dominated this stage).
            r0 = (1.0 / jnp.where(jnp.abs(d0) < 1e-30, 1e-30, d0))[:, None, :]
            r1 = (1.0 / jnp.where(jnp.abs(d1) < 1e-30, 1e-30, d1))[:, None, :]
            lo = jnp.minimum(jnp.minimum(a * r0, a * r1),
                             jnp.minimum(b_ * r0, b_ * r1))
            hi = jnp.maximum(jnp.maximum(a * r0, a * r1),
                             jnp.maximum(b_ * r0, b_ * r1))
            lo = jnp.where(crosses, -big, lo)
            hi = jnp.where(crosses, big, hi)
            inside = (b_ >= 0.0) & (a <= 0.0)
            lo = jnp.where(inside, jnp.minimum(lo, 0.0), lo)
            hi = jnp.where(inside, jnp.maximum(hi, 0.0), hi)
            t_lo = jnp.max(lo, axis=-1)  # [B·S,L]
            t_hi = jnp.min(hi, axis=-1)
            overlap = ((t_lo <= t_hi) & (t_hi >= 0.0)
                       & (t_lo <= t_blk[:, None]) & any_valid[:, None])
            key_s = jnp.where(overlap, jnp.maximum(t_lo, 0.0), big)
            # Block list = union over sub-bundles; entry t = best per bundle.
            key = jnp.min(key_s.reshape(bb, S, n_leaves), axis=1)  # [B,L]
        return _order_from_key(key)

    def _order_from_key(key):
        """[B, L] conservative entry-t keys (big = culled) → sorted leaf
        lists, entry ts, survivor counts."""
        counts = jnp.sum(key < big, axis=1, dtype=jnp.int32)[:, None]  # [B,1]
        # Front-to-back ordering via ONE int32 value sort: entry t (∈[0,1],
        # t_blk is clipped to 1) floor-quantized into the high bits, leaf id
        # in the low bits.  An argsort would sort a (key, iota) pair and then
        # gather twice (order, tlo) — 3-4x the memory traffic; this stage was
        # sort-bound (113 of 128 ms at 8192x1024).  Floor quantization keeps
        # the early-exit sound: the kernel exits when tlo_next > t_blk, and
        # quantized-down tlo only delays (never wrongly triggers) the exit.
        id_bits = max(1, (n_leaves - 1).bit_length())
        t_scale = jnp.float32((1 << (30 - id_bits)) - 1)
        t_q = (jnp.minimum(key, 1.0) * t_scale).astype(jnp.int32)
        leaf_iota = jnp.arange(n_leaves, dtype=jnp.int32)[None, :]
        pad_key = jnp.int32(0x7FFFFFFF)
        packed = jnp.where(key < big, (t_q << id_bits) | leaf_iota, pad_key)
        packed = jnp.pad(packed, ((0, 0), (0, l_pad - n_leaves)),
                         constant_values=pad_key)
        packed = jnp.sort(packed, axis=1)  # [B,Lp]
        # Clamp pad entries: the kernel may sweep a couple of slots past
        # count (group granularity) — any in-range leaf is a correct,
        # merely wasteful test; an out-of-range id would be an OOB DMA.
        order = jnp.minimum(packed & ((1 << id_bits) - 1), n_leaves - 1)
        tlo_sorted = (packed >> id_bits).astype(jnp.float32) / t_scale
        return order, tlo_sorted, counts

    # The per-block leaf list, sorted entry-t, and survivor count live in
    # SMEM: the sweep loop reads them with plain dynamic scalar indexing on
    # the scalar core (a few cycles each).  The previous design lane-packed
    # them in VMEM and decoded each scalar with a dynamic row slice + one-hot
    # reduction on the VPU — ~9 such reads per group iteration dominated the
    # whole sweep for incoherent wavefronts (~2 µs/leaf visit measured).
    def kernel(count_ref, list_ref, tlo_ref, F_ref, w_ref, area_ref,
               out_ref, w_scratch0, w_scratch1, sem0, sem1):
        F = F_ref[:]  # (R,16): [d, o×d, o, 1, t0, pad]
        t_best = F[:, 10:11]  # (R,1)
        count = count_ref[0, 0, 0]
        nrw = _NF  # weight rows per leaf in the (16, NQ·128) MXU layout

        def read_group(gk):
            """G consecutive leaf ids starting at slot gk (clamped)."""
            return [list_ref[0, 0, jnp.minimum(gk + j, l_pad - 1)]
                    for j in range(G)]

        def fetch(leaves, buf, sem):
            # Each leaf's (16, NQ·128) weight block lands in its own column
            # slice, so the whole group is ONE (16, G·NQ·128) matrix and the
            # group's Möller–Trumbore runs as a single MXU dot (8 K=16 dots
            # pay the systolic fill 8 times; one wide dot pays it once).
            for j in range(G):
                pltpu.make_async_copy(
                    w_ref.at[pl.ds(leaves[j] * nrw, nrw), :],
                    buf.at[:, pl.ds(j * _NQ * TREELET, _NQ * TREELET)],
                    sem.at[j]).start()

        def fetch_par(leaves, parity):
            jax.lax.cond(parity == 0,
                         lambda: fetch(leaves, w_scratch0, sem0),
                         lambda: fetch(leaves, w_scratch1, sem1))

        def wait_all(buf, sem):
            for j in range(G):
                pltpu.make_async_copy(
                    w_ref.at[pl.ds(0, nrw), :],
                    buf.at[:, pl.ds(j * _NQ * TREELET, _NQ * TREELET)],
                    sem.at[j]).wait()

        def wait_par(parity):
            """One branch per group: wait every weight copy of this parity.
            The next group's DMAs (issued above) still overlap this group's
            matmuls; intra-group overlap is not worth a cond per leaf."""
            jax.lax.cond(parity == 0,
                         lambda: wait_all(w_scratch0, sem0),
                         lambda: wait_all(w_scratch1, sem1))

        # Software pipeline: group k+1's G weight DMAs are in flight while
        # group k's MXU matmuls and hit update run.  The group's leaf ids
        # ride in the loop state so each group is only decoded once.
        zero_i = jnp.zeros((), jnp.int32)
        leaves0 = read_group(zero_i)
        jax.lax.cond(count > 0, lambda: fetch_par(leaves0, zero_i),
                     lambda: None)

        col = jax.lax.broadcasted_iota(jnp.int32, (R, TREELET), 1)
        best0 = jnp.full((R, 1), -1, jnp.int32)  # packed leaf*TREELET+j
        epilogue = make_epilogue(area_ref, col)

        def cond(state):
            return state[0] < count

        def body(state):
            k, vis, t_best, best, *leaves = state
            # Decide continuation BEFORE prefetching: every DMA started here
            # is consumed next iteration (an un-awaited in-flight copy at
            # kernel exit aborts the TPU).  t_blk is therefore one group
            # stale — at most one extra group is swept.
            t_blk = jnp.minimum(jnp.max(t_best), 1.0)
            nk = k + G
            idx = jnp.minimum(nk, count - 1)
            leaves_n = read_group(idx)
            tlo_next = tlo_ref[0, 0, idx]
            if early_exit:
                cont = (nk < count) & (tlo_next <= t_blk)
            else:
                cont = nk < count
            parity = (k // G) % 2
            jax.lax.cond(cont, lambda: fetch_par(leaves_n, 1 - parity),
                         lambda: None)

            wait_par(parity)
            # Both parity buffers are read and lane-selected once per
            # group — two VMEM reads + a select beat a vector-valued cond.
            W = jnp.where(parity == 0, w_scratch0[:], w_scratch1[:])
            out_all = jnp.dot(F, W, preferred_element_type=jnp.float32,
                              precision=precision)  # (R, G·NQ·128)
            if ablate == "dot":
                # Consume the dot result without the epilogue (min with a
                # value >= 2 never changes t_best <= 1, but Mosaic cannot
                # fold it away).
                t_best = jnp.minimum(
                    t_best,
                    jnp.min(out_all, axis=1, keepdims=True) * jnp.float32(1e-30)
                    + 2.0)
                k = jnp.where(cont, nk, count)
                return (k, vis + G, t_best, best, *leaves_n)
            t_best, best = epilogue(out_all, leaves, t_best, best)

            # tlo is sorted ascending and t_blk only shrinks: the first
            # too-far group ends the block's sweep.
            k = jnp.where(cont, nk, count)
            return (k, vis + G, t_best, best, *leaves_n)

        k0 = jnp.zeros((), jnp.int32)
        res = jax.lax.while_loop(cond, body, (k0, k0, t_best, best0, *leaves0))
        vis, t_best, best = res[1], res[2], res[3]
        # Column 2 reports leaf visits actually swept (profiling metric).
        out_ref[:] = jnp.concatenate(
            [t_best, pltpu.bitcast(best, jnp.float32),
             jnp.full((R, 1), vis, jnp.float32).astype(jnp.float32),
             jnp.zeros((R, 1), jnp.float32)], axis=1
        )

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((R, _NF), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, 1, l_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM)
    cspec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM)
    ospec = pl.BlockSpec((R, 4), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def make_epilogue(area_ref, col):
        """Per-leaf MT validity + winner bookkeeping on the group's dot
        output (shared by the parity and ring kernels)."""

        def epilogue(out_all, leaves, t_best, best):
            for j in range(G):
                base_c = j * _NQ * TREELET
                det = out_all[:, base_c + 0 * TREELET:base_c + 1 * TREELET]
                u_num = out_all[:, base_c + 1 * TREELET:base_c + 2 * TREELET]
                v_num = out_all[:, base_c + 2 * TREELET:base_c + 3 * TREELET]
                t_num = out_all[:, base_c + 3 * TREELET:base_c + 4 * TREELET]
                area = area_ref[pl.ds(leaves[j], 1), :]  # (1,128)
                # Sign-folded MT: multiply the numerators by sign(det) so
                # every barycentric/depth test compares against |det| with
                # NO per-column divide (the old inv+ub+vb path).  The exact
                # winner attributes are recomputed in post(); the kernel
                # only needs a valid mask and a depth ordering.
                ad = jnp.abs(det)
                sm = jnp.where(det < 0.0, -1.0, 1.0)
                un = u_num * sm
                vn = v_num * sm
                tn = t_num * sm
                # prepare() clamps t seeds to <=1, so tn < t_best·ad already
                # implies t <= 1 — no separate tc<=1 test.  The four >=0
                # barycentric/depth tests fold into one min4 >= 0 (exact:
                # same-precision subs, min distributes over >=0) — 3 fewer
                # VPU ops per visit than six compares + five ands.
                min4 = jnp.minimum(jnp.minimum(un, vn),
                                   jnp.minimum(ad - (un + vn), tn))
                ok = ((min4 >= 0) & (tn < t_best * ad)
                      & (ad >= vm.EPSILON * area))
                tc = tn / jnp.where(ok, ad, 1.0)
                if ablate == "lite":
                    t_new = jnp.min(jnp.where(ok, tc, jnp.float32(3.0e38)),
                                    axis=1, keepdims=True)
                    t_best = jnp.minimum(t_best, t_new)
                    continue
                # One fused reduction: non-negative f32 bits are order-
                # preserving as int32, so pack (t bits, column) into one key
                # and min-reduce once — replaces the old t_min + j_min pair.
                # Clearing 7 mantissa bits costs 2^-17 relative depth
                # resolution on near-ties only (exact t is restored in post).
                kbits = pltpu.bitcast(tc, jnp.int32)
                key = jnp.where(ok, (kbits & ~(TREELET - 1)) | col,
                                jnp.int32(0x7FFFFFFF))
                kmin = jnp.min(key, axis=1, keepdims=True)  # (R,1)
                hit_j = kmin < jnp.int32(0x7FFFFFFF)
                best = jnp.where(
                    hit_j, leaves[j] * TREELET + (kmin & (TREELET - 1)), best)
                t_new = pltpu.bitcast(kmin & ~(TREELET - 1), jnp.float32)
                t_best = jnp.where(hit_j, t_new, t_best)
            return t_best, best

        return epilogue

    NB = pipeline_depth
    GW = G * _NQ * TREELET

    def ring_kernel(count_ref, list_ref, tlo_ref, F_ref, w_ref, area_ref,
                    out_ref, wr, sems):
        """NB-deep DMA ring: ~G·(NB−1) weight copies stay in flight, hiding
        per-DMA latency the 2-buffer parity pipeline exposes, and the
        current group's weights are read with ONE dynamic VMEM slice
        instead of reading both parity buffers + select.  Issuance ignores
        the early-exit test (at most NB−1 wasted group fetches per block);
        compute still exits at the first too-far group, and every issued
        DMA is awaited before kernel exit."""
        F = F_ref[:]
        t_best = F[:, 10:11]
        count = count_ref[0, 0, 0]
        nrw = _NF

        def read_group(gk):
            return [list_ref[0, 0, jnp.minimum(gk + j, l_pad - 1)]
                    for j in range(G)]

        def fetch(leaves, bi):
            for j in range(G):
                pltpu.make_async_copy(
                    w_ref.at[pl.ds(leaves[j] * nrw, nrw), :],
                    wr.at[bi, :, pl.ds(j * _NQ * TREELET, _NQ * TREELET)],
                    sems.at[bi, j]).start()

        def wait_buf(bi):
            for j in range(G):
                pltpu.make_async_copy(
                    w_ref.at[pl.ds(0, nrw), :],
                    wr.at[bi, :, pl.ds(j * _NQ * TREELET, _NQ * TREELET)],
                    sems.at[bi, j]).wait()

        # Invariant: before the iteration at slot k, every group slot
        # < k + (NB-1)·G that is < count has been issued to buffer
        # (slot//G) % NB.
        for b in range(NB - 1):
            gk = jnp.int32(b * G)
            lv = read_group(gk)
            jax.lax.cond(gk < count,
                         lambda lv=lv, b=b: fetch(lv, jnp.int32(b % NB)),
                         lambda: None)

        col = jax.lax.broadcasted_iota(jnp.int32, (R, TREELET), 1)
        best0 = jnp.full((R, 1), -1, jnp.int32)
        epilogue = make_epilogue(area_ref, col)

        def cond(state):
            k, stop = state[0], state[1]
            return (k < count) & ~stop

        def body(state):
            k, stop, vis, t_best, best = state
            g = k // G
            gi = k + (NB - 1) * G
            lvn = read_group(jnp.minimum(gi, count - 1))
            jax.lax.cond(gi < count,
                         lambda: fetch(lvn, (g + NB - 1) % NB),
                         lambda: None)

            wait_buf(g % NB)
            W = wr[pl.ds(g % NB, 1)].reshape(_NF, GW)
            out_all = jnp.dot(F, W, preferred_element_type=jnp.float32,
                              precision=precision)
            if ablate == "dot":
                # Same consume-without-epilogue branch as the parity kernel
                # (dot-only roofline ablation must work at any ring depth).
                t_best = jnp.minimum(
                    t_best,
                    jnp.min(out_all, axis=1, keepdims=True) * jnp.float32(1e-30)
                    + 2.0)
            else:
                leaves = read_group(k)
                t_best, best = epilogue(out_all, leaves, t_best, best)

            t_blk = jnp.minimum(jnp.max(t_best), 1.0)
            nk = k + G
            idx = jnp.minimum(nk, count - 1)
            tlo_next = tlo_ref[0, 0, idx]
            if early_exit:
                stop = (nk < count) & (tlo_next > t_blk)
            else:
                stop = jnp.zeros((), bool)
            return (nk, stop, vis + G, t_best, best)

        k0 = jnp.zeros((), jnp.int32)
        res = jax.lax.while_loop(
            cond, body, (k0, jnp.zeros((), bool), k0, t_best, best0))
        k_exit, vis, t_best, best = res[0], res[2], res[3], res[4]
        # Drain in-flight groups the early exit left behind.
        for b in range(NB - 1):
            gslot = k_exit + b * G
            jax.lax.cond(gslot < count,
                         lambda b=b: wait_buf(((k_exit // G) + b) % NB),
                         lambda: None)
        out_ref[:] = jnp.concatenate(
            [t_best, pltpu.bitcast(best, jnp.float32),
             jnp.full((R, 1), vis, jnp.float32).astype(jnp.float32),
             jnp.zeros((R, 1), jnp.float32)], axis=1
        )

    w_rows = T["w_mxu"]
    area = T["area"]
    # Triangle lookup for the post-pass: leaf ordinal → first tri slot.
    leaf_first = T["leaf_first"]

    def cull_kernel(rays_ref, bmnx_ref, bmny_ref, bmnz_ref,
                    bmxx_ref, bmxy_ref, bmxz_ref, key_ref):
        """Per-block per-ray exact slab lattice, entirely in VMEM.

        The XLA formulation of the S == R cull materializes [N, L, 3]
        intermediates through HBM; here each block's (R, 128-leaf-chunk)
        lattice lives in registers/VMEM and only the [1, L] min-reduced
        entry-t key row is written out (~5.2 → ~1.1 ms per 131k-lane
        wavefront, measured with the fori harness).  The kernel reads the
        sweep's F feature matrix — introducing a separate ray input would
        force XLA to materialize the sorted-ray gathers it otherwise
        re-fuses into every consumer (+2 ms/gather at this size)."""
        for b in range(CULL_BATCH):  # Mosaic wants ≥8 sublanes per out block
            rays = rays_ref[b * R:(b + 1) * R, :]  # (R,16) F rows
            ox, oy, oz = rays[:, 6:7], rays[:, 7:8], rays[:, 8:9]
            dx, dy, dz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
            t0 = rays[:, 10:11]

            def rcp(d):
                return 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                                       jnp.where(d >= 0, 1e-30, -1e-30), d)

            rx, ry, rz = rcp(dx), rcp(dy), rcp(dz)
            tb1 = jnp.minimum(t0, 1.0)
            valid = t0 > 0.0
            for c in range(l_rows):
                bmnx = bmnx_ref[c:c + 1, :]  # (1, 128)
                bmxx = bmxx_ref[c:c + 1, :]
                tax = (bmnx - ox) * rx  # (R, 128)
                tbx = (bmxx - ox) * rx
                lox = jnp.minimum(tax, tbx)
                hix = jnp.maximum(tax, tbx)
                bmny = bmny_ref[c:c + 1, :]
                bmxy = bmxy_ref[c:c + 1, :]
                tay = (bmny - oy) * ry
                tby = (bmxy - oy) * ry
                loy = jnp.minimum(tay, tby)
                hiy = jnp.maximum(tay, tby)
                bmnz = bmnz_ref[c:c + 1, :]
                bmxz = bmxz_ref[c:c + 1, :]
                taz = (bmnz - oz) * rz
                tbz = (bmxz - oz) * rz
                loz = jnp.minimum(taz, tbz)
                hiz = jnp.maximum(taz, tbz)
                t_lo = jnp.maximum(jnp.maximum(lox, loy), loz)
                t_hi = jnp.minimum(jnp.minimum(hix, hiy), hiz)
                ov = ((t_lo <= t_hi) & (t_hi >= 0.0) & (t_lo <= tb1) & valid)
                keyc = jnp.min(
                    jnp.where(ov, jnp.maximum(t_lo, 0.0),
                              jnp.float32(3.0e38)),
                    axis=0, keepdims=True)  # (1, 128)
                key_ref[b, c * LANE:(c + 1) * LANE] = keyc[0]

    def pallas_cull(F):
        """F [n_pad,16] sweep features → per-block entry-t keys
        [B, n_leaves].  ``n_pad`` must be a multiple of CULL_BATCH·R
        (prepare pads so)."""
        n_pad = F.shape[0]
        n_blocks = n_pad // R
        key = pl.pallas_call(
            cull_kernel,
            grid=(n_blocks // CULL_BATCH,),
            in_specs=[pl.BlockSpec((CULL_BATCH * R, _NF), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec((CULL_BATCH, l_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks, l_pad), jnp.float32),
            interpret=interpret,
        )(F, *cull_bounds)
        return key[:, :n_leaves]

    def prepare(start, seg, t_init=None):
        """Pad to block granularity, run the cull, build ray features."""
        n = start.shape[0]
        # The Pallas cull processes CULL_BATCH blocks per grid step; extra
        # padding blocks are all-dead (t0=0) and sweep in ~0.6 µs each.
        gran = CULL_BATCH * R if S == R else R
        n_pad = pl.cdiv(n, gran) * gran
        n_blocks = n_pad // R

        t0 = (jnp.full((n,), INVALID_PARAM, jnp.float32)
              if t_init is None else t_init)
        # Valid segment hits satisfy t<=1, so clamping seeds to 1 loses
        # nothing and lets the sweep kernel drop its tc<=1 test.
        t0 = jnp.minimum(t0, 1.0)
        start_p = jnp.pad(start, ((0, n_pad - n), (0, 0)))
        seg_p = jnp.pad(seg, ((0, n_pad - n), (0, 0)))
        t0_p = jnp.pad(t0, (0, n_pad - n))  # padding: t0=0 → dead

        c = jnp.cross(start_p, seg_p)
        ones = jnp.ones((n_pad, 1), jnp.float32)
        zeros = jnp.zeros((n_pad, _NF - 11), jnp.float32)
        F = jnp.concatenate([seg_p, c, start_p, ones, t0_p[:, None], zeros],
                            axis=1)

        if S == R:
            order, tlo_sorted, counts = _order_from_key(pallas_cull(F))
        else:
            order, tlo_sorted, counts = cull(
                start_p.reshape(n_blocks, R, 3),
                seg_p.reshape(n_blocks, R, 3),
                t0_p.reshape(n_blocks, R))
        return counts, order, tlo_sorted, F

    def sweep(counts, order, tlo_sorted, F):
        """Run the Pallas sweep kernel.  out[:,2] = leaf visits/block."""
        n_pad = F.shape[0]
        n_blocks = n_pad // R
        if NB > 2:
            scratch = [
                pltpu.VMEM((NB, _NF, G * _NQ * TREELET), jnp.float32),
                pltpu.SemaphoreType.DMA((NB, G)),
            ]
            kern = ring_kernel
        else:
            scratch = [
                pltpu.VMEM((_NF, G * _NQ * TREELET), jnp.float32),
                pltpu.VMEM((_NF, G * _NQ * TREELET), jnp.float32),
                pltpu.SemaphoreType.DMA((G,)),
                pltpu.SemaphoreType.DMA((G,)),
            ]
            kern = kernel
        return pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[cspec, lspec, lspec, fspec,
                      pl.BlockSpec(memory_space=pl.ANY), full],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(counts[:, None], order[:, None], tlo_sorted[:, None], F,
          w_rows, area)

    def raw(start, seg, t_init=None):
        """Sweep only → ``(t_kern, best)`` with best = packed leaf·128+slot.

        ``t_kern`` carries the (matmul-precision) winning t; ``best`` < 0 on
        miss.  Use :func:`post` to recover exact t/u/v and the original
        triangle id — callers that reorder rays (make_mesh_intersector's
        Morton sort) unsort these two scalars instead of a full Hit."""
        n = start.shape[0]
        counts, order, tlo_sorted, F = prepare(start, seg, t_init)
        out = sweep(counts, order, tlo_sorted, F)
        t_kern = out[:n, 0]
        best = jax.lax.bitcast_convert_type(out[:n, 1], jnp.int32)
        # The kernel seeds were clamped to 1 (prepare); report the caller's
        # own t on miss lanes so misses keep t_init/INVALID_PARAM exactly.
        t0 = (jnp.full((n,), INVALID_PARAM, jnp.float32)
              if t_init is None else t_init)
        t_kern = jnp.where(best >= 0, t_kern, t0)
        return t_kern, best

    def post(start, seg, t_kern, best):
        """Exact-recompute post-pass (XLA): the sweep only tracks (t,
        packed best index) — recompute u, v, t and the original triangle id
        for the single winning triangle per ray (one gather + MT)."""
        hit = best >= 0
        leaf = jnp.maximum(best, 0) // TREELET
        slot = leaf_first[leaf] + jnp.maximum(best, 0) % TREELET
        v0g = T["tri_v0"][slot]
        e1g = T["tri_e1"][slot]
        e2g = T["tri_e2"][slot]
        pvec = jnp.cross(seg, e2g)
        det = jnp.sum(e1g * pvec, axis=-1)
        inv = 1.0 / jnp.where(jnp.abs(det) > 0, det, 1.0)
        tvec = start - v0g
        u = jnp.sum(tvec * pvec, axis=-1) * inv
        qvec = jnp.cross(tvec, e1g)
        v = jnp.sum(seg * qvec, axis=-1) * inv
        t_re = jnp.sum(e2g * qvec, axis=-1) * inv
        t = jnp.where(hit, t_re, t_kern)
        tid = jnp.where(hit, T["tri_id"][slot], -1)
        return t, tid, jnp.where(hit, u, 0.0), jnp.where(hit, v, 0.0)

    def traverse(start, seg, t_init=None):
        t_kern, best = raw(start, seg, t_init)
        return post(start, seg, t_kern, best)

    traverse.prepare = prepare  # stage hooks for profiling (profile_mesh.py)
    traverse.sweep = sweep
    traverse.raw = raw
    traverse.post = post
    return traverse
