"""Tensorized BVH: host-side build → flat arrays → stackless traversal.

The TPU re-design of the reference's pointer-based octrees (reference
bvh.h:50-231, scene.cpp:13-140, mesh.cpp:20-152): instead of 8-child nodes
traversed by recursive neighbor-walking, the tree is a *binary* BVH flattened
to pre-order arrays with **miss links** (escape indices), so traversal is an
iterative loop with no stack at all:

    at node i:  AABB hit?  internal → i+1 (first child is next in pre-order)
                           leaf     → intersect its triangle range, then miss[i]
                AABB miss? → miss[i]

That shape maps to accelerators: per-lane state is one int32, and the loop
is a ``lax.while_loop`` over gathers (XLA path here) or scalar VMEM reads
(Pallas kernel in ops/pallas_bvh.py).  The same ``t``-pruning as the
reference (node entry param > best hit param → skip, scene.cpp:79-81) is
applied.

The builder (median-split on the longest centroid axis, SAH-ready interface)
runs host-side in NumPy; ops/native can replace it with the C++ builder for
large meshes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.scene.geometry import INVALID_PARAM
from fspt_tpu.utils import vecmath as vm

MAX_LEAF_TRIS = 4


class FlatBVH(NamedTuple):
    """Pre-order flattened BVH with miss links (device tensors)."""

    bmin: jnp.ndarray  # [M,3]
    bmax: jnp.ndarray  # [M,3]
    first: jnp.ndarray  # [M] int32 — leaf: first tri slot; internal: unused
    count: jnp.ndarray  # [M] int32 — 0 for internal nodes
    miss: jnp.ndarray  # [M] int32 — next node on miss/after leaf; M = done
    # Reordered triangle data (leaf ranges are contiguous).
    tri_v0: jnp.ndarray  # [T,3]
    tri_e1: jnp.ndarray
    tri_e2: jnp.ndarray
    tri_area2: jnp.ndarray  # [T]
    tri_id: jnp.ndarray  # [T] int32 — original triangle index

    @property
    def n_nodes(self):
        return self.bmin.shape[0]


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
              max_leaf: int = MAX_LEAF_TRIS) -> FlatBVH:
    """Median-split builder over triangle centroids (host, NumPy)."""
    try:
        from fspt_tpu.utils import native

        flat = native.build_bvh(v0, v1, v2, max_leaf)
    except Exception:
        flat = None
    if flat is None:
        flat = _build_bvh_numpy(v0, v1, v2, max_leaf)
    order, bmin, bmax, first, count, miss = flat
    v0o, v1o, v2o = v0[order], v1[order], v2[order]
    e1, e2 = v1o - v0o, v2o - v0o
    area2 = np.linalg.norm(np.cross(e1, e2), axis=-1)
    return FlatBVH(
        bmin=jnp.asarray(bmin, jnp.float32),
        bmax=jnp.asarray(bmax, jnp.float32),
        first=jnp.asarray(first, jnp.int32),
        count=jnp.asarray(count, jnp.int32),
        miss=jnp.asarray(miss, jnp.int32),
        tri_v0=jnp.asarray(v0o, jnp.float32),
        tri_e1=jnp.asarray(e1, jnp.float32),
        tri_e2=jnp.asarray(e2, jnp.float32),
        tri_area2=jnp.asarray(area2, jnp.float32),
        tri_id=jnp.asarray(order, jnp.int32),
    )


def _build_bvh_numpy(v0, v1, v2, max_leaf):
    tmin = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    tmax = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    centroid = ((tmin + tmax) * 0.5).astype(np.float32)
    return _build_bvh_preorder(tmin, tmax, centroid, max_leaf)


def _build_bvh_preorder(tmin, tmax, centroid, max_leaf):
    """Recursive pre-order emission (explicit stack, correct miss links)."""
    n = len(tmin)
    order: list[int] = []
    bmin_l: list = []
    bmax_l: list = []
    first_l: list = []
    count_l: list = []
    miss_l: list = []

    # Work items: (indices, miss_target_placeholder_list)
    # Pre-order emission with miss links resolved via patch-up: we can't
    # know the right sibling's final index before emitting the left subtree,
    # so record patches.
    DONE = -1  # sentinel meaning "exit traversal"; replaced by n_nodes later

    def emit(idx, miss_target):
        slot = len(bmin_l)
        bmin_l.append(tmin[idx].min(axis=0))
        bmax_l.append(tmax[idx].max(axis=0))
        first_l.append(0)
        count_l.append(0)
        miss_l.append(miss_target)
        if len(idx) <= max_leaf:
            first_l[slot] = len(order)
            count_l[slot] = len(idx)
            order.extend(idx.tolist())
            return slot
        axis = int(np.argmax(bmax_l[slot] - bmin_l[slot]))
        srt = np.argsort(centroid[idx, axis], kind="stable")
        half = len(idx) // 2
        left_idx = idx[srt[:half]]
        right_idx = idx[srt[half:]]
        # Emit left subtree; its miss target is the (future) right-subtree
        # root, unknown until the left subtree is emitted — use None and
        # patch after.
        left_root = emit(left_idx, miss_target=None)
        # Patch the left subtree's "None" misses → right subtree root.
        right_root = len(bmin_l)
        for i in range(left_root, right_root):
            if miss_l[i] is None:
                miss_l[i] = right_root
        emit(right_idx, miss_target=miss_target)
        return slot

    # Recursion depth can hit ~log2(n/max_leaf) * branching — python
    # recursion is fine up to ~10k depth for balanced median splits.
    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(10000, old_limit))
    try:
        emit(np.arange(n), miss_target=DONE)
    finally:
        sys.setrecursionlimit(old_limit)

    n_nodes = len(bmin_l)
    miss = np.array([n_nodes if m in (DONE, None) else m for m in miss_l], np.int64)
    return (
        np.asarray(order, np.int64),
        np.stack(bmin_l),
        np.stack(bmax_l),
        np.asarray(first_l, np.int64),
        np.asarray(count_l, np.int64),
        miss,
    )


# ---------------------------------------------------------------------------
# XLA traversal


def _slab_entry(bmin, bmax, start, seg):
    """Segment/AABB entry param; entry=0 when the origin is inside.

    Matches the reference's semantics for pruning (intersect.cpp:490-654):
    origin inside → param 0 (scene.cpp:79 compares entry vs best).
    """
    inv = 1.0 / jnp.where(jnp.abs(seg) < 1e-30, jnp.where(seg >= 0, 1e-30, -1e-30), seg)
    t0 = (bmin - start) * inv
    t1 = (bmax - start) * inv
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tnear <= tfar) & (tfar >= 0.0) & (tnear <= 1.0)
    entry = jnp.maximum(tnear, 0.0)
    return hit, entry


def traverse_bvh(bvh: FlatBVH, start, seg, t_init=None):
    """Closest triangle hit for every lane.

    Returns ``(t [N], tri_id [N], u [N], v [N])`` with tri_id −1 on miss.
    """
    n = start.shape[0]
    m = bvh.n_nodes
    t_best0 = jnp.full((n,), INVALID_PARAM if t_init is None else t_init, jnp.float32)

    def cond(state):
        return jnp.any(state[0] < m)

    def body(state):
        node, t_best, best_tri, best_u, best_v = state
        nidx = jnp.minimum(node, m - 1)
        active = node < m
        bmin = bvh.bmin[nidx]
        bmax = bvh.bmax[nidx]
        box_hit, entry = _slab_entry(bmin, bmax, start, seg)
        box_hit = box_hit & (entry <= t_best) & active

        count = bvh.count[nidx]
        first = bvh.first[nidx]
        is_leaf = count > 0

        # Leaf: test up to MAX_LEAF_TRIS triangles (Möller–Trumbore).
        leaf_work = box_hit & is_leaf
        for k in range(MAX_LEAF_TRIS):
            tid = jnp.clip(first + k, 0, bvh.tri_v0.shape[0] - 1)
            valid_k = leaf_work & (k < count)
            v0 = bvh.tri_v0[tid]
            e1 = bvh.tri_e1[tid]
            e2 = bvh.tri_e2[tid]
            pvec = jnp.cross(seg, e2)
            det = jnp.sum(e1 * pvec, axis=-1)
            np_ = jnp.abs(det) >= vm.EPSILON * bvh.tri_area2[tid]
            inv = 1.0 / jnp.where(np_, det, 1.0)
            tvec = start - v0
            u = jnp.sum(tvec * pvec, axis=-1) * inv
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(seg * qvec, axis=-1) * inv
            t = jnp.sum(e2 * qvec, axis=-1) * inv
            ok = (valid_k & np_ & (u >= 0) & (v >= 0) & (u + v <= 1)
                  & (t >= 0) & (t <= 1) & (t < t_best))
            t_best = jnp.where(ok, t, t_best)
            best_tri = jnp.where(ok, bvh.tri_id[tid], best_tri)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, nidx + 1, bvh.miss[nidx])
        node = jnp.where(active, nxt, node)
        return node, t_best, best_tri, best_u, best_v

    node0 = jnp.zeros((n,), jnp.int32)
    tri0 = jnp.full((n,), -1, jnp.int32)
    u0 = jnp.zeros((n,), jnp.float32)
    state = (node0, t_best0, tri0, u0, u0)
    _, t_best, best_tri, best_u, best_v = jax.lax.while_loop(cond, body, state)
    return t_best, best_tri, best_u, best_v
