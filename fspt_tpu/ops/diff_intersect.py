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
