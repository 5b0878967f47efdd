"""Queued wavefront integrator: ray regeneration for full-occupancy bounces.

The unrolled bounce loop (render/integrator.py) intersects the FULL
``rows·W·spp`` wavefront at every depth, but after the primary bounce only
5-20% of lanes are alive (measured on the 100k-triangle bench scene) — the
sort/cull/sweep/gather stages all pay full-wavefront cost for a sliver of
live work.  This module re-schedules the same computation as a fixed-size
ray QUEUE with regeneration (the TPU reshape of persistent-threads wavefront
path tracing, Laine et al. 2013): each ``lax.while_loop`` iteration refills
dead queue slots with fresh primary rays, traces ONE segment for every live
lane, and scatters finished lanes' radiance to their output slot.  Lane
occupancy stays ~100% until the tail, so total stage work scales with
*segments actually traced* instead of ``depth × wavefront``.

Equivalence with the unrolled loop is deterministic, not statistical: a
lane's RNG streams are keyed by (seed, pixel, sample, depth) — none of
which depend on the schedule — and each output slot is owned by exactly one
lane lineage whose radiance accumulates in the same per-lane order.  The
queued render therefore matches ``render_wavefront`` to float-ulp level
(XLA fuses multiply-adds differently across the two graph shapes, so
bit-exactness across compilations is not guaranteed; tests/test_queue.py
pins ~1e-5 tolerances and exact integer outputs).

Reference analog: the recursion TraceStep (engine.cpp:59-159) — this is the
same traversal re-scheduled; all semantic quirks (deferred fog, depth-0
AOVs/light-clamp, fast-render white) ride per-lane ``depth`` masks instead
of loop-iteration specialization.

``cfg.edge_eps > 0`` (silhouette-gradient edge reparameterization) rides
per-lane masks like every other semantic quirk; with ``record_hits`` the
queue also scatters each traced segment's winner id into a ``[N, D]``
record, which is what the two-phase differentiable mesh path replays
(parallel/train.make_bvh_vertex_recovery_step): the fast sweep runs ONCE
here under stop_gradient, and AD only ever sees the cheap per-winner
Möller–Trumbore replay.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fspt_tpu import materials as mat_mod
from fspt_tpu.camera import Camera, rays_for_lanes
from fspt_tpu.config import RenderConfig
from fspt_tpu.ops import rng
from fspt_tpu.render.integrator import TraceOutput
from fspt_tpu.scene.builder import ScenePack
from fspt_tpu.utils import vecmath as vm

DEFAULT_QUEUE = 1 << 18


def render_queued(scene: ScenePack, camera: Camera, cfg: RenderConfig,
                  seed, sample0, y0=0, rows=None, *, intersector,
                  queue: int = DEFAULT_QUEUE, aovs: bool = True,
                  record_hits: bool = False, cam_sample0=None,
                  first_hits=None, warm=None):
    """Render a band through a regenerating ray queue.

    Drop-in for ``render_wavefront`` — deterministically equivalent
    (float agreement to ~ulp level, exact integer outputs; see the module
    docstring and tests/test_queue.py) for forward rendering with a
    liveness-aware ``intersector``.  ``queue`` is the
    number of in-flight lanes per iteration; the band is streamed through
    it.  ``aovs=False`` skips the AOV scatter buffers (zeros returned) for
    radiance-only consumers such as loss evaluation.

    With ``record_hits=True`` the intersector must produce ``Hit.prim_id``
    and the return value becomes ``(TraceOutput, (ids[N,D], hit[N,D]))``
    where row ``(lane, d)`` holds the winner id / hit flag of that lane's
    depth-``d`` segment (-1 / False for untraced depths) and
    ``D = cfg.effective_depth``.

    ``cam_sample0`` decouples the CAMERA sample counter (AA jitter + DoF
    lens uniforms) from the bounce counter ``sample0``: progressive frames
    that freeze ``cam_sample0`` re-trace identical primary rays while
    bounce RNG still advances — the estimator behind the first-hit cache
    (reference ImagePlaneCache, engine.h:46-65).  Defaults to ``sample0``.

    ``first_hits`` is an optional cached depth-0 ``Hit`` for every lane of
    the band (from :func:`compute_first_hits`, same ``cam_sample0``):
    depth-0 segments gather their collision from it instead of running the
    intersector (their lanes enter the sweep dead, so the BVH does zero
    tree work for them — engine.cpp:77-85's cache fetch).  Exact: cached
    and uncached renders of the same frozen-jitter estimator are equal
    (tests/test_queue.py).

    ``warm`` (from :func:`warm_frame`) goes one step further: depth-0 is
    resolved entirely OUTSIDE the queue.  Misses/light hits land in
    pre-filled output buffers, and only possibly-alive lanes enqueue —
    directly at depth 1 with their post-primary state — so the iteration
    count drops by the primary share instead of depth-0 lanes occupying
    queue slots.  Mutually exclusive with ``first_hits``/``record_hits``;
    needs ``cfg.effective_depth >= 2``, ``edge_eps == 0`` and no
    fast_render.  Returned ``segments`` includes the ``n`` cached depth-0
    segments (the reference counts cache-served TraceSteps too,
    engine.cpp:72/77-85).
    """
    if rows is None:
        rows = cfg.height
    if cam_sample0 is None:
        cam_sample0 = sample0
    if warm is not None:
        assert first_hits is None and not record_hits
        assert cfg.effective_depth >= 2 and cfg.edge_eps == 0.0
        assert not cfg.fast_render
    n = rows * cfg.width * cfg.spp
    q = min(queue, n)
    geom = scene.geometry
    table = scene.materials
    tex = scene.textures
    z_far = camera.z_far
    eff_depth = cfg.effective_depth
    f32 = jnp.float32

    use_alive = getattr(intersector, "accepts_alive", False)

    def intersect(o, d, alive):
        if use_alive:
            return intersector(o, d, alive)
        return intersector(o, d)

    if first_hits is not None:
        # Pack the cached Hit into one [n, 14] f32 table (ints bitcast,
        # bools as 0/1) so each queue iteration fetches cached collisions
        # with a SINGLE row gather.
        bcf = lambda a: jax.lax.bitcast_convert_type(
            jnp.asarray(a, jnp.int32), jnp.float32)
        fh_tab = jnp.concatenate([
            first_hits.t[:, None], first_hits.point, first_hits.normal,
            first_hits.texcoords, bcf(first_hits.mat)[:, None],
            bcf(first_hits.prim_kind)[:, None],
            first_hits.hit.astype(jnp.float32)[:, None],
            bcf(first_hits.prim_id if first_hits.prim_id is not None
                else jnp.zeros((n,), jnp.int32))[:, None],
            (first_hits.edge_dist if first_hits.edge_dist is not None
             else jnp.zeros((n,), jnp.float32))[:, None],
        ], axis=1)

    def refill(st):
        """Assign fresh primary rays to dead slots, in lane-id order."""
        dead = ~st["alive"]
        rank = jnp.cumsum(dead.astype(jnp.int32))
        new_id = st["cursor"] + rank - 1
        has = dead & (new_id < n)
        lane_id = jnp.where(has, new_id, jnp.where(dead, -1, st["lane_id"]))
        o_new, d_new, _, _ = rays_for_lanes(
            camera, cfg.width, cfg.height, cfg.spp, seed, cam_sample0,
            jnp.maximum(lane_id, 0), y0=y0)
        h3 = has[:, None]
        st = dict(st)
        st["o"] = jnp.where(h3, o_new, st["o"])
        st["d"] = jnp.where(h3, d_new, st["d"])
        st["lane_id"] = lane_id
        st["depth"] = jnp.where(has, 0, st["depth"])
        st["radiance"] = jnp.where(h3, 0.0, st["radiance"])
        st["throughput"] = jnp.where(h3, 1.0, st["throughput"])
        st["alive"] = st["alive"] | has
        st["plh"] = jnp.where(has, False, st["plh"])
        st["fog_active"] = jnp.where(has, False, st["fog_active"])
        st["cursor"] = st["cursor"] + jnp.sum(has.astype(jnp.int32))
        return st

    def refill_warm(st):
        """Assign post-primary (depth-1) lanes to dead slots: lane ids
        come from the pose-frozen enqueue permutation, their state from
        the per-frame warm table (one packed row gather).  Lanes whose
        depth-0 shade says will_indirect=False arrive dead — their bias
        radiance is already in the pre-filled output buffer — and free
        the slot on the next iteration."""
        dead = ~st["alive"]
        rank = jnp.cumsum(dead.astype(jnp.int32))
        new_idx = st["cursor"] + rank - 1
        has = dead & (new_idx < warm["n_live"])
        src = warm["ids"][jnp.where(has, new_idx, 0)]
        row = warm["state"][jnp.where(has, src, 0)]  # [q, 22]
        lane_id = jnp.where(has, src, jnp.where(dead, -1, st["lane_id"]))
        h3 = has[:, None]
        st = dict(st)
        st["o"] = jnp.where(h3, row[:, 0:3], st["o"])
        st["d"] = jnp.where(h3, row[:, 3:6], st["d"])
        st["radiance"] = jnp.where(h3, row[:, 6:9], st["radiance"])
        st["throughput"] = jnp.where(h3, row[:, 9:12], st["throughput"])
        st["lane_id"] = lane_id
        st["depth"] = jnp.where(has, 1, st["depth"])
        st["alive"] = st["alive"] | (has & (row[:, 21] > 0.5))
        st["plh"] = jnp.where(has, False, st["plh"])
        st["fog_active"] = jnp.where(has, row[:, 12] > 0.5,
                                     st["fog_active"])
        st["fog_from"] = jnp.where(h3, row[:, 13:16], st["fog_from"])
        st["fog_diffuse"] = jnp.where(h3, row[:, 16:19],
                                      st["fog_diffuse"])
        st["fog_density"] = jnp.where(has, row[:, 19], st["fog_density"])
        st["fog_u"] = jnp.where(has, row[:, 20], st["fog_u"])
        st["cursor"] = st["cursor"] + jnp.sum(has.astype(jnp.int32))
        return st

    def scatter_mask(buf, mask, idx, val, pad=None):
        """Predicated scatter-set: rows where ``mask`` write, others drop.

        Masked-off rows all target the pad slot ``n``, so indices are NOT
        strictly unique — but every row that lands in [0, n) is (each output
        lane is owned by one lineage).  unique_indices=True is safe for
        "last writer wins on the pad row, don't care which" and lets XLA
        emit a parallel scatter instead of a serialized one (5.2 ms/iter →
        sub-ms on the 1M-row radiance buffer, profiled).

        Contract risk (documented, accepted): JAX specifies non-unique
        indices under unique_indices=True as undefined behavior; we rely
        on XLA confining the race to pad row ``n``, which is sliced off
        before return.  If a future backend miscompiles this,
        test_queue.py's equality tests catch it; the defined-semantics
        fallback is scattering where(mask, idx, n + lane_iota) into an
        n+q-row buffer."""
        p = n if pad is None else pad  # last row is the pad slot
        tgt = jnp.where(mask & (idx >= 0), idx, p)
        return buf.at[tgt].set(val, mode="drop", unique_indices=True)

    def scatter_unique(buf, mask, idx, val, pad_base):
        """Strictly-unique scatter-set (the defined-semantics form): row i
        of a masked-off lane targets pad row ``pad_base + i``, so indices
        are unique even across dropped rows — no reliance on XLA confining
        a pad-row race.  Costs ``q`` extra pad rows; used for the
        gradient-critical winner-id record buffers."""
        tgt = jnp.where(mask & (idx >= 0), idx,
                        pad_base + jnp.arange(idx.shape[0], dtype=jnp.int32))
        return buf.at[tgt].set(val, mode="drop", unique_indices=True)

    def body(st):
        st = refill(st) if warm is None else refill_warm(st)
        o, d, alive = st["o"], st["d"], st["alive"]
        depth = st["depth"]
        radiance, throughput = st["radiance"], st["throughput"]
        segments = st["segments"] + jnp.sum(alive.astype(jnp.int32))

        if first_hits is not None:
            # Depth-0 lanes fetch their collision from the cache; they
            # enter the intersector dead (t_init=0 → the sweep culls them
            # to zero leaf visits) and their Hit fields are overwritten
            # from ONE packed-row gather (seven per-field [q]-row gathers
            # from the [n]-lane tables each materialize at 2-3 ms/iter —
            # the r3 wide-gather lesson; packing makes it one row fetch).
            cached0 = alive & (depth == 0)
            hit = intersect(o, d, alive & ~cached0)
            safe = jnp.maximum(st["lane_id"], 0)
            c3 = cached0[:, None]
            row = fh_tab[safe]  # [q, C]
            bc = lambda col: jax.lax.bitcast_convert_type(col, jnp.int32)
            hit = hit._replace(
                t=jnp.where(cached0, row[:, 0], hit.t),
                point=jnp.where(c3, row[:, 1:4], hit.point),
                normal=jnp.where(c3, row[:, 4:7], hit.normal),
                texcoords=jnp.where(c3, row[:, 7:9], hit.texcoords),
                mat=jnp.where(cached0, bc(row[:, 9]), hit.mat),
                prim_kind=jnp.where(cached0, bc(row[:, 10]),
                                    hit.prim_kind),
                hit=jnp.where(cached0, row[:, 11] > 0.5, hit.hit),
                prim_id=None if hit.prim_id is None else jnp.where(
                    cached0, bc(row[:, 12]), hit.prim_id),
                edge_dist=None if hit.edge_dist is None else jnp.where(
                    cached0, row[:, 13], hit.edge_dist),
            )
        else:
            hit = intersect(o, d, alive)

        if record_hits:
            # Winner-id record for the two-phase differentiable replay:
            # row (lane, depth) of the [N·D] buffers.
            ridx = st["lane_id"] * eff_depth + depth
            st["rec_ids"] = scatter_unique(st["rec_ids"], alive, ridx,
                                           hit.prim_id, n * eff_depth)
            st["rec_hit"] = scatter_unique(st["rec_hit"], alive, ridx,
                                           hit.hit, n * eff_depth)

        pix = (st["lane_id"] // (cfg.width * cfg.spp) + y0) * cfg.width + (
            st["lane_id"] // cfg.spp) % cfg.width
        smp = st["lane_id"] % cfg.spp + jnp.asarray(sample0, jnp.int32)

        side = vm.dot(hit.normal, o - hit.point)
        internal = side < 0.0
        normal = jnp.where(internal[:, None], -hit.normal, hit.normal)

        # Deferred depth-0 fog (integrator.py:134-147) — resolves on the
        # lane's NEXT segment, i.e. whenever fog_active rides in.
        light_pos = jnp.where(hit.hit[:, None], hit.point, o + d)
        dist = vm.length(light_pos - st["fog_from"])
        thresh = jnp.clip(dist * dist * st["fog_density"] * 0.00005, 0.0, 1.0)
        absorbed = st["fog_active"] & (st["fog_u"] < thresh) & (depth >= 1)
        radiance = radiance + jnp.where(
            (absorbed & alive)[:, None], throughput * st["fog_diffuse"], 0.0)
        alive = alive & ~absorbed
        fog_active = st["fog_active"] & (depth < 1)

        miss = alive & ~hit.hit
        view_dir = vm.normalize(d)
        sky_rgb = mat_mod.sample_sky(table, tex, scene.sky_mat, view_dir)
        radiance = radiance + jnp.where(miss[:, None],
                                        throughput * sky_rgb, 0.0)

        active = alive & hit.hit
        view = vm.normalize(hit.point - o)
        uniforms = rng.bounce_uniforms(seed, pix, smp, depth,
                                       cfg.bounce_slots)
        sh = mat_mod.shade(table, tex, hit.mat, view, normal, hit.texcoords,
                           uniforms)

        # Edge reparameterization (silhouette gradients) — identical
        # lane-wise logic to the unrolled loop (integrator.py), with the
        # per-lane depth vector in place of the loop index.
        if cfg.edge_eps > 0.0 and hit.edge_dist is not None:
            alpha = jnp.clip(hit.edge_dist / cfg.edge_eps, 0.0, 1.0)
            ue = rng.edge_uniform(seed, pix, smp, depth)
            pass_thru = active & (ue >= alpha)
            keep = active & ~pass_thru
            sg = jax.lax.stop_gradient
            ratio = jnp.where(
                pass_thru,
                (1.0 - alpha) / jnp.maximum(sg(1.0 - alpha), 1e-6),
                jnp.where(keep, alpha / jnp.maximum(sg(alpha), 1e-6), 1.0))
            throughput = throughput * ratio[:, None]
            view_dir_n = vm.normalize(d)
            sh = sh._replace(
                direction=jnp.where(pass_thru[:, None], view_dir_n,
                                    sh.direction),
                bias=jnp.where(pass_thru[:, None], 0.0, sh.bias),
                coef=jnp.where(pass_thru[:, None], 1.0, sh.coef),
                will_indirect=jnp.where(pass_thru, True, sh.will_indirect),
                is_light=jnp.where(pass_thru, False, sh.is_light),
                is_fog=jnp.where(pass_thru, False, sh.is_fog),
            )

        at0 = depth == 0
        if aovs:
            aovn = scatter_mask(st["aov_normal"], at0, st["lane_id"],
                                jnp.where(hit.hit[:, None], normal, view_dir))
            aovd = scatter_mask(
                st["aov_depth"], at0, st["lane_id"],
                jnp.where(hit.hit, vm.length(hit.point - o), z_far))
            aovm = scatter_mask(st["aov_mat"], at0, st["lane_id"],
                                jnp.where(hit.hit, hit.mat, scene.sky_mat))
        else:
            aovn, aovd, aovm = (st["aov_normal"], st["aov_depth"],
                                st["aov_mat"])
        plh = jnp.where(at0, hit.hit & sh.is_light, st["plh"])
        mark = active & sh.is_fog & at0
        fog_active = fog_active | mark
        fog_from = jnp.where(mark[:, None], hit.point, st["fog_from"])
        fog_diffuse = jnp.where(mark[:, None], sh.fog_diffuse,
                                st["fog_diffuse"])
        fog_density = jnp.where(mark, sh.fog_density, st["fog_density"])
        fog_u = jnp.where(mark, uniforms[:, 3], st["fog_u"])

        radiance = radiance + jnp.where(active[:, None],
                                        throughput * sh.bias, 0.0)
        throughput = jnp.where(active[:, None], throughput * sh.coef,
                               throughput)

        new_o = hit.point + sh.direction * cfg.ray_offset
        new_d = sh.direction * (z_far - cfg.ray_offset)
        o = jnp.where(active[:, None], new_o, o)
        d = jnp.where(active[:, None], new_d, d)

        was_live = st["alive"]
        alive = active & sh.will_indirect
        depth = jnp.where(was_live, depth + 1, depth)

        capped = alive & (depth >= eff_depth)
        if cfg.fast_render:
            radiance = radiance + jnp.where(capped[:, None], throughput, 0.0)
        alive = alive & ~capped

        died = was_live & ~alive
        # Depth-0 light tone clamp at lane death (integrator.py:222-228).
        norm2 = jnp.sqrt(jnp.maximum(vm.dot(radiance, radiance), 1e-20))
        clamp = plh & (norm2 > cfg.light_clamp)
        scale = jnp.where(clamp, cfg.light_clamp / norm2, 1.0)
        rad_buf = scatter_mask(st["radiance_buf"], died, st["lane_id"],
                               radiance * scale[:, None])

        out = {
            "o": o, "d": d, "radiance": radiance, "throughput": throughput,
            "lane_id": st["lane_id"], "depth": depth, "alive": alive,
            "plh": plh, "fog_active": fog_active, "fog_from": fog_from,
            "fog_diffuse": fog_diffuse, "fog_density": fog_density,
            "fog_u": fog_u, "cursor": st["cursor"], "segments": segments,
            "radiance_buf": rad_buf, "aov_normal": aovn, "aov_depth": aovd,
            "aov_mat": aovm,
        }
        if record_hits:
            out["rec_ids"] = st["rec_ids"]
            out["rec_hit"] = st["rec_hit"]
        return out

    def cond(st):
        limit = n if warm is None else warm["n_live"]
        return (st["cursor"] < limit) | jnp.any(st["alive"])

    z3 = jnp.zeros((q, 3), f32)
    z1 = jnp.zeros((q,), f32)
    pad3 = lambda a: jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:],
                                                   a.dtype)])
    state = {
        "o": z3, "d": z3, "radiance": z3, "throughput": z3,
        "lane_id": jnp.full((q,), -1, jnp.int32),
        "depth": jnp.zeros((q,), jnp.int32),
        "alive": jnp.zeros((q,), bool),
        "plh": jnp.zeros((q,), bool),
        "fog_active": jnp.zeros((q,), bool),
        "fog_from": z3, "fog_diffuse": z3, "fog_density": z1, "fog_u": z1,
        "cursor": jnp.zeros((), jnp.int32),
        "segments": jnp.zeros((), jnp.int32),
        "radiance_buf": pad3(warm["radiance_init"]) if warm is not None
        else jnp.zeros((n + 1, 3), f32),
        "aov_normal": pad3(warm["aov_normal"]) if warm is not None
        else jnp.zeros((n + 1, 3), f32),
        "aov_depth": pad3(warm["aov_depth"]) if warm is not None
        else jnp.zeros((n + 1,), f32),
        "aov_mat": pad3(warm["aov_mat"]) if warm is not None
        else jnp.zeros((n + 1,), jnp.int32),
    }
    if record_hits:
        # q pad rows (not 1): scatter_unique gives every dropped lane its
        # own pad slot so the record scatter has defined semantics.
        state["rec_ids"] = jnp.full((n * eff_depth + q,), -1, jnp.int32)
        state["rec_hit"] = jnp.zeros((n * eff_depth + q,), bool)
    st = jax.lax.while_loop(cond, body, state)
    segments = st["segments"]
    if warm is not None:
        segments = segments + jnp.int32(n)  # cache-served depth-0 segments
    out = TraceOutput(
        radiance=st["radiance_buf"][:n],
        aov_normal=st["aov_normal"][:n],
        aov_depth=st["aov_depth"][:n],
        aov_mat=st["aov_mat"][:n],
        segments=segments,
    )
    if record_hits:
        return out, (st["rec_ids"][:n * eff_depth].reshape(n, eff_depth),
                     st["rec_hit"][:n * eff_depth].reshape(n, eff_depth))
    return out


def compute_first_hits(scene: ScenePack, camera: Camera, cfg: RenderConfig,
                       seed, cam_sample0, *, intersector, y0=0, rows=None,
                       chunk: int = DEFAULT_QUEUE):
    """Depth-0 collision for every lane of a band: the first-hit G-buffer.

    The TPU form of the reference's ``ImagePlaneCache`` build pass
    (engine.cpp:33-105): trace the band's primary rays once — frozen
    camera-uniform stream ``cam_sample0`` — and keep the full ``Hit`` SoA.
    Feed the result to :func:`render_queued` as ``first_hits`` (with the
    same ``cam_sample0``) so every later progressive frame skips depth-0
    tree work while the camera is still; any camera change invalidates it
    (main.cpp:142-143 → the session layer re-keys on a camera hash).

    Runs in ``chunk``-lane slices via ``lax.map`` so the one-time build
    compiles a single chunk body regardless of band size.  Must use the
    SAME ``intersector`` the progressive frames use, so the cached ``Hit``
    carries exactly the fields the queue expects to gather.
    """
    if rows is None:
        rows = cfg.height
    n = rows * cfg.width * cfg.spp
    c = min(chunk, n)
    n_chunks = -(-n // c)
    n_pad = n_chunks * c
    lanes = jnp.arange(n_pad, dtype=jnp.int32)
    # Pad lanes replay lane 0 (same shapes every chunk) and are sliced off.
    lanes = jnp.where(lanes < n, lanes, 0).reshape(n_chunks, c)

    use_alive = getattr(intersector, "accepts_alive", False)

    def one(chunk_lanes):
        o, d, _, _ = rays_for_lanes(camera, cfg.width, cfg.height, cfg.spp,
                                    seed, cam_sample0, chunk_lanes, y0=y0)
        alive = jnp.ones(chunk_lanes.shape, bool)
        return intersector(o, d, alive) if use_alive else intersector(o, d)

    hits = jax.lax.map(one, lanes)
    return jax.tree.map(
        lambda a: a.reshape((n_pad,) + a.shape[2:])[:n], hits)


class WarmPose(NamedTuple):
    """Pose-frozen half of the warm-start first-hit design (see
    :func:`render_queued` ``warm``): everything that depends only on the
    camera pose — the first-hit G-buffer, the enqueue permutation
    (hit & non-light lanes first; hit-aliveness is deterministic given
    frozen primaries), and pre-filled output buffers for the lanes that
    terminate at depth 0 deterministically (miss → sky, light hit →
    clamped emission) plus the depth-0 AOVs."""

    first_hits: object     # Hit SoA [n]
    ids: jnp.ndarray       # [n] enqueue-ordered lane ids
    n_live: jnp.ndarray    # [] int32, count of enqueue lanes
    prefill: jnp.ndarray   # [n,3] radiance of deterministically-dead lanes
    aov_normal: jnp.ndarray
    aov_depth: jnp.ndarray
    aov_mat: jnp.ndarray


def compute_warm_pose(scene: ScenePack, camera: Camera, cfg: RenderConfig,
                      seed, cam_sample0, *, intersector, y0=0, rows=None,
                      chunk: int = DEFAULT_QUEUE) -> WarmPose:
    """Build the pose-frozen warm-start bundle (one intersection pass)."""
    if rows is None:
        rows = cfg.height
    n = rows * cfg.width * cfg.spp
    table, tex = scene.materials, scene.textures
    fh = compute_first_hits(scene, camera, cfg, seed, cam_sample0,
                            intersector=intersector, y0=y0, rows=rows,
                            chunk=chunk)
    lanes = jnp.arange(n, dtype=jnp.int32)
    o, d, _, _ = rays_for_lanes(camera, cfg.width, cfg.height, cfg.spp,
                                seed, cam_sample0, lanes, y0=y0)
    view_dir = vm.normalize(d)
    side = vm.dot(fh.normal, o - fh.point)
    normal = jnp.where((side < 0.0)[:, None], -fh.normal, fh.normal)
    view = vm.normalize(fh.point - o)
    # Deterministic classification: is_light depends only on the material
    # row, and a light's bias is its (possibly textured) emission — no
    # RNG reaches either, so zero uniforms are exact here.
    sh0 = mat_mod.shade(table, tex, fh.mat, view, normal, fh.texcoords,
                        jnp.zeros((n, 4), jnp.float32))
    miss = ~fh.hit
    light_hit = fh.hit & sh0.is_light
    enqueue = fh.hit & ~sh0.is_light
    order = jnp.argsort(~enqueue, stable=True).astype(jnp.int32)
    n_live = jnp.sum(enqueue.astype(jnp.int32))

    sky_rgb = mat_mod.sample_sky(table, tex, scene.sky_mat, view_dir)
    # Depth-0 light tone clamp (plh lanes, integrator semantics).
    r_light = sh0.bias
    norm2 = jnp.sqrt(jnp.maximum(vm.dot(r_light, r_light), 1e-20))
    scale = jnp.where(norm2 > cfg.light_clamp, cfg.light_clamp / norm2, 1.0)
    prefill = (jnp.where(miss[:, None], sky_rgb, 0.0)
               + jnp.where(light_hit[:, None], r_light * scale[:, None],
                           0.0))
    z_far = camera.z_far
    aovn = jnp.where(fh.hit[:, None], normal, view_dir)
    aovd = jnp.where(fh.hit, vm.length(fh.point - o), z_far)
    aovm = jnp.where(fh.hit, fh.mat, scene.sky_mat)
    return WarmPose(first_hits=fh, ids=order, n_live=n_live,
                    prefill=prefill, aov_normal=aovn, aov_depth=aovd,
                    aov_mat=aovm)


def warm_frame(scene: ScenePack, camera: Camera, cfg: RenderConfig,
               pose: WarmPose, seed, sample0, cam_sample0, y0=0,
               rows=None):
    """Per-frame half: depth-0 shading of the frozen hits (bounce RNG
    advances with ``sample0``), packed into the warm table
    :func:`render_queued` consumes.  No intersections.

    Returns the ``warm`` dict for ``render_queued``.  Layout of
    ``state`` [n, 22]: o 0:3, d 3:6, radiance 6:9, throughput 9:12,
    fog_active 12, fog_from 13:16, fog_diffuse 16:19, fog_density 19,
    fog_u 20, alive 21.
    """
    if rows is None:
        rows = cfg.height
    n = rows * cfg.width * cfg.spp
    table, tex = scene.materials, scene.textures
    fh = pose.first_hits
    lanes = jnp.arange(n, dtype=jnp.int32)
    o, d, _, _ = rays_for_lanes(camera, cfg.width, cfg.height, cfg.spp,
                                seed, cam_sample0, lanes, y0=y0)
    pix = (lanes // (cfg.width * cfg.spp) + y0) * cfg.width + (
        lanes // cfg.spp) % cfg.width
    smp = lanes % cfg.spp + jnp.asarray(sample0, jnp.int32)
    uniforms = rng.bounce_uniforms(seed, pix, smp, jnp.zeros_like(lanes),
                                   cfg.bounce_slots)
    side = vm.dot(fh.normal, o - fh.point)
    normal = jnp.where((side < 0.0)[:, None], -fh.normal, fh.normal)
    view = vm.normalize(fh.point - o)
    sh = mat_mod.shade(table, tex, fh.mat, view, normal, fh.texcoords,
                       uniforms)
    z_far = camera.z_far
    new_o = fh.point + sh.direction * cfg.ray_offset
    new_d = sh.direction * (z_far - cfg.ray_offset)
    radiance0 = sh.bias        # throughput = 1 at depth 0
    coef0 = sh.coef
    enqueue = fh.hit & ~sh.is_light
    alive1 = enqueue & sh.will_indirect
    mark = enqueue & sh.is_fog
    f32 = jnp.float32
    state = jnp.concatenate([
        new_o, new_d, radiance0, coef0,
        mark.astype(f32)[:, None],
        jnp.where(mark[:, None], fh.point, 0.0),
        sh.fog_diffuse, sh.fog_density[:, None],
        uniforms[:, 3:4],
        alive1.astype(f32)[:, None],
    ], axis=1)
    # Lanes that die at depth 0 per-frame (will_indirect False on a
    # non-light hit): their bias radiance joins the pose prefill (no
    # clamp — plh is False for non-light primaries).
    patch = jnp.where((enqueue & ~alive1)[:, None], radiance0, 0.0)
    return dict(ids=pose.ids, n_live=pose.n_live, state=state,
                radiance_init=pose.prefill + patch,
                aov_normal=pose.aov_normal, aov_depth=pose.aov_depth,
                aov_mat=pose.aov_mat)
