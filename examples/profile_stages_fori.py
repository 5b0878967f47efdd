"""Dispatch-free stage profiler: each stage runs R reps inside one jit.

Standalone per-stage jits are useless through the axon relay (1-20 ms
dispatch noise per call swamps sub-30 ms stages) and the AOT trace is a
simulator that models Pallas custom-calls as zero-cost.  This harness wraps
each stage in a ``lax.fori_loop`` that perturbs its input every iteration
(so nothing hoists) and threads the output into the carry (so nothing is
DCE'd), giving per-rep device times good to ~0.1 ms.

    python examples/profile_stages_fori.py [n_lanes] [reps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rep_time(make_body, carry0, reps, label):
    """Median wall of jit(fori_loop(reps, body)) minus 1-rep run, per rep."""

    def run(r):
        return jax.jit(
            lambda c: jax.lax.fori_loop(0, r, make_body, c))

    f_many, f_one = run(reps), run(1)
    jax.block_until_ready(f_many(carry0))
    jax.block_until_ready(f_one(carry0))
    tm, t1 = [], []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f_many(carry0))
        tm.append(time.time() - t0)
        t0 = time.time()
        jax.block_until_ready(f_one(carry0))
        t1.append(time.time() - t0)
    per = (np.median(tm) - np.median(t1)) / (reps - 1)
    log(f"{label:34s} {per*1e3:8.2f} ms/rep")
    return per


def main(n=131072, reps=11):
    from bench import build_mesh_scene
    from fspt_tpu.camera import generate_rays
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops import pallas_bvh as pb
    from fspt_tpu.ops.bvh import build_bvh
    from fspt_tpu.ops.pallas_trace import make_pallas_intersector

    log(f"n={n} reps={reps} backend={jax.default_backend()}")
    builder = build_mesh_scene()
    scene = builder.compile()
    cam = builder.cameras[0]
    spp, width = 4, 1024
    rows = n // (width * spp)
    cfg = RenderConfig(width=width, height=rows, spp=spp, max_depth=4)
    start, seg, pix, smp = jax.jit(lambda: generate_rays(
        cam, width, 1024, spp, 7, 0, y0=300, rows=rows))()

    fine = scene.bvh
    order0 = np.argsort(np.asarray(fine.tri_id))
    v0 = np.asarray(fine.tri_v0)[order0]
    v1 = v0 + np.asarray(fine.tri_e1)[order0]
    v2 = v0 + np.asarray(fine.tri_e2)[order0]
    coarse = build_bvh(v0, v1, v2, max_leaf=pb.TREELET)
    ct = pb.make_culled_traverser(coarse, block_rays=128, group=8)
    mlo = np.minimum(v0, np.minimum(v1, v2)).min(axis=0)
    mhi = np.maximum(v0, np.maximum(v1, v2)).max(axis=0)
    lo_j = jnp.asarray(mlo, jnp.float32)
    hi_j = jnp.asarray(mhi, jnp.float32)
    base_fn = make_pallas_intersector(scene.geometry)
    inter = pb.make_mesh_intersector(scene)

    eps = 1e-6

    def vary(s, i):
        return s + eps * (i % 3).astype(jnp.float32)

    # full intersector
    def body_full(i, c):
        s = vary(start, i)
        hit = inter(s, seg)
        return c + hit.t.sum() * 0.0 + hit.mat.sum().astype(jnp.float32) * 0.0

    rep_time(body_full, jnp.zeros(()), reps, "full intersector")

    # base analytic Hit
    def body_base(i, c):
        hit = base_fn(vary(start, i), seg)
        return c + hit.t.sum() * 0.0

    rep_time(body_base, jnp.zeros(()), reps, "base analytic Hit")

    # morton sort chain (key + argsort + 7-col gather + inv + 2 unsorts)
    def body_sort(i, c):
        s = vary(start, i)
        key = pb.morton_keys(s, seg, None, lo_j, hi_j)
        order = jnp.argsort(key)
        rays7 = jnp.concatenate([s, seg, key.astype(jnp.float32)[:, None]],
                                axis=1)
        s7 = rays7[order]
        inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        a = s7[:, 0][inv]
        b = s7[:, 6][inv]
        return c + a.sum() * 0.0 + b.sum() * 0.0

    rep_time(body_sort, jnp.zeros(()), reps, "morton sort chain")

    # cull (prepare: lattice + pack-sort + F build)
    t_init = jnp.minimum(jnp.full((n,), 1.0), 1.0)

    def body_cull(i, c):
        counts, order2, tlo, F = ct.prepare(vary(start, i), seg, t_init)
        return c + counts.sum().astype(jnp.float32) * 0.0 + tlo.sum() * 0.0 \
            + F.sum() * 0.0

    rep_time(body_cull, jnp.zeros(()), reps, "cull prepare (lattice+sort+F)")

    # sweep on real culled inputs (coherent primary)
    base = base_fn(start, seg)
    counts, order2, tlo, F = jax.jit(
        lambda: ct.prepare(start, seg, jnp.minimum(base.t, 1.0)))()

    def body_sweep(i, c):
        Fv = F.at[0, 10].set(F[0, 10] + eps * (i % 3).astype(jnp.float32))
        out = ct.sweep(counts, order2, tlo, Fv)
        return c + out[:, 0].sum() * 0.0

    rep_time(body_sweep, jnp.zeros(()), reps, "sweep kernel (primary lists)")

    # post + assembly-ish gathers
    out = jax.jit(lambda: ct.sweep(counts, order2, tlo, F))()
    t_k = out[:n, 0]
    best = jax.lax.bitcast_convert_type(out[:n, 1], jnp.int32)

    def body_post(i, c):
        res = ct.post(vary(start, i), seg, t_k, best)
        return c + res[0].sum() * 0.0 + res[2].sum() * 0.0

    rep_time(body_post, jnp.zeros(()), reps, "post (winner recompute)")


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
