"""Parameterized dev profiler — the one probe entry point.

Two sub-probes (superseding the former profile_mesh / profile_mesh_r3 /
profile_stages_fori / profile_fwdbwd scripts):

* ``stages`` — dispatch-free per-stage timing of the mesh-BVH intersector.
  Standalone per-stage jits are useless through the axon relay (1-20 ms
  dispatch noise per call swamps sub-30 ms stages) and the AOT trace is a
  simulator that models Pallas custom-calls as zero-cost, so each stage
  runs R reps inside one ``lax.fori_loop`` that perturbs its input every
  iteration (nothing hoists) and threads the output into the carry
  (nothing is DCE'd) — per-rep device times good to ~0.1 ms.
* ``fwdbwd`` — value_and_grad throughput of the dual-buffer
  material-recovery loss across the three differentiable paths
  (``fused`` Pallas in-kernel-adjoint / ``planar`` XLA replay /
  ``integrator`` general wavefront).

    python examples/profile.py stages [--lanes 131072] [--reps 11]
    python examples/profile.py fwdbwd [--paths fused planar integrator]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- stages --

def rep_time(make_body, carry0, reps, label):
    """Median wall of jit(fori_loop(reps, body)) minus 1-rep run, per rep."""

    def run(r):
        return jax.jit(lambda c: jax.lax.fori_loop(0, r, make_body, c))

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


def probe_stages(n=131072, reps=11):
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

    def body_full(i, c):
        hit = inter(vary(start, i), seg)
        return c + hit.t.sum() * 0.0 + hit.mat.sum().astype(jnp.float32) * 0.0

    rep_time(body_full, jnp.zeros(()), reps, "full intersector")

    def body_base(i, c):
        hit = base_fn(vary(start, i), seg)
        return c + hit.t.sum() * 0.0

    rep_time(body_base, jnp.zeros(()), reps, "base analytic Hit")

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

    t_init = jnp.minimum(jnp.full((n,), 1.0), 1.0)

    def body_cull(i, c):
        counts, order2, tlo, F = ct.prepare(vary(start, i), seg, t_init)
        return c + counts.sum().astype(jnp.float32) * 0.0 + tlo.sum() * 0.0 \
            + F.sum() * 0.0

    rep_time(body_cull, jnp.zeros(()), reps, "cull prepare (lattice+sort+F)")

    base = base_fn(start, seg)
    counts, order2, tlo, F = jax.jit(
        lambda: ct.prepare(start, seg, jnp.minimum(base.t, 1.0)))()

    def body_sweep(i, c):
        Fv = F.at[0, 10].set(F[0, 10] + eps * (i % 3).astype(jnp.float32))
        out = ct.sweep(counts, order2, tlo, Fv)
        return c + out[:, 0].sum() * 0.0

    rep_time(body_sweep, jnp.zeros(()), reps, "sweep kernel (primary lists)")

    out = jax.jit(lambda: ct.sweep(counts, order2, tlo, F))()
    t_k = out[:n, 0]
    best = jax.lax.bitcast_convert_type(out[:n, 1], jnp.int32)

    def body_post(i, c):
        res = ct.post(vary(start, i), seg, t_k, best)
        return c + res[0].sum() * 0.0 + res[2].sum() * 0.0

    rep_time(body_post, jnp.zeros(()), reps, "post (winner recompute)")


# ---------------------------------------------------------------- fwdbwd --

def probe_fwdbwd(path="fused", width=1920, height=1080, spp=4, max_depth=8,
                 band_rows=270, iters=2):
    from bench import build_bench_scene
    from fspt_tpu.config import RenderConfig

    builder = build_bench_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp,
                       max_depth=max_depth)

    if path == "fused":
        from fspt_tpu.ops.pallas_grad import make_grad_image_fn

        gi = make_grad_image_fn(scene, camera, cfg)
        img_fn = lambda p, seed, f0, y0, rows: gi(p, seed, f0, y0, rows)
    elif path == "planar":
        from fspt_tpu.ops.diff_path import make_image_fn

        di = make_image_fn(scene, cfg, z_far=float(np.asarray(camera.z_far)))

        def img_fn(p, seed, f0, y0, rows):
            return di(scene.materials._replace(**p), camera, seed, f0, y0,
                      rows)
    else:  # integrator
        from fspt_tpu.ops.pallas_trace import make_pallas_intersector
        from fspt_tpu.render import integrator

        fast = make_pallas_intersector(scene.geometry)
        sg = jax.lax.stop_gradient
        inter = lambda s, g: fast(sg(s), sg(g))

        def img_fn(p, seed, f0, y0, rows):
            sc = scene._replace(materials=scene.materials._replace(**p))
            out = integrator.render_wavefront(sc, camera, cfg, seed,
                                              f0 * cfg.spp, y0=y0, rows=rows,
                                              intersector=inter)
            img = out.radiance.reshape(rows, width, spp, 3).mean(axis=2)
            return img, out.segments

    def loss_fn(params, y0, target, f0):
        a, sa = img_fn(params, 7, f0, y0, band_rows)
        b, sb = img_fn(params, 7, f0 + 10007, y0, band_rows)
        da, db = a - target, b - target
        return jnp.mean(da * db), sa + sb

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}
    target = jnp.zeros((band_rows, width, 3), jnp.float32)
    n_bands = height // band_rows
    t0 = time.time()
    (_, segs), grads = grad_fn(params, 0, target, 1)
    jax.block_until_ready(grads)
    log(f"{path}: compile+first {time.time()-t0:.1f}s segs={int(segs)}")
    for it in range(iters):
        t0 = time.time()
        total = 0
        for bnd in range(n_bands):
            (_, s), grads = grad_fn(params, bnd * band_rows, target,
                                    it * n_bands + bnd + 2)
            total += int(s)
        jax.block_until_ready(grads)
        dt = time.time() - t0
        log(f"{path} iter {it}: {dt*1e3:.0f} ms, {total/dt/1e6:.1f} Mrays/s")


def main():
    p = argparse.ArgumentParser(description="fspt_tpu dev profiler")
    sub = p.add_subparsers(dest="probe", required=True)
    ps = sub.add_parser("stages")
    ps.add_argument("--lanes", type=int, default=131072)
    ps.add_argument("--reps", type=int, default=11)
    pf = sub.add_parser("fwdbwd")
    pf.add_argument("--paths", nargs="+", default=["fused"],
                    choices=["fused", "planar", "integrator"])
    pf.add_argument("--iters", type=int, default=2)
    args = p.parse_args()
    if args.probe == "stages":
        probe_stages(args.lanes, args.reps)
    else:
        for path in args.paths:
            probe_fwdbwd(path, iters=args.iters)


if __name__ == "__main__":
    main()
