"""Round-5 TPU probe batch 8: the mesh-path SCHEDULE question
(VERDICT r4 #3): visits/ray and end-to-end rate for

  R=64  x {morton, cullsim}   (current default blocking)
  R=128 x {morton, cullsim}   (re-sweep now that the epilogue is <=7%)

on PRIM (camera) and BOUNCE (random-hemisphere off the mesh — worst case)
131k-lane sets of the 100k-tri bench scene, plus the full-frame queued
bench with the winning configuration.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 131072


def build():
    from bench import build_mesh_scene
    from fspt_tpu.camera import generate_rays
    from fspt_tpu.ops import pallas_bvh as pb
    from fspt_tpu.ops.bvh import build_bvh
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector

    builder = build_mesh_scene()
    scene = builder.compile()
    cam = builder.cameras[0]
    spp, width = 4, 1024
    rows = N // (width * spp)
    start, seg, _, _ = jax.jit(lambda: generate_rays(
        cam, width, 1024, spp, 7, 0, y0=300, rows=rows))()

    fine = scene.bvh
    order0 = np.argsort(np.asarray(fine.tri_id))
    v0 = np.asarray(fine.tri_v0)[order0]
    v1 = v0 + np.asarray(fine.tri_e1)[order0]
    v2 = v0 + np.asarray(fine.tri_e2)[order0]
    coarse = pb.build_treelet_chunks(v0, v1, v2)
    tt = {k: jnp.asarray(vv) for k, vv in pb.treelet_tables(coarse).items()}
    mlo = np.minimum(v0, np.minimum(v1, v2)).min(axis=0)
    mhi = np.maximum(v0, np.maximum(v1, v2)).max(axis=0)
    lo_j = jnp.asarray(mlo, jnp.float32)
    hi_j = jnp.asarray(mhi, jnp.float32)

    inter = make_mesh_intersector(scene)
    hit = jax.jit(lambda: inter(start, seg))()

    # BOUNCE set: random hemisphere dirs off the primary hit points
    # (mirrors the r4 roofline probe's worst case).
    key = jax.random.PRNGKey(3)
    d = jax.random.normal(key, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    nrm = hit.normal
    d = jnp.where(jnp.sum(d * nrm, axis=-1, keepdims=True) < 0, -d, d)
    zf = 10000.0
    b_start = jnp.where(hit.hit[:, None], hit.point + d * 0.03, start)
    b_seg = d * zf
    alive_b = hit.hit

    def box_exit(s, g):
        inv = 1.0 / jnp.where(jnp.abs(g) < 1e-30,
                              jnp.where(g >= 0, 1e-30, -1e-30), g)
        ta = (lo_j - s) * inv
        tb = (hi_j - s) * inv
        tn = jnp.max(jnp.minimum(ta, tb), axis=-1)
        tf = jnp.min(jnp.maximum(ta, tb), axis=-1)
        okb = (tn <= tf) & (tf > 0.0)
        return jnp.where(okb, tf * 1.0001 + 1e-5, 0.0)

    sets = {
        "PRIM": (start, seg, jnp.minimum(jnp.ones((N,)), box_exit(start, seg)),
                 None),
        "BOUNCE": (b_start, b_seg,
                   jnp.where(alive_b, jnp.minimum(1.0, box_exit(b_start, b_seg)),
                             0.0),
                   alive_b),
    }
    return scene, coarse, tt, lo_j, hi_j, sets


def rep_time(fn, reps=11):
    f_many = jax.jit(lambda: jax.lax.fori_loop(
        0, reps, lambda i, c: c + fn(i)[0].sum() * 0.0, jnp.zeros(())))
    f_one = jax.jit(lambda: jax.lax.fori_loop(
        0, 1, lambda i, c: c + fn(i)[0].sum() * 0.0, jnp.zeros(())))
    jax.block_until_ready(f_many())
    jax.block_until_ready(f_one())
    tm, t1 = [], []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f_many())
        tm.append(time.time() - t0)
        t0 = time.time()
        jax.block_until_ready(f_one())
        t1.append(time.time() - t0)
    return (np.median(tm) - np.median(t1)) / (reps - 1)


def schedule_matrix():
    from fspt_tpu.ops import pallas_bvh as pb

    scene, coarse, tt, lo_j, hi_j, sets = build()
    for R in (64, 128):
        ct = pb.make_culled_traverser(coarse, block_rays=R, sub_bundles=R,
                                      group=8, pipeline_depth=4, tables=tt)
        for sname, (s, g, t0v, alive) in sets.items():
            live = int(jnp.sum(t0v > 0))
            for blocking in ("morton", "cullsim"):
                if blocking == "cullsim":
                    key = pb.cullsim_keys(s, g, alive, t0v, lo_j, hi_j,
                                          tt["lbmin"], tt["lbmax"])
                else:
                    key = pb.morton_keys(s, g, alive, lo_j, hi_j)
                order = jnp.argsort(key)
                so, go, to = s[order], g[order], t0v[order]
                counts, ol, tlo, F = jax.jit(
                    lambda so=so, go=go, to=to: ct.prepare(so, go, to))()
                out = jax.jit(lambda F=F, counts=counts, ol=ol, tlo=tlo:
                              ct.sweep(counts, ol, tlo, F))()
                visits = float(out[::R, 2].sum())
                eps = 1e-6

                def swp(i, F=F, counts=counts, ol=ol, tlo=tlo):
                    Fv = F.at[0, 10].set(
                        F[0, 10] + eps * (i % 3).astype(jnp.float32))
                    return (ct.sweep(counts, ol, tlo, Fv),)

                per = rep_time(swp)
                log(f"[{sname} R={R} {blocking}] visits={visits:.0f} "
                    f"({visits/max(live,1):.2f}/live-ray, live={live}) "
                    f"sweep {per*1e3:.2f} ms "
                    f"({per/max(visits,1)*1e9:.0f} ns/visit)")


def bench_variant(block_rays, sort, queue=1 << 17, iters=3):
    from bench import build_mesh_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
    from fspt_tpu.render.queue import render_queued

    builder = build_mesh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=1024, height=1024, spp=4, max_depth=4)
    inter = make_mesh_intersector(scene, block_rays=block_rays,
                                  sub_bundles=block_rays, sort=sort)

    def frame(f0):
        out = render_queued(scene, camera, cfg, 7, f0 * cfg.spp,
                            intersector=inter, queue=queue)
        return out.segments, out.radiance.sum()

    fn = jax.jit(frame)
    t0 = time.time()
    seg0 = int(fn(0)[0])
    log(f"[bench R={block_rays} {sort}] compile+first {time.time()-t0:.1f}s "
        f"segs={seg0}")
    for it in range(iters):
        t0 = time.time()
        segs = int(fn(it + 1)[0])
        dt = time.time() - t0
        log(f"[bench R={block_rays} {sort}] iter {it}: {dt*1e3:.0f} ms, "
            f"{segs/dt/1e6:.2f} Mrays/s")


def main():
    log(f"devices: {jax.devices()}")
    which = sys.argv[1:] or ["matrix", "bench64c", "bench128m", "bench128c"]
    for w in which:
        t0 = time.time()
        try:
            if w == "matrix":
                schedule_matrix()
            elif w == "bench64m":
                bench_variant(64, True)
            elif w == "bench64c":
                bench_variant(64, "cullsim")
            elif w == "bench128m":
                bench_variant(128, True)
            elif w == "bench128c":
                bench_variant(128, "cullsim")
        except Exception:
            import traceback
            traceback.print_exc(file=sys.stderr)
        log(f"[{w}] total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
