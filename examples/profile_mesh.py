"""Mesh-path profiler (dev tool) — consolidates the r2 experiment scripts.

Two modes:

* ``stages`` (default): time each stage of the culled-treelet intersector
  independently — 6-D Morton sort, analytic base, culled traverse on
  coherent and shuffled wavefronts, full intersector, full frame — so
  optimization effort goes where the milliseconds are (PERF_NOTES.md
  ledger).
* ``sweep``: parameterized throughput runs over kernel knobs
  (``--block-rays/--sub-bundles/--group/--band-rows/--no-sort``), banded
  like bench.py:bench_mesh.

    python examples/profile_mesh.py stages [width height spp]
    python examples/profile_mesh.py sweep --block-rays 128 256 --band-rows 256
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = 1e30
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best


def stages(width=512, height=512, spp=2):
    from bench import build_mesh_scene
    from fspt_tpu.camera import generate_rays
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops import pallas_bvh as pb
    from fspt_tpu.ops.bvh import build_bvh
    from fspt_tpu.ops.pallas_trace import make_pallas_intersector
    import numpy as np

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    builder = build_mesh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=4)

    start, seg, pix, samp = jax.jit(
        lambda: generate_rays(camera, cfg.width, cfg.height, cfg.spp, 7, 0))()
    jax.block_until_ready(start)
    n = start.shape[0]
    log(f"wavefront: {n} rays")

    fine = scene.bvh
    order = np.argsort(np.asarray(fine.tri_id))
    v0 = np.asarray(fine.tri_v0)[order]
    v1 = v0 + np.asarray(fine.tri_e1)[order]
    v2 = v0 + np.asarray(fine.tri_e2)[order]
    coarse = build_bvh(v0, v1, v2, max_leaf=pb.TREELET)
    log(f"treelets: {int(np.sum(np.asarray(coarse.count) > 0))} leaves")

    lo = np.minimum(v0, np.minimum(v1, v2)).min(axis=0)
    hi = np.maximum(v0, np.maximum(v1, v2)).max(axis=0)

    def sort_only(s, g):
        key = pb.morton_keys(s, g, None, jnp.asarray(lo), jnp.asarray(hi))
        o = jnp.argsort(key)
        inv = jnp.zeros((n,), jnp.int32).at[o].set(jnp.arange(n, dtype=jnp.int32))
        return s[o][inv]

    t = timeit(jax.jit(sort_only), start, seg)
    log(f"sort+unsort: {t*1e3:.1f} ms")

    base_fn = make_pallas_intersector(scene.geometry)
    t = timeit(jax.jit(lambda s, g: base_fn(s, g).t), start, seg)
    log(f"analytic base: {t*1e3:.1f} ms")

    trav = pb.make_culled_traverser(coarse, block_rays=128, group=8)
    t_init = jnp.full((n,), 1.0, jnp.float32)
    t = timeit(jax.jit(lambda s, g, ti: trav(s, g, ti)[0]), start, seg, t_init)
    log(f"culled traverse (primary, coherent): {t*1e3:.1f} ms")

    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, n)
    ss, gs = start[perm], seg[perm]
    t = timeit(jax.jit(lambda s, g, ti: trav(s, g, ti)[0]), ss, gs, t_init)
    log(f"culled traverse (shuffled, incoherent): {t*1e3:.1f} ms")

    inter = pb.make_mesh_intersector(scene)
    t = timeit(jax.jit(lambda s, g: inter(s, g).t), start, seg)
    log(f"full intersector (primary): {t*1e3:.1f} ms")

    from fspt_tpu.render import integrator
    fn = jax.jit(lambda: integrator.render_wavefront(
        scene, camera, cfg, 7, 0, intersector=inter).segments)
    t = timeit(fn, iters=2)
    segs = int(fn())
    log(f"full frame ({cfg.max_depth} bounces): {t*1e3:.1f} ms "
        f"→ {segs/t/1e6:.2f} Mrays/s")


def sweep_one(block_rays, sub_bundles, group, sort, width, height, spp,
              band_rows, max_depth=4):
    from bench import build_mesh_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
    from fspt_tpu.render import integrator

    builder = build_mesh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=max_depth)
    inter = make_mesh_intersector(scene, block_rays=block_rays,
                                  sub_bundles=sub_bundles, group=group,
                                  sort=sort)
    band_rows = band_rows or height
    n_bands = height // band_rows

    def band(y0, f0):
        return integrator.render_wavefront(
            scene, camera, cfg, 7, f0 * cfg.spp, y0=y0, rows=band_rows,
            intersector=inter).segments

    fn = jax.jit(band)
    t0 = time.time()
    seg0 = int(fn(0, 0))
    log(f"  compile+first band: {time.time()-t0:.1f}s segs/band={seg0}")
    best = 0.0
    for it in range(2):
        t0 = time.time()
        total = sum(int(fn(b * band_rows, it + 1)) for b in range(n_bands))
        dt = time.time() - t0
        best = max(best, total / dt)
        log(f"  R={block_rays} S={sub_bundles} G={group} sort={sort} "
            f"band={band_rows}: {dt*1e3:.0f} ms, {total/dt/1e6:.2f} Mrays/s")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="stages",
                    choices=["stages", "sweep"])
    ap.add_argument("dims", nargs="*", type=int,
                    help="stages: [width height spp]")
    ap.add_argument("--block-rays", type=int, nargs="+", default=[128])
    ap.add_argument("--sub-bundles", type=int, default=128)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--band-rows", type=int, default=256)
    ap.add_argument("--no-sort", action="store_true")
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=4)
    args = ap.parse_args()

    if args.mode == "stages":
        stages(*args.dims)
        return
    for R in args.block_rays:
        try:
            rate = sweep_one(R, args.sub_bundles, args.group, not args.no_sort,
                             args.width, args.height, args.spp, args.band_rows)
            log(f"RESULT R={R}: {rate/1e6:.2f} Mrays/s")
        except Exception as e:
            log(f"FAILED R={R}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
