"""fwd+bwd throughput experiment (dev tool): value_and_grad of a dual-buffer
material-recovery loss on the flagship Cornell-class scene, banded 1080p 4spp.

BASELINE.json's headline metric names "rays/sec/chip fwd+bwd at 4spp 1080p";
this script measures candidate configurations before bench.py adopts one.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(width=1920, height=1080, spp=4, max_depth=8, band_rows=27,
        iters=3):
    from bench import build_bench_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_trace import make_pallas_intersector
    from fspt_tpu.render import integrator

    builder = build_bench_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp,
                       max_depth=max_depth)
    fast = make_pallas_intersector(scene.geometry)
    sg = jax.lax.stop_gradient

    def inter(start, seg):
        return fast(sg(start), sg(seg))

    def band_img(params, y0, seed, f0):
        table = scene.materials._replace(**params)
        sc = scene._replace(materials=table)
        out = integrator.render_wavefront(sc, camera, cfg, seed,
                                          f0 * cfg.spp, y0=y0,
                                          rows=band_rows, intersector=inter)
        img = out.radiance.reshape(band_rows, width, spp, 3).mean(axis=2)
        return img, out.segments

    def loss_fn(params, y0, target, f0):
        a, sa = band_img(params, y0, 7, f0)
        b, sb = band_img(params, y0, 7, f0 + 10007)
        da, db = a - target, b - target
        return jnp.mean(da * db), sa + sb

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}
    target = jnp.zeros((band_rows, width, 3), jnp.float32)

    n_bands = height // band_rows
    lanes = band_rows * width * spp
    log(f"fwd+bwd {width}x{height}x{spp} depth={max_depth}: {n_bands} bands "
        f"of {band_rows} rows ({lanes} lanes)")
    t0 = time.time()
    (loss, segs), grads = grad_fn(params, 0, target, 1)
    jax.block_until_ready(grads)
    log(f"  compile+first: {time.time()-t0:.1f}s  segs/band(double)={int(segs)}")

    best = 0.0
    for it in range(iters):
        t0 = time.time()
        total = 0
        for bnd in range(n_bands):
            (loss, segs), grads = grad_fn(params, bnd * band_rows, target,
                                          it * n_bands + bnd + 2)
            total += int(segs)
        jax.block_until_ready(grads)
        dt = time.time() - t0
        best = max(best, total / dt)
        log(f"  iter {it}: {dt*1e3:.0f} ms, {total} segs, "
            f"{total/dt/1e6:.1f} Mrays/s fwd+bwd")
    return best


def main():
    for rows in (27, 54, 135):
        if 1080 % rows:
            continue
        try:
            r = run(band_rows=rows)
            log(f"RESULT rows={rows}: {r/1e6:.1f} Mrays/s fwd+bwd")
        except Exception as e:
            log(f"FAILED rows={rows}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
