"""fwd+bwd throughput comparison (dev tool): value_and_grad of the
dual-buffer material-recovery loss on the flagship scene, banded 1080p 4spp
(BASELINE.json headline config), across the three differentiable paths:

* ``integrator`` — general XLA wavefront integrator (r2 baseline, ~8 Mrays/s)
* ``planar``     — planar XLA replay, ops/diff_path.py (~95 Mrays/s)
* ``fused``      — Pallas fwd + in-kernel-adjoint bwd, ops/pallas_grad.py
                   (~260 Mrays/s; what bench.py ships)

    python examples/profile_fwdbwd.py [fused planar integrator ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(path="fused", width=1920, height=1080, spp=4, max_depth=8,
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


if __name__ == "__main__":
    for p in (sys.argv[1:] or ["fused"]):
        run(p)
