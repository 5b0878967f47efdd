"""Banded high-density mesh bench experiment (dev tool).

A 4M-lane 1024^2 x 4spp wavefront OOMs at compile ([N,1]/[N,3] f32 temps pad
to (8,128) tiles -> 128x expansion).  Banding keeps the wavefront at 512k
lanes while delivering 1024^2-grade angular ray density per block -- the
coherence the treelet cull feeds on.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(width, height, spp, band_rows, block_rays=128, max_depth=4):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import build_mesh_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
    from fspt_tpu.render import integrator

    builder = build_mesh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp,
                       max_depth=max_depth)
    inter = make_mesh_intersector(scene, block_rays=block_rays)

    fn = jax.jit(lambda y0, f0: integrator.render_wavefront(
        scene, camera, cfg, 7, f0 * cfg.spp, y0=y0, rows=band_rows,
        intersector=inter).segments)
    n_bands = height // band_rows
    log(f"{width}x{height}x{spp}, {n_bands} bands of {band_rows} rows "
        f"({width*band_rows*spp} lanes/band)")
    t0 = time.time()
    segs0 = int(fn(0, 0))
    log(f"  compile+first band: {time.time()-t0:.1f}s segs/band~{segs0}")

    best = 0.0
    for it in range(2):
        t0 = time.time()
        total = 0
        outs = [fn(b * band_rows, it + 1) for b in range(n_bands)]
        total = sum(int(o) for o in outs)
        dt = time.time() - t0
        best = max(best, total / dt)
        log(f"  frame {it}: {dt*1e3:.0f} ms, {total} segs, "
            f"{total/dt/1e6:.2f} Mrays/s")
    return best


def main():
    for (w, h, spp, rows) in [
        (1024, 1024, 4, 128),
        (2048, 2048, 4, 64),
    ]:
        try:
            r = run(w, h, spp, rows)
            log(f"RESULT {w}x{h}x{spp} rows={rows}: {r/1e6:.2f} Mrays/s")
        except Exception as e:
            log(f"FAILED {w}x{h}x{spp}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
