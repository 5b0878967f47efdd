"""Block-size (R) sweep for the mesh path, banded like bench_mesh (dev tool).

PERF_NOTES measured R=128 vs 256 only; the sweep epilogue scales with R
while list tightness improves as R shrinks, so R<128 may win.
"""

import os
import sys
import time

import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(block_rays, sub_bundles, group, sort=True, width=1024, height=1024,
        spp=4, band_rows=256):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import build_mesh_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
    from fspt_tpu.render import integrator

    builder = build_mesh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=4)
    inter = make_mesh_intersector(scene, block_rays=block_rays,
                                  sub_bundles=sub_bundles, group=group,
                                  sort=sort)
    n_bands = height // band_rows

    def band(y0, f0):
        out = integrator.render_wavefront(
            scene, camera, cfg, 7, f0 * cfg.spp, y0=y0, rows=band_rows,
            intersector=inter)
        return out.segments, out.radiance.sum()

    fn = jax.jit(band)
    t0 = time.time()
    seg0 = int(fn(0, 0)[0])
    log(f"  compile+first band: {time.time()-t0:.1f}s segs={seg0}")
    best = 0.0
    for it in range(2):
        t0 = time.time()
        outs = [fn(b * band_rows, it + 1) for b in range(n_bands)]
        total = sum(int(o[0]) for o in outs)
        dt = time.time() - t0
        best = max(best, total / dt)
        log(f"  iter {it}: {dt*1e3:.0f} ms, {total/dt/1e6:.2f} Mrays/s")
    return best


def main():
    triples = []
    args = sys.argv[1:]
    if args:
        for a in args:
            parts = a.split(",")
            r, s, g = (int(v) for v in parts[:3])
            sort = parts[3] if len(parts) > 3 else True
            triples.append((r, s, g, sort))
    else:
        triples = [(64, 64, 8, True), (128, 128, 8, True)]
    for (r, s, g, sort) in triples:
        log(f"config R={r} S={s} G={g} sort={sort}")
        try:
            rate = run(r, s, g, sort)
            log(f"RESULT R={r} S={s} G={g} sort={sort}: {rate/1e6:.2f} Mrays/s")
        except Exception as e:
            log(f"FAILED R={r}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
