"""Density / block-size sweep for the mesh path (dev tool)."""

import os
import sys
import time

import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(width, height, spp, block_rays, sub_bundles, group):
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
                                  sub_bundles=sub_bundles, group=group)
    fn = jax.jit(lambda f0: integrator.render_wavefront(
        scene, camera, cfg, 7, f0 * cfg.spp, intersector=inter).segments)
    t0 = time.time()
    segs = int(fn(0))
    log(f"  compile+first: {time.time()-t0:.1f}s segs={segs}")
    best = 0.0
    for it in range(2):
        t0 = time.time()
        segs = int(fn(it + 1))
        dt = time.time() - t0
        best = max(best, segs / dt)
        log(f"  {width}x{height}x{spp} R={block_rays}: {dt*1e3:.0f} ms, "
            f"{segs/dt/1e6:.2f} Mrays/s")
    return best


def main():
    configs = [
        (1024, 1024, 4, 128, 8, 8),
        (1024, 1024, 4, 256, 8, 8),
    ]
    for (w, h, spp, R, S, G) in configs:
        log(f"config {w}x{h}x{spp} R={R}")
        try:
            rate = run(w, h, spp, R, S, G)
            log(f"RESULT {w}x{h}x{spp} R={R}: {rate/1e6:.2f} Mrays/s")
        except Exception as e:
            log(f"FAILED {w}x{h}x{spp} R={R}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
