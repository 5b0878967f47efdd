"""Round-5 TPU probe batch 6: validate the divmod-free raygen + the
full-frame sync-free bench methodology.

a. fwd_nosync — 1920x1080x4spp forward megakernel, 20 calls/window
   (compare vs 2089 Mrays/s pre-divmod-fix, probe 5).
b. bench_fwdbwd — the real bench row as it will run.
c. bench_affine — the affine image-fn rows as they will run.
d. cornell — session calibration (bench_forward 1024^2).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fwd_nosync(iters=3, calls=20):
    from bench import build_bench_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_path import make_camera_path_tracer

    builder = build_bench_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=1920, height=1080, spp=4, max_depth=8)
    tracer = make_camera_path_tracer(scene, camera, cfg)
    fn = jax.jit(lambda f0: tracer(7, f0 * cfg.spp))
    t0 = time.time()
    out = fn(0)
    jax.block_until_ready(out)
    log(f"[fwd_nosync] compile+first {time.time()-t0:.1f}s "
        f"segs={int(out.segments)}")
    for it in range(iters):
        t0 = time.time()
        ss = []
        for c in range(calls):
            out = fn(it * calls + c + 1)
            ss.append(out.segments)
        jax.block_until_ready(out)
        dt = time.time() - t0
        total = sum(int(s) for s in ss)
        log(f"[fwd_nosync] iter {it}: {dt/calls*1e3:.1f} ms/call, "
            f"{total/dt/1e6:.1f} Mrays/s")


def main():
    log(f"devices: {jax.devices()}")
    import bench

    which = sys.argv[1:] or ["fwd_nosync", "fwdbwd", "affine", "cornell"]
    for w in which:
        t0 = time.time()
        try:
            if w == "fwd_nosync":
                fwd_nosync()
            elif w == "fwdbwd":
                r = bench.bench_fwdbwd()
                log(f"[fwdbwd bench row] {r/1e6:.1f} Mrays/s")
            elif w == "affine":
                r = bench.bench_affine()
                log(f"[affine bench rows] {r}")
            elif w == "cornell":
                r = bench.bench_forward(outer_iters=3)
                log(f"[cornell] {r/1e6:.1f} Mrays/s")
        except Exception:
            import traceback
            traceback.print_exc(file=sys.stderr)
        log(f"[{w}] total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
