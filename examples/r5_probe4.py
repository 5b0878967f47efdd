"""Round-5 TPU probe batch 4: isolate the 1920-width forward slowdown +
re-measure the scene-sharded path after merge-skip/baked-analytic fixes.

a. fwd_sq1024   — flagship scene, 1024x1024x4spp, full frame, one call.
b. fwd_2048w    — 2048x1080x4spp (pow2 width at 1080p scale).
c. fwd_1080ns   — 1920x1080x4spp, no .sum() on outputs.
d. sharded      — scene-sharded fast bench after the r5 fixes.
e. affine16     — affine fused loss, full frame, block_rows=16.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fwd(width, height, calls, use_sum=True, iters=3, spp=4):
    from bench import build_bench_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_path import make_camera_path_tracer

    builder = build_bench_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=8)
    tracer = make_camera_path_tracer(scene, camera, cfg)

    if use_sum:
        def frame(seed, s0):
            out = tracer(seed, s0)
            return out.segments, out.radiance.sum()
    else:
        def frame(seed, s0):
            out = tracer(seed, s0)
            return out.segments, out.radiance

    fn = jax.jit(frame)
    tag = f"fwd {width}x{height}{'' if use_sum else ' nosum'}"
    t0 = time.time()
    segs = int(fn(7, 0)[0])
    log(f"[{tag}] compile+first {time.time()-t0:.1f}s segs={segs}")
    lanes = width * height * spp
    for it in range(iters):
        t0 = time.time()
        total = 0
        for c in range(calls):
            s, r = fn(7, it * calls + c + 1)
            total += int(s)
        jax.block_until_ready(r)
        dt = time.time() - t0
        log(f"[{tag}] iter {it}: {dt/calls*1e3:.1f} ms/call, "
            f"{total/dt/1e6:.1f} Mrays/s, "
            f"{dt/calls/ (lanes*8) * 1e9:.3f} ns/lane-depth")


def fwd_sq1024():
    _fwd(1024, 1024, calls=20)


def fwd_2048w():
    _fwd(2048, 1080, calls=10)


def fwd_1080ns():
    _fwd(1920, 1080, calls=10, use_sum=False)


def sharded():
    from examples.r5_probe1 import scene_sharded

    scene_sharded()


def affine16(iters=3, calls=8):
    from bench import build_bench_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn

    builder = build_bench_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=1920, height=1080, spp=4, max_depth=8)
    fused = make_fused_loss_grad_fn(scene, camera, cfg, block_rows=16,
                                    affine=True)
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}
    target = jnp.zeros((1080, 1920, 3), jnp.float32)
    fn = jax.jit(lambda p, f0: fused(p, target, 7, f0, 0, 1080))
    t0 = time.time()
    loss, grads, segs = fn(params, 1)
    jax.block_until_ready(grads)
    log(f"[affine16 full] compile+first {time.time()-t0:.1f}s "
        f"segs={int(segs)}")
    for it in range(iters):
        t0 = time.time()
        total = 0
        for c in range(calls):
            loss, grads, segs = fn(params, it * calls + c + 2)
            total += int(segs)
        jax.block_until_ready(grads)
        dt = time.time() - t0
        log(f"[affine16 full] iter {it}: {dt/calls*1e3:.1f} ms/call, "
            f"{total/dt/1e6:.1f} Mrays/s")


def main():
    log(f"devices: {jax.devices()}")
    which = sys.argv[1:] or ["fwd_sq1024", "fwd_2048w", "fwd_1080ns",
                             "sharded", "affine16"]
    for w in which:
        t0 = time.time()
        try:
            globals()[w]()
        except Exception as e:
            import traceback
            traceback.print_exc(file=sys.stderr)
            log(f"[{w}] FAILED: {type(e).__name__}: {e}")
        log(f"[{w}] total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
