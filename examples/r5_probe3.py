"""Round-5 TPU probe batch 3: where did the 1080p-band forward rate go?

a. cornell    — the exact bench_forward Cornell config (session calibration).
b. fwd_full   — baked forward, 1080p as ONE 8.3M-lane call, 10 calls/window.
c. fwd_band   — baked forward, 270-row bands, 12 calls per timing window.
d. affine_full— fused loss kernel (affine backward), full-frame single call.
e. affine_band— fused loss kernel (affine backward), 270-row bands.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


W, H = 1920, 1080


def _flagship(spp=4, depth=8):
    from bench import build_bench_scene
    from fspt_tpu.config import RenderConfig

    builder = build_bench_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=W, height=H, spp=spp, max_depth=depth)
    return scene, camera, cfg


def cornell():
    from bench import bench_forward
    r = bench_forward(outer_iters=3)
    log(f"[cornell] {r/1e6:.0f} Mrays/s")


def _fwd(band_rows, calls_per_window, iters=3):
    from fspt_tpu.ops.pallas_path import make_camera_path_tracer

    scene, camera, cfg = _flagship()
    tracer = make_camera_path_tracer(scene, camera, cfg)
    lanes = band_rows * W * cfg.spp
    n_bands = H // band_rows

    def band(seed, s0, y0):
        out = tracer(seed, s0, lane0=y0 * W * cfg.spp, n_lanes=lanes)
        return out.segments, out.radiance.sum()

    fn = jax.jit(band)
    t0 = time.time()
    segs = int(fn(7, 0, 0)[0])
    log(f"[fwd b{band_rows}] compile+first {time.time()-t0:.1f}s "
        f"segs/call={segs}")
    ctr = 1
    for it in range(iters):
        t0 = time.time()
        total = 0
        for c in range(calls_per_window):
            s, r = fn(7, ctr, (c % n_bands) * band_rows)
            ctr += 1
            total += int(s)
        jax.block_until_ready(r)
        dt = time.time() - t0
        log(f"[fwd b{band_rows}] iter {it}: {dt*1e3:.0f} ms "
            f"({calls_per_window} calls), {total/dt/1e6:.1f} Mrays/s, "
            f"{dt/calls_per_window*1e3:.1f} ms/call")


def fwd_full():
    _fwd(band_rows=H, calls_per_window=10)


def fwd_band():
    _fwd(band_rows=270, calls_per_window=12)


def _affine(band_rows, calls_per_window, iters=3):
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn

    scene, camera, cfg = _flagship()
    fused = make_fused_loss_grad_fn(scene, camera, cfg, block_rows=32,
                                    affine=True)
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}
    target = jnp.zeros((band_rows, W, 3), jnp.float32)
    fn = jax.jit(lambda p, f0, y0: fused(p, target, 7, f0, y0, band_rows))
    n_bands = H // band_rows
    t0 = time.time()
    loss, grads, segs = fn(params, 1, 0)
    jax.block_until_ready(grads)
    log(f"[affine b{band_rows}] compile+first {time.time()-t0:.1f}s "
        f"segs/call={int(segs)} loss={float(loss):.5f}")
    log(f"[affine b{band_rows}] grad checksum "
        f"diffuse={float(jnp.sum(grads['diffuse'])):.6e}")
    ctr = 2
    for it in range(iters):
        t0 = time.time()
        total = 0
        for c in range(calls_per_window):
            loss, grads, segs = fn(params, ctr, (c % n_bands) * band_rows)
            ctr += 1
            total += int(segs)
        jax.block_until_ready(grads)
        dt = time.time() - t0
        log(f"[affine b{band_rows}] iter {it}: {dt*1e3:.0f} ms "
            f"({calls_per_window} calls), {total/dt/1e6:.1f} Mrays/s, "
            f"{dt/calls_per_window*1e3:.1f} ms/call")


def affine_full():
    _affine(band_rows=H, calls_per_window=8)


def affine_band():
    _affine(band_rows=270, calls_per_window=12)


def main():
    log(f"devices: {jax.devices()}")
    which = sys.argv[1:] or ["cornell", "fwd_full", "fwd_band",
                             "affine_full", "affine_band"]
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
