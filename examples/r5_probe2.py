"""Round-5 TPU probe batch 2: fwd+bwd cost breakdown + sharded comparison.

1. fwd_baked  — baked-constant camera megakernel, 1080p band config.
2. fwd_smem   — SMEM-param forward kernel only (make_grad_path_tracer.trace
                without any vjp), same band config, both-buffer accounting.
3. remat16    — fused loss kernel, remat, block_rows=16.
4. repl_queue — replicated queued mesh render at the scene-sharded bench
                config (512^2 x 2spp, depth 3) for a true comparison.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BAND = 270
W, H = 1920, 1080


def _flagship():
    from bench import build_bench_scene
    from fspt_tpu.config import RenderConfig

    builder = build_bench_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=W, height=H, spp=4, max_depth=8)
    return scene, camera, cfg


def fwd_baked(iters=3):
    from fspt_tpu.ops.pallas_path import make_camera_path_tracer

    scene, camera, cfg = _flagship()
    tracer = make_camera_path_tracer(scene, camera, cfg)
    lanes_band = BAND * W * cfg.spp

    def band(seed, s0, y0):
        out = tracer(seed, s0, lane0=y0 * W * cfg.spp, n_lanes=lanes_band)
        return out.segments, out.radiance.sum()

    fn = jax.jit(band)
    n_bands = H // BAND
    t0 = time.time()
    segs = int(fn(7, 0, 0)[0])
    log(f"[fwd_baked] compile+first {time.time()-t0:.1f}s segs/band={segs}")
    for it in range(iters):
        t0 = time.time()
        total = 0
        for b in range(n_bands):
            s, r = fn(7, it * n_bands + b + 1, b * BAND)
            total += int(s)
        jax.block_until_ready(r)
        dt = time.time() - t0
        log(f"[fwd_baked] iter {it}: {dt*1e3:.0f} ms, "
            f"{total/dt/1e6:.1f} Mrays/s")


def fwd_smem(iters=3):
    from fspt_tpu.ops.pallas_grad import make_grad_path_tracer, pack_params

    scene, camera, cfg = _flagship()
    tracer = make_grad_path_tracer(scene, camera, cfg, block_rows=32)
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}
    pvec = pack_params(params, tracer.fields)
    lanes_band = BAND * W * cfg.spp

    def band(pv, s0, y0):
        out = tracer(pv, 7, s0, y0 * W * cfg.spp, lanes_band)
        return out.segments, out.radiance.sum()

    fn = jax.jit(band)
    n_bands = H // BAND
    t0 = time.time()
    segs = int(fn(pvec, 0, 0)[0])
    log(f"[fwd_smem] compile+first {time.time()-t0:.1f}s segs/band={segs}")
    for it in range(iters):
        t0 = time.time()
        total = 0
        for b in range(n_bands):
            s, r = fn(pvec, it * n_bands + b + 1, b * BAND)
            total += int(s)
        jax.block_until_ready(r)
        dt = time.time() - t0
        log(f"[fwd_smem] iter {it}: {dt*1e3:.0f} ms, "
            f"{total/dt/1e6:.1f} Mrays/s")


def remat16():
    from examples.r5_probe1 import fwdbwd

    fwdbwd(remat=True, block_rows=16)


def repl_queue(iters=3):
    from bench import build_mesh_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_bvh import make_mesh_intersector
    from fspt_tpu.render.queue import render_queued

    builder = build_mesh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=512, height=512, spp=2, max_depth=3)
    inter = make_mesh_intersector(scene)

    def frame(f0):
        out = render_queued(scene, camera, cfg, 7, f0 * cfg.spp,
                            intersector=inter, queue=1 << 17)
        return out.segments, out.radiance.sum()

    fn = jax.jit(frame)
    t0 = time.time()
    segs = int(fn(0)[0])
    log(f"[repl_queue 512] compile+first {time.time()-t0:.1f}s segs={segs}")
    for it in range(iters):
        t0 = time.time()
        s, r = fn(it + 1)
        jax.block_until_ready(r)
        dt = time.time() - t0
        log(f"[repl_queue 512] iter {it}: {dt*1e3:.0f} ms, "
            f"{int(s)/dt/1e6:.2f} Mrays/s")


def main():
    log(f"devices: {jax.devices()}")
    which = sys.argv[1:] or ["fwd_baked", "fwd_smem", "remat16", "repl_queue"]
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
