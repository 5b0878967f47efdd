"""Round-5 TPU probe batch 1: remat fwd+bwd + queued scene-sharded path.

One process, sequential experiments, results on stderr — collect from the
log (relay compiles are the bottleneck; never run TPU jobs concurrently).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fwdbwd(remat, block_rows=32, band_rows=270, iters=3):
    from bench import build_bench_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn

    builder = build_bench_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=1920, height=1080, spp=4, max_depth=8)
    fused = make_fused_loss_grad_fn(scene, camera, cfg,
                                    block_rows=block_rows, remat=remat)
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}
    target = jnp.zeros((band_rows, 1920, 3), jnp.float32)
    fn = jax.jit(lambda p, f0, y0: fused(p, target, 7, f0, y0, band_rows))
    n_bands = 1080 // band_rows
    t0 = time.time()
    loss, grads, segs = fn(params, 1, 0)
    jax.block_until_ready(grads)
    log(f"[fwdbwd remat={remat} br={block_rows}] compile+first: "
        f"{time.time()-t0:.1f}s segs={int(segs)} loss={float(loss):.5f}")
    g0 = float(jnp.sum(grads["diffuse"]))
    log(f"[fwdbwd remat={remat}] grad checksum diffuse={g0:.6e}")
    for it in range(iters):
        t0 = time.time()
        total = 0
        for bnd in range(n_bands):
            loss, grads, segs = fn(params, it * n_bands + bnd + 2,
                                   bnd * band_rows)
            total += int(segs)
        jax.block_until_ready(grads)
        dt = time.time() - t0
        log(f"[fwdbwd remat={remat} br={block_rows}] iter {it}: "
            f"{dt*1e3:.0f} ms, {total/dt/1e6:.1f} Mrays/s")


def scene_sharded(iters=3):
    from bench import build_mesh_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.parallel import make_mesh, make_scene_sharded_render_step
    from fspt_tpu.render import framebuffer as fb_mod

    builder = build_mesh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=512, height=512, spp=2, max_depth=3)
    mesh = make_mesh(1)
    step = make_scene_sharded_render_step(mesh, cfg, scene, fast=True)
    fb = fb_mod.create(cfg.height, cfg.width)
    t0 = time.time()
    fb, segs = step(scene, camera, fb, 7, 0)
    jax.block_until_ready(fb)
    log(f"[scene-sharded queued] compile+first: {time.time()-t0:.1f}s "
        f"segs={int(segs)}")
    for it in range(iters):
        t0 = time.time()
        fb, segs = step(scene, camera, fb, 7, it + 1)
        jax.block_until_ready(fb)
        dt = time.time() - t0
        log(f"[scene-sharded queued] iter {it}: {dt*1e3:.0f} ms, "
            f"{int(segs)/dt/1e6:.2f} Mrays/s")


def main():
    log(f"devices: {jax.devices()}")
    which = sys.argv[1:] or ["fwdbwd_remat", "fwdbwd_base", "sharded"]
    for w in which:
        t0 = time.time()
        try:
            if w == "fwdbwd_remat":
                fwdbwd(remat=True, block_rows=32)
            elif w == "fwdbwd_remat16":
                fwdbwd(remat=True, block_rows=16)
            elif w == "fwdbwd_base":
                fwdbwd(remat=False, block_rows=32)
            elif w == "sharded":
                scene_sharded()
        except Exception as e:
            import traceback
            traceback.print_exc(file=sys.stderr)
            log(f"[{w}] FAILED: {type(e).__name__}: {e}")
        log(f"[{w}] total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
