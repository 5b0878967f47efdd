"""Round-5 TPU probe batch 9: camera-pose recovery tuning + scaled
fused-vs-planar camera gradient rates.

a. sweep    — recover_camera.py at several (coarse_spp, target_frames,
              lr) knob settings, 240 iters each.
b. cam_big  — fused loss kernel vs planar value_and_grad per-step wall
              time at a compute-bound config (512x512x4spp depth 6),
              sync-free windows: the ">=10x the planar-replay rate" row.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sweep():
    import recover_camera

    for cs, tf, lrc in ((256, 48, 0.4), (256, 48, 0.15),
                        (512, 96, 0.15), (128, 48, 0.4)):
        log(f"=== sweep coarse_spp={cs} target_frames={tf} lr={lrc}")
        recover_camera.main([
            "--iters", "240", "--coarse-spp", str(cs),
            "--target-frames", str(tf), "--lr-coarse", str(lrc),
            "--out", f"/tmp/r5cam_{cs}_{tf}_{lrc}"])


def cam_big(iters=3, calls=10):
    import numpy as np

    from recover_camera import build_scene

    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.diff_path import make_image_fn
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn
    from fspt_tpu.ops.pallas_path import camera_pvec

    builder = build_scene()
    scene = builder.compile()
    cam = builder.cameras[0]
    cfg = RenderConfig(width=512, height=512, spp=4, max_depth=6)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    fused = make_fused_loss_grad_fn(scene, cam, cfg, fields=("camera",))
    fused_fn = jax.jit(lambda cv, f0: fused({"camera": cv}, target, 7, f0,
                                            0, cfg.height))

    img_fn = make_image_fn(scene, cfg, z_far=float(np.asarray(cam.z_far)))
    table = scene.materials

    def planar_loss(origin, f0):
        c = cam._replace(origin=origin)
        a, _ = img_fn(table, c, 7, f0, 0, cfg.height)
        b, _ = img_fn(table, c, 7, f0 + 10007, 0, cfg.height)
        return jnp.mean((a - target) * (b - target))

    planar_fn = jax.jit(jax.value_and_grad(planar_loss))

    cv = camera_pvec(cam)
    times = {}
    for name, fn, arg, ready, ncalls in (
            ("fused", fused_fn, cv, lambda r: r[1]["camera"], calls),
            ("planar", planar_fn, cam.origin, lambda r: r[1], 2)):
        t0 = time.time()
        r = fn(arg, 1)
        jax.block_until_ready(ready(r))
        log(f"[cam_big {name}] compile+first {time.time()-t0:.1f}s")
        best = None
        for it in range(iters):
            t0 = time.time()
            for c in range(ncalls):
                r = fn(arg, it * ncalls + c + 2)
            jax.block_until_ready(ready(r))
            per = (time.time() - t0) / ncalls
            best = per if best is None else min(best, per)
            log(f"[cam_big {name}] iter {it}: {per*1e3:.2f} ms/step")
        times[name] = best
    log(f"[cam_big] planar/fused step ratio: "
        f"{times['planar']/times['fused']:.1f}x")


def main():
    log(f"devices: {jax.devices()}")
    which = sys.argv[1:] or ["cam_big", "sweep"]
    for w in which:
        t0 = time.time()
        try:
            globals()[w]()
        except Exception:
            import traceback
            traceback.print_exc(file=sys.stderr)
        log(f"[{w}] total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
