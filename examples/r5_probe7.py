"""Round-5 TPU probe batch 7: bench rows after the full-frame rework +
camera-pose gradient speed and convergence.

a. fwdbwd    — bench.bench_fwdbwd as it will run (full-frame sync-free).
b. affine    — bench.bench_affine rows.
c. cam_rates — per-step wall time of camera-pose recovery: fused loss
               kernel (fields=("camera",)) vs the planar-replay
               value_and_grad the example used through round 4, at the
               example's fine-stage config (128x128x2spp depth 3).
d. cam_example — examples/recover_camera.py convergence end-to-end.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cam_rates(iters=3, calls=20):
    import numpy as np

    from recover_camera import build_scene

    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.diff_path import make_image_fn
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn
    from fspt_tpu.ops.pallas_path import camera_pvec

    builder = build_scene()
    scene = builder.compile()
    cam = builder.cameras[0]
    cfg = RenderConfig(width=128, height=128, spp=2, max_depth=3)
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
    orig = cam.origin
    for name, fn, arg, ready in (
            ("fused", fused_fn, cv, lambda r: r[1]["camera"]),
            ("planar", planar_fn, orig, lambda r: r[1])):
        t0 = time.time()
        r = fn(arg, 1)
        jax.block_until_ready(ready(r))
        log(f"[cam_rates {name}] compile+first {time.time()-t0:.1f}s")
        for it in range(iters):
            t0 = time.time()
            for c in range(calls):
                r = fn(arg, it * calls + c + 2)
            jax.block_until_ready(ready(r))
            dt = time.time() - t0
            log(f"[cam_rates {name}] iter {it}: {dt/calls*1e3:.2f} ms/step")


def main():
    log(f"devices: {jax.devices()}")
    import bench

    which = sys.argv[1:] or ["fwdbwd", "affine", "cam_rates", "cam_example"]
    for w in which:
        t0 = time.time()
        try:
            if w == "fwdbwd":
                r = bench.bench_fwdbwd()
                log(f"[fwdbwd bench row] {r/1e6:.1f} Mrays/s")
            elif w == "affine":
                r = bench.bench_affine()
                log(f"[affine bench rows] {r}")
            elif w == "cam_rates":
                cam_rates()
            elif w == "cam_example":
                import recover_camera

                recover_camera.main(["--iters", "300",
                                     "--out", "/tmp/r5_cam"])
        except Exception:
            import traceback
            traceback.print_exc(file=sys.stderr)
        log(f"[{w}] total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
