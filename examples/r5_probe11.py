"""Round-5 TPU probe batch 11: camera-loss diagnostics.

Why does pose recovery stall?  At the coarse stage config (16x16,
spp=256, clean per-stage target):

a. slice  — fused dual-buffer loss (avg 30 frames) along the segment
            truth -> start: is the landscape monotone toward truth?
b. gdir   — mean fused gradient at start (30 frames): cosine with the
            (start - truth) direction (positive = descent moves toward
            truth); per-component means vs the true offset.
c. planar_gdir — same cosine through the planar pooled loss at 128^2
            (the r4 example's objective) for comparison.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


W = H = 16
SPP = 256


def setup():
    from recover_camera import build_scene

    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.diff_path import make_image_fn
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn
    from fspt_tpu.ops.pallas_path import camera_pvec

    builder = build_scene()
    scene = builder.compile()
    cam = builder.cameras[0]
    cfg = RenderConfig(width=W, height=H, spp=SPP, max_depth=3)
    fused = make_fused_loss_grad_fn(scene, cam, cfg, fields=("camera",))
    img = make_image_fn(scene, cfg, z_far=float(np.asarray(cam.z_far)))
    tbl = scene.materials

    def tgt_fn():
        acc = 0.0
        for f in range(8):
            i, _ = img(tbl, cam, 3, f, 0, H)
            acc = acc + i
        return acc / 8

    tgt = jax.jit(tgt_fn)()
    cv_true = camera_pvec(cam)
    cv_start = cv_true.at[0:3].set(jnp.asarray([6.0, -5.0, -160.0]))
    return scene, cam, cfg, fused, tgt, cv_true, cv_start


def main():
    log(f"devices: {jax.devices()}")
    scene, cam, cfg, fused, tgt, cv_true, cv_start = setup()
    fn = jax.jit(lambda cv, f0: fused({"camera": cv}, tgt, 7, f0, 0, H))

    # a. landscape slice
    for alpha in (0.0, 0.25, 0.5, 0.75, 1.0):
        cv = cv_true + alpha * (cv_start - cv_true)
        ls = []
        for f in range(30):
            loss, _, _ = fn(cv, 100 + f)
            ls.append(float(loss))
        log(f"[slice] alpha={alpha:.2f} loss={np.mean(ls):+.5f} "
            f"+/- {np.std(ls)/np.sqrt(30):.5f}")

    # b. mean gradient direction at start
    gs = []
    for f in range(30):
        _, g, _ = fn(cv_start, 200 + f)
        gs.append(np.asarray(g["camera"]))
    gm = np.mean(gs, axis=0)
    gstd = np.std(gs, axis=0) / np.sqrt(30)
    offset = np.asarray(cv_start - cv_true)  # descent should align +
    o3, g3 = offset[:3], gm[:3]
    cos = float(g3 @ o3 / (np.linalg.norm(g3) * np.linalg.norm(o3) + 1e-30))
    log(f"[gdir] offset origin={o3}")
    log(f"[gdir] mean grad origin={g3} (sem {gstd[:3]})")
    log(f"[gdir] full mean grad={gm}")
    log(f"[gdir] cos(grad, offset)={cos:+.3f}  "
        "(+1 = perfect descent direction)")

    # c. planar pooled objective at 128^2 for comparison
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.diff_path import make_image_fn

    cfg128 = RenderConfig(width=128, height=128, spp=2, max_depth=3)
    img = make_image_fn(scene, cfg128, z_far=float(np.asarray(cam.z_far)))
    tbl = scene.materials

    def tgt128_fn():
        acc = 0.0
        for f in range(12):
            i, _ = img(tbl, cam, 3, f, 0, 128)
            acc = acc + i
        return acc / 12

    tgt128 = jax.jit(tgt128_fn)()

    def pool(x, k):
        return x.reshape(128 // k, k, 128 // k, k, 3).mean(axis=(1, 3))

    def ploss(origin, f0):
        c = cam._replace(origin=origin)
        a, _ = img(tbl, c, 7, f0, 0, 128)
        b, _ = img(tbl, c, 7, f0 + 10007, 0, 128)
        da, db = pool(a - tgt128, 8), pool(b - tgt128, 8)
        return jnp.mean(da * db)

    pg = jax.jit(jax.grad(ploss))
    gs = []
    for f in range(30):
        gs.append(np.asarray(pg(cv_start[0:3], 300 + 2 * f)))
    gm3 = np.mean(gs, axis=0)
    cos = float(gm3 @ o3 / (np.linalg.norm(gm3) * np.linalg.norm(o3) + 1e-30))
    log(f"[planar_gdir] mean grad={gm3} cos={cos:+.3f}")


if __name__ == "__main__":
    main()
