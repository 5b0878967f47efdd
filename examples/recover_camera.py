"""Differentiable CAMERA POSE recovery through the fused loss kernel.

Recover the camera origin from a target render by gradient descent — the
pose analog of material recovery.  The camera 9-vector
(ops/pallas_path.camera_pvec: origin, target, fov_y, aperture,
focal_depth) rides the SAME fused Pallas loss kernel as material columns
(ops/pallas_grad.make_fused_loss_grad_fn, fields=("camera",)): ray
generation is traced from SMEM scalars inside the kernel and the
in-kernel vjp carries the pose cotangent through rays → hits → shading,
so one kernel call per step yields loss AND pose gradient at near-forward
speed (the planar XLA replay this example used through round 4 runs ~40×
slower per step at this config; PERF_NOTES round-5 table).

Coarse-to-fine rides a RESOLUTION PYRAMID instead of image-space pooling
(the kernel's lane-level loss cannot pool, but rendering at 1/8 width IS
the pooled objective): image-space misalignment is nearly
piecewise-constant per pixel, so the low-res stage restores a usable
basin, then the full-res stage polishes.

    python examples/recover_camera.py [--iters 400] [--out /tmp/recover_cam]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu import Camera, RenderConfig, SceneBuilder
from fspt_tpu import materials as M
from fspt_tpu.materials import MaterialSpec
from fspt_tpu.ops.diff_path import make_image_fn
from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn
from fspt_tpu.ops.pallas_path import camera_pvec
from fspt_tpu.utils.image import write_image


def build_scene():
    b = SceneBuilder()
    white = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(0.73, 0.73, 0.73)))
    red = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(0.65, 0.05, 0.05)))
    green = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(0.12, 0.45, 0.15)))
    light = b.add_material(MaterialSpec(M.LIGHT, emissive=(15.0, 15.0, 15.0)))
    s = 50.0
    b.add_quad_uv((-s, -s, -s), (2 * s, 0, 0), (0, 0, 2 * s), white)
    b.add_quad_uv((-s, s, -s), (0, 0, 2 * s), (2 * s, 0, 0), white)
    b.add_quad_uv((-s, -s, s), (2 * s, 0, 0), (0, 2 * s, 0), white)
    b.add_quad_uv((-s, -s, -s), (0, 2 * s, 0), (0, 0, 2 * s), red)
    b.add_quad_uv((s, -s, -s), (0, 0, 2 * s), (0, 2 * s, 0), green)
    b.add_quad_uv((-15, s - 0.5, -15), (30, 0, 0), (0, 0, 30), light)
    b.add_sphere((0, -35, 10), 15.0, white)
    b.add_camera(Camera.create(origin=(0.0, 0.0, -145.0),
                               aperture_size=0.0))
    return b


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--out", default="/tmp/recover_cam")
    p.add_argument("--coarse-spp", type=int, default=256,
                   help="spp of the 16x16 coarse stage (the lane-level "
                        "loss trades patch pooling for sample count)")
    p.add_argument("--fine-spp", type=int, default=16)
    p.add_argument("--target-frames", type=int, default=48,
                   help="frames averaged into the target (its residual "
                        "noise shifts the product-loss optimum)")
    p.add_argument("--lr-coarse", type=float, default=0.4)
    p.add_argument("--lr-fine", type=float, default=0.05)
    p.add_argument("--grad-frames", type=int, default=8,
                   help="fused-kernel calls averaged per optimizer step: "
                        "the lane-level product loss lacks the patch "
                        "pooling that gave the planar objective its "
                        "gradient SNR, so adam's normalized steps random-"
                        "walk the weak lateral coordinates without it")
    args = p.parse_args(argv)

    import optax

    builder = build_scene()
    scene = builder.compile()
    true_cam = builder.cameras[0]
    cfg = RenderConfig(width=128, height=128, spp=2, max_depth=3)
    img_fn = make_image_fn(scene, cfg,
                           z_far=float(np.asarray(true_cam.z_far)))
    assert img_fn is not None
    table = scene.materials

    def render(camera, seed, f0, frames=6):
        acc = 0.0
        for f in range(frames):
            img, _ = img_fn(table, camera, seed, f0 + f, 0, cfg.height)
            acc = acc + img
        return acc / frames

    # Perturb: shifted origin (|error| 16.6 world units).  Only the origin
    # rows of the 9-vector optimize; a mask freezes target/fov/lens so the
    # problem matches the round-4 example exactly.
    cvec0 = camera_pvec(true_cam)
    start = cvec0.at[0:3].set(jnp.asarray([6.0, -5.0, -160.0]))
    params = {"camera": start}
    mask = jnp.zeros(9).at[0:3].set(1.0)

    # Resolution pyramid: the coarse stage renders 16x16 (the fused-kernel
    # form of 8x8-pooled residuals), the fine stage full 128x128.  spp
    # rises at low res to keep lane counts (and MC noise) comparable.
    # Each stage renders its OWN target at the stage resolution: the
    # reference's (w-1)-denominator pixel mapping (engine.cpp:205-216)
    # means a 16x16 grid does NOT align with 8x8-pooled 128x128 blocks
    # (centers shift by up to ~4 px of signal — enough to bias the pose).
    def stage(k, spp):
        scfg = RenderConfig(width=cfg.width // k, height=cfg.height // k,
                            spp=spp, max_depth=cfg.max_depth)
        fused = make_fused_loss_grad_fn(scene, true_cam, scfg,
                                        fields=("camera",))
        assert fused is not None
        s_img = make_image_fn(scene, scfg,
                              z_far=float(np.asarray(true_cam.z_far)))

        def render_t(f):
            img, _ = s_img(table, true_cam, 3, f, 0, scfg.height)
            return img

        frames = max(1, args.target_frames // max(1, spp // cfg.spp))
        tgt = jax.jit(lambda: sum(render_t(f) for f in range(frames))
                      / frames)()
        return fused, tgt, scfg

    # Factor-2 ladder: each stage converges to sub-pixel AT ITS OWN
    # resolution, which is ~1 px at the next stage's — inside its basin.
    # A direct 16 -> 128 jump hands off ~5 px of error to a loss whose
    # unpooled basin is ~1 px (measured stall at |err| ~15, r5 probe 9).
    ladder = [(8, args.coarse_spp, args.lr_coarse),
              (4, max(args.fine_spp, args.coarse_spp // 2), 0.3),
              (2, max(args.fine_spp, args.coarse_spp // 8), 0.2),
              (1, args.fine_spp, args.lr_fine)]
    bounds = [int(args.iters * f) for f in (0.35, 0.55, 0.8)]
    sched = optax.join_schedules(
        [optax.constant_schedule(lr) for _, _, lr in ladder], bounds)
    opt = optax.adam(sched)
    opt_state = opt.init(params)
    init_state = jax.jit(opt.init)

    K = args.grad_frames

    def make_step(fused, tgt, scfg):
        def step(prm, opt_state, f0):
            loss = 0.0
            gacc = jnp.zeros(9)
            for j in range(K):
                l_j, g_j, _segs = fused(prm, tgt, 7, f0 + j, 0,
                                        scfg.height)
                loss = loss + l_j / K
                gacc = gacc + g_j["camera"] / K
            g = {"camera": gacc * mask}
            updates, opt_state = opt.update(g, opt_state, prm)
            prm = jax.tree.map(lambda p, u: p + u, prm, updates)
            return prm, opt_state, loss

        return jax.jit(step)

    steps = [make_step(*stage(k, spp)) for k, spp, _ in ladder]

    t0 = time.time()
    prev_idx = 0
    for it in range(args.iters):
        idx = sum(it >= b for b in bounds)
        if idx != prev_idx:
            # Fresh adam moments per stage: the loss re-scales across
            # resolutions, and a stale second moment freezes step sizes
            # for ~1/(1-beta2) iterations (measured stall, r5).
            opt_state = init_state(params)
            prev_idx = idx
        params, opt_state, loss = steps[idx](params, opt_state,
                                             it * 2 * K + 1)
        if it % 20 == 0 or it == args.iters - 1:
            oe = float(jnp.linalg.norm(
                params["camera"][0:3] - jnp.asarray(true_cam.origin)))
            print(f"iter {it:4d}  loss {float(loss):+.5f}  "
                  f"|origin err| {oe:6.2f}  ({time.time()-t0:.1f}s)",
                  flush=True)

    err_vec = np.asarray(params["camera"][0:3]) - np.asarray(true_cam.origin)
    oe = float(np.linalg.norm(err_vec))
    lateral = float(np.linalg.norm(err_vec[:2]))
    # 1 world unit of lateral offset ≈ 0.44 px at this distance/fov — the
    # residual sits at the 2spp Monte-Carlo noise floor of the loss.
    print(f"final origin error {oe:.2f} world units (started 16.6): "
          f"lateral (x,y) {lateral:.2f} (~{lateral*0.44:.1f} px image "
          f"offset), view-axis z {err_vec[2]:+.2f} (started -15)")

    cam = true_cam._replace(origin=params["camera"][0:3])
    final = jax.jit(render)(cam, 11, 40)
    img_u8 = np.clip(np.asarray(final) ** (1 / 2.2), 0, 1) * 255
    write_image(f"{args.out}_render.png", img_u8.astype(np.uint8)[::-1])
    print(f"wrote {args.out}_render.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
