"""Differentiable material recovery (BASELINE.md config 4).

Renders a target Cornell image with the true material table, perturbs every
albedo and the light emission, then recovers them by gradient descent
through the differentiable wavefront renderer — rays data-parallel over the
device mesh, parameter gradients pmean-reduced (fspt_tpu/parallel/train.py).

    python examples/recover_albedo.py [--iters 200] [--out /tmp/recover]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from fspt_tpu import Camera, RenderConfig, SceneBuilder
from fspt_tpu import materials as M
from fspt_tpu.materials import MaterialSpec
from fspt_tpu.parallel import make_mesh, make_recovery_step, \
    make_sharded_render_step, sharded_framebuffer
from fspt_tpu.render import framebuffer as fb_mod
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
    b.add_quad_uv((-s, -s, s), (2 * s, 0, 0), (0, 2 * s, 0), red)
    b.add_quad_uv((-s, -s, -s), (0, 2 * s, 0), (0, 0, 2 * s), red)
    b.add_quad_uv((s, -s, -s), (0, 0, 2 * s), (0, 2 * s, 0), green)
    b.add_quad_uv((-15, s - 0.5, -15), (30, 0, 0), (0, 0, 30), light)
    b.add_sphere((0, -35, 10), 15.0, white)
    b.add_camera(Camera.create(origin=(0, 0, -145), aperture_size=0.0))
    return b


def snapshot(mesh, scene, camera, cfg, params, frames=8, seed=5):
    table = scene.materials._replace(**params)
    s = scene._replace(materials=table)
    fb = sharded_framebuffer(mesh, cfg.height, cfg.width)
    step = make_sharded_render_step(mesh, cfg)
    for f in range(frames):
        fb, _ = step(s, camera, fb, seed, f)
    return np.asarray(fb_mod.to_display(fb.mean))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--out", default="/tmp/recover")
    args = ap.parse_args()

    builder = build_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    n_dev = len(jax.devices())
    cfg = RenderConfig(width=64, height=64 - (64 % n_dev or n_dev) if 64 % n_dev else 64,
                       spp=4, max_depth=3)
    mesh = make_mesh()

    # Target: accumulate a well-converged image with the true parameters.
    fb = sharded_framebuffer(mesh, cfg.height, cfg.width)
    render = make_sharded_render_step(mesh, cfg)
    for f in range(16):
        fb, _ = render(scene, camera, fb, 5, f)
    target = fb.mean
    jax.block_until_ready(target)

    true_diffuse = np.asarray(scene.materials.diffuse)
    true_emissive = np.asarray(scene.materials.emissive)
    rng = np.random.RandomState(0)
    params = {
        "diffuse": jax.numpy.asarray(
            np.clip(true_diffuse * rng.uniform(0.3, 1.7, true_diffuse.shape), 0, 1),
            jax.numpy.float32),
        "emissive": jax.numpy.asarray(true_emissive * 0.4, jax.numpy.float32),
    }
    print("initial albedo error:",
          float(np.abs(np.asarray(params["diffuse"]) - true_diffuse).max()))

    import optax

    # Adam handles the albedo (~0.7) vs emission (~15) scale mismatch.
    step = make_recovery_step(mesh, cfg, param_names=("diffuse", "emissive"),
                              optimizer=optax.adam(args.lr))
    opt_state = step.init(params)
    t0 = time.time()
    for it in range(args.iters):
        params, opt_state, loss = step(params, opt_state, scene, camera,
                                       target, 5, it)
        if it % 25 == 0 or it == args.iters - 1:
            print(f"iter {it:4d}  loss {float(loss):.6f}")
    jax.block_until_ready(params)
    print(f"{args.iters} recovery iters in {time.time()-t0:.1f}s "
          f"on {mesh.devices.size} device(s)")

    # Success metric (BASELINE config 4): the *image* matches. Parameter
    # errors are diagnostics only — albedo×emission products are what the
    # image constrains (gauge freedom), so individual parameters can sit on
    # the matching manifold away from their true values.
    rec_img = snapshot(mesh, scene, camera, cfg, params, frames=16)
    tgt_img = np.asarray(fb_mod.to_display(target))
    img_err = np.abs(rec_img.astype(np.float32) - tgt_img.astype(np.float32)).mean()
    print(f"display-space image error: {img_err:.2f}/255 "
          f"({img_err / max(tgt_img.mean(), 1e-9):.1%} of mean brightness)")
    err_d = np.abs(np.asarray(params["diffuse"]) - true_diffuse)
    err_e = np.abs(np.asarray(params["emissive"]) - true_emissive)
    print("param diagnostics (gauge-ambiguous): albedo max-err",
          float(err_d.max()), "emission max-err", float(err_e.max()))

    os.makedirs(args.out, exist_ok=True)
    write_image(os.path.join(args.out, "target.png"), tgt_img[::-1])
    write_image(os.path.join(args.out, "recovered.png"), rec_img[::-1])
    print(f"wrote {args.out}/target.png and recovered.png")


if __name__ == "__main__":
    main()
