"""Round-5 probe 13: localize the TPU-only camera-gradient divergence.

At the probe-12 config (pinhole 16x16, depth 3), one frame:
  cpu_planar   — XLA planar AD on host CPU (ground truth; matches the
                 fused kernel bit-wise in interpret mode).
  tpu_planar   — same planar graph on the chip.
  tpu_fused_wc — fused loss kernel, whole-chain in-kernel vjp.
  tpu_fused_rm — fused loss kernel, per-bounce remat.
Sweep spp in {2, 8, 64} and block_rows {16, 32} to find the knob that
flips the fused gradient.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from recover_camera import build_scene

    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.diff_path import make_diff_path
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn
    from fspt_tpu.ops.pallas_path import camera_pvec

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    W = H = 16
    builder = build_scene()
    scene = builder.compile()
    cam = builder.cameras[0]
    cv = camera_pvec(cam).at[0:3].set(jnp.asarray([6.0, -5.0, -160.0]))

    for spp in (2, 8, 64):
        cfg = RenderConfig(width=W, height=H, spp=spp, max_depth=3)
        rng = np.random.default_rng(5)
        tgt = jnp.asarray(rng.random((H, W, 3)).astype(np.float32)) * 0.3
        tgt_lane = jnp.repeat(tgt.reshape(-1, 3), spp, axis=0)
        planar = make_diff_path(scene, cfg,
                                z_far=float(np.asarray(cam.z_far)))
        tbl = scene.materials

        def ref_loss(cvec, f0):
            c = cam._replace(origin=cvec[0:3], target=cvec[3:6],
                             fov_y=cvec[6], aperture_size=cvec[7],
                             focal_depth=cvec[8])
            a = planar(tbl, c, 7, f0 * spp).radiance
            b = planar(tbl, c, 7, (f0 + 10007) * spp).radiance
            return jnp.mean((a - tgt_lane) * (b - tgt_lane))

        vg = jax.value_and_grad(ref_loss)
        with jax.default_device(cpu):
            _, g_cpu = jax.jit(vg)(cv, 3)
            g_cpu = np.asarray(g_cpu)
        with jax.default_device(tpu):
            _, g_tpu = jax.jit(vg)(cv, 3)
            g_tpu = np.asarray(g_tpu)
        log(f"[spp={spp}] cpu_planar ={g_cpu[:7]}")
        log(f"[spp={spp}] tpu_planar ={g_tpu[:7]}  "
            f"maxrel={np.max(np.abs(g_tpu-g_cpu)[:7]/(np.abs(g_cpu)[:7]+1e-10)):.3f}")
        for label, kw in (("wc", dict(remat=False)),
                          ("rm", dict(remat=True)),
                          ("wc_br32", dict(remat=False, block_rows=32))):
            fused = make_fused_loss_grad_fn(scene, cam, cfg,
                                            fields=("camera",), **kw)
            _, g, _ = jax.jit(lambda c, f0, fused=fused: fused(
                {"camera": c}, tgt, 7, f0, 0, H))(cv, 3)
            g = np.asarray(g["camera"])
            log(f"[spp={spp}] tpu_fused_{label}={g[:7]}  "
                f"maxrel={np.max(np.abs(g-g_cpu)[:7]/(np.abs(g_cpu)[:7]+1e-10)):.3f}")


if __name__ == "__main__":
    main()
