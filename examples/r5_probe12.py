"""Round-5 probe 12: is the fused PINHOLE camera gradient wrong?

Same 16x16x256 config as probe 11, same frame, same lane-level
dual-buffer loss: the fused kernel's camera gradient and the planar
path's AD of the identical estimator must match per-frame (same RNG).
Any systematic difference is a bug in the pinhole traced raygen.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from recover_camera import build_scene

    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.diff_path import make_diff_path
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn
    from fspt_tpu.ops.pallas_path import camera_pvec

    W = H = 16
    SPP = 64
    builder = build_scene()
    scene = builder.compile()
    cam = builder.cameras[0]
    cfg = RenderConfig(width=W, height=H, spp=SPP, max_depth=3)
    fused = make_fused_loss_grad_fn(scene, cam, cfg, fields=("camera",))
    planar = make_diff_path(scene, cfg, z_far=float(np.asarray(cam.z_far)))
    tbl = scene.materials

    rng = np.random.default_rng(5)
    tgt = jnp.asarray(rng.random((H, W, 3)).astype(np.float32)) * 0.3
    tgt_lane = jnp.repeat(tgt.reshape(-1, 3), SPP, axis=0)

    cv_true = camera_pvec(cam)
    cv = cv_true.at[0:3].set(jnp.asarray([6.0, -5.0, -160.0]))

    def ref_loss(cvec, f0):
        c = cam._replace(origin=cvec[0:3], target=cvec[3:6], fov_y=cvec[6],
                         aperture_size=cvec[7], focal_depth=cvec[8])
        a = planar(tbl, c, 7, f0 * SPP).radiance
        b = planar(tbl, c, 7, (f0 + 10007) * SPP).radiance
        return jnp.mean((a - tgt_lane) * (b - tgt_lane))

    pgrad = jax.jit(jax.value_and_grad(ref_loss))
    ffn = jax.jit(lambda cvec, f0: fused({"camera": cvec}, tgt, 7, f0,
                                         0, H))
    for f0 in (3, 9):
        pv, pgr = pgrad(cv, f0)
        fl, fg, _ = ffn(cv, f0)
        log(f"[f0={f0}] loss planar={float(pv):+.6f} "
            f"fused={float(fl):+.6f}")
        log(f"  planar grad={np.asarray(pgr)}")
        log(f"  fused  grad={np.asarray(fg['camera'])}")
        rel = np.abs(np.asarray(fg["camera"]) - np.asarray(pgr)) / (
            np.abs(np.asarray(pgr)) + 1e-12)
        log(f"  rel diff={rel}")


if __name__ == "__main__":
    main()
