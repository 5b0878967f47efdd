"""Fused Pallas fwd+bwd tracer (ops/pallas_grad.py), interpret mode on CPU.

The custom-VJP tracer must reproduce the planar replay's radiance AND its
material-table gradients exactly — the planar path's gradients are
themselves FD-verified (tests/test_diff_path.py), so agreement here pins
the in-kernel adjoint to finite differences transitively.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.ops.diff_path import make_image_fn
from fspt_tpu.ops.pallas_grad import (
    make_grad_image_fn,
    make_grad_path_tracer,
    pack_params,
    unpack_params,
)

from conftest import build_cornell_box


def _setup(with_specular=True, **cfg_kw):
    b = build_cornell_box(with_specular=with_specular)
    scene = b.compile()
    cam = b.cameras[0]
    cfg = RenderConfig(**cfg_kw)
    return scene, cam, cfg


def test_grad_tracer_matches_planar_forward_and_grads():
    scene, cam, cfg = _setup(width=16, height=16, spp=2, max_depth=4)
    gi = make_grad_image_fn(scene, cam, cfg)
    di = make_image_fn(scene, cfg, z_far=float(np.asarray(cam.z_far)))
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}

    def loss_g(p):
        img, segs = gi(p, 5, 0, 0, cfg.height)
        return jnp.mean(img ** 2), (img, segs)

    def loss_d(p):
        table = scene.materials._replace(**p)
        img, segs = di(table, cam, 5, 0, 0, cfg.height)
        return jnp.mean(img ** 2), (img, segs)

    (vg, (ig, sg)), gg = jax.value_and_grad(loss_g, has_aux=True)(params)
    (vd, (idm, sd)), gd = jax.value_and_grad(loss_d, has_aux=True)(params)
    np.testing.assert_allclose(float(vg), float(vd), rtol=1e-6)
    assert int(sg) == int(sd)
    np.testing.assert_allclose(np.asarray(ig), np.asarray(idm),
                               rtol=1e-4, atol=1e-5)
    for k in gg:
        np.testing.assert_allclose(np.asarray(gg[k]), np.asarray(gd[k]),
                                   rtol=1e-3, atol=1e-7, err_msg=k)


def test_grad_tracer_band_offsets_cover_frame():
    """Band-split gradients sum to the full-frame gradient (the sharding /
    banding invariant the 1080p bench relies on)."""
    scene, cam, cfg = _setup(with_specular=False,
                             width=16, height=8, spp=1, max_depth=3)
    gi = make_grad_image_fn(scene, cam, cfg)
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}

    def band_loss(p, y0, rows):
        img, _ = gi(p, 5, 0, y0, rows)
        return jnp.sum(img ** 2)

    g_full = jax.grad(lambda p: band_loss(p, 0, 8))(params)
    g_a = jax.grad(lambda p: band_loss(p, 0, 4))(params)
    g_b = jax.grad(lambda p: band_loss(p, 4, 4))(params)
    for k in g_full:
        np.testing.assert_allclose(
            np.asarray(g_a[k]) + np.asarray(g_b[k]), np.asarray(g_full[k]),
            rtol=1e-4, atol=1e-7, err_msg=k)


def test_grad_tracer_glow_field_and_pack_roundtrip():
    from fspt_tpu import materials as M
    from fspt_tpu.materials import MaterialSpec

    b = build_cornell_box()
    glow = b.add_material(MaterialSpec(M.GLOW, diffuse=(0.4, 0.3, 0.2),
                                       param=0.5, glow=(1.5, 0.5, 0.25)))
    b.add_sphere((0.0, -20.0, -10.0), 8.0, glow)
    scene = b.compile()
    cam = b.cameras[0]
    cfg = RenderConfig(width=12, height=12, spp=1, max_depth=3)

    tracer = make_grad_path_tracer(scene, cam, cfg,
                                   fields=("diffuse", "glow"))
    params = {"diffuse": scene.materials.diffuse,
              "glow": scene.materials.glow}
    pvec = pack_params(params, tracer.fields)
    back = unpack_params(pvec, tracer.mats, tracer.fields)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(params[k]))

    def loss(pv):
        out = tracer(pv, 3, 0)
        return jnp.mean(out.radiance ** 2)

    g = jax.grad(loss)(pvec)
    gd = unpack_params(g, tracer.mats, tracer.fields)
    assert np.isfinite(np.asarray(g)).all()
    # The glow sphere's glow column must carry signal.
    assert np.abs(np.asarray(gd["glow"])).max() > 0.0


def test_grad_tracer_respects_specialization_envelope():
    import numpy as np_

    b = build_cornell_box()
    from fspt_tpu.materials import DIFFUSE, MaterialSpec
    tex = b.add_texture(np_.ones((4, 4, 3), np_.float32))
    m = b.add_material(MaterialSpec(DIFFUSE, diffuse=(1, 1, 1), tex_id=tex))
    b.add_sphere((0, 0, 0), 1.0, m)
    scene = b.compile()
    cfg = RenderConfig(width=8, height=8)
    assert make_grad_path_tracer(scene, b.cameras[0], cfg) is None


def test_affine_grad_matches_planar_forward_and_grads():
    """Affine-deferred parameter transfer (make_affine_grad_image_fn):
    forward radiance and diffuse/emissive gradients match the planar
    replay (itself FD-verified) — on a scene exercising diffuse, light,
    mirror and metal rows."""
    from fspt_tpu.ops.pallas_grad import make_affine_grad_image_fn

    scene, cam, cfg = _setup(width=16, height=16, spp=2, max_depth=4)
    gi = make_affine_grad_image_fn(scene, cam, cfg)
    assert gi is not None
    di = make_image_fn(scene, cfg, z_far=float(np.asarray(cam.z_far)))
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}

    def loss_g(p):
        img, segs = gi(p, 5, 0, 0, cfg.height)
        return jnp.mean(img ** 2), (img, segs)

    def loss_d(p):
        table = scene.materials._replace(**p)
        img, segs = di(table, cam, 5, 0, 0, cfg.height)
        return jnp.mean(img ** 2), (img, segs)

    (vg, (ig, sg)), gg = jax.value_and_grad(loss_g, has_aux=True)(params)
    (vd, (idm, sd)), gd = jax.value_and_grad(loss_d, has_aux=True)(params)
    assert int(sg) == int(sd)
    np.testing.assert_allclose(np.asarray(ig), np.asarray(idm),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(vg), float(vd), rtol=1e-5)
    for k in gg:
        np.testing.assert_allclose(np.asarray(gg[k]), np.asarray(gd[k]),
                                   rtol=1e-3, atol=1e-7, err_msg=k)


def test_affine_grad_textured_scene_fd():
    """Textured scenes get fused-speed gradients (VERDICT r3 #4a): the
    texel-buffer gradient of a textured-diffuse scene matches finite
    differences, and the forward matches the deferred megakernel."""
    from fspt_tpu import Camera, SceneBuilder
    from fspt_tpu import materials as M
    from fspt_tpu.materials import MaterialSpec
    from fspt_tpu.ops.pallas_grad import make_affine_grad_image_fn
    from fspt_tpu.ops.pallas_path import make_camera_path_tracer

    b = SceneBuilder()
    tex = np.stack(np.meshgrid(np.linspace(0.2, 0.9, 8),
                               np.linspace(0.3, 0.8, 8))[:1] * 3,
                   axis=-1).reshape(8, 8, 3).astype(np.float32)
    tid = b.add_texture(tex)
    mat = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(1, 1, 1),
                                      tex_id=tid, tex_scale=1.0))
    light = b.add_material(MaterialSpec(M.LIGHT, emissive=(9.0, 9.0, 9.0)))
    sky = b.add_material(MaterialSpec(M.LIGHT, emissive=(0.1, 0.2, 0.3)))
    b.set_sky(sky)
    b.add_quad_uv((-40, -10, -40), (80, 0, 0), (0, 0, 80), mat)
    b.add_quad_uv((-15, 30, -15), (30, 0, 0), (0, 0, 30), light)
    b.add_camera(Camera.create(origin=(0, 20, -70), target=(0, -5, 0),
                               aperture_size=0.0))
    scene = b.compile()
    cam = b.cameras[0]
    cfg = RenderConfig(width=12, height=12, spp=2, max_depth=3)

    gi = make_affine_grad_image_fn(scene, cam, cfg)
    assert gi is not None

    # Forward parity with the texture-deferred megakernel.
    tracer = make_camera_path_tracer(scene, cam, cfg)
    out = tracer(5, 0)
    ref_img = np.asarray(out.radiance).reshape(12, 12, 2, 3).mean(axis=2)
    img, segs = gi({}, 5, 0, 0, cfg.height)
    np.testing.assert_allclose(np.asarray(img), ref_img, rtol=1e-4,
                               atol=1e-5)
    assert int(segs) == int(out.segments)

    # Texel gradient vs FD.
    texels0 = scene.textures.texels

    def loss(texels):
        img, _ = gi({"texels": texels}, 5, 0, 0, cfg.height)
        return jnp.mean(img ** 2)

    g = jax.grad(loss)(texels0)
    gn = np.asarray(g)
    # Probe the largest-gradient texel with central differences.
    ti, tc = np.unravel_index(np.abs(gn).argmax(), gn.shape)
    eps = 1e-2
    dv = np.zeros_like(np.asarray(texels0))
    dv[ti, tc] = eps
    fd = (float(loss(texels0 + dv)) - float(loss(texels0 - dv))) / (2 * eps)
    np.testing.assert_allclose(float(gn[ti, tc]), fd, rtol=2e-2,
                               atol=1e-6)


def test_fused_loss_grad_matches_two_kernel():
    """The one-kernel dual-buffer loss+grad equals the explicit
    value_and_grad of the same lane-level loss through the custom-VJP
    tracer pair."""
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn

    scene, cam, cfg = _setup(width=16, height=12, spp=2, max_depth=3)
    fused = make_fused_loss_grad_fn(scene, cam, cfg)
    assert fused is not None
    tracer = make_grad_path_tracer(scene, cam, cfg)
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}
    rng = np.random.default_rng(0)
    target = rng.random((cfg.height, cfg.width, 3)).astype(np.float32)
    tgt_lane = jnp.repeat(
        jnp.asarray(target).reshape(-1, 3), cfg.spp, axis=0)

    def ref_loss(p, f0):
        pvec = pack_params(p, tracer.fields)
        a = tracer(pvec, 5, f0 * cfg.spp).radiance
        b = tracer(pvec, 5, (f0 + 10007) * cfg.spp).radiance
        return jnp.mean((a - tgt_lane) * (b - tgt_lane))

    ref_v, ref_g = jax.value_and_grad(ref_loss)(params, 3)
    loss, grads, segs = fused(params, jnp.asarray(target), 5, 3, 0,
                              cfg.height)
    np.testing.assert_allclose(float(loss), float(ref_v), rtol=1e-5)
    assert int(segs) > 0
    for k in grads:
        np.testing.assert_allclose(np.asarray(grads[k]),
                                   np.asarray(ref_g[k]),
                                   rtol=1e-4, atol=1e-8, err_msg=k)


def test_fused_loss_grad_backward_modes_agree():
    """The three backward constructions — in-kernel affine fold vjp,
    per-bounce-remat chain, whole-chain vjp — produce the same loss,
    gradients (up to float re-association), and segment count."""
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn

    # depth 3, not 4: each extra unrolled bounce roughly doubles the
    # interpret-mode whole-chain vjp's CPU compile (minutes per kernel).
    scene, cam, cfg = _setup(width=16, height=12, spp=2, max_depth=3)
    f_af = make_fused_loss_grad_fn(scene, cam, cfg, affine=True)
    f_rm = make_fused_loss_grad_fn(scene, cam, cfg, affine=False, remat=True)
    f_un = make_fused_loss_grad_fn(scene, cam, cfg, affine=False, remat=False)
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}
    rng = np.random.default_rng(1)
    target = jnp.asarray(
        rng.random((cfg.height, cfg.width, 3)).astype(np.float32))

    l_un, g_un, s_un = f_un(params, target, 9, 2, 0, cfg.height)
    for name, fn in (("affine", f_af), ("remat", f_rm)):
        l, g, s = fn(params, target, 9, 2, 0, cfg.height)
        np.testing.assert_allclose(float(l), float(l_un), rtol=1e-5,
                                   err_msg=name)
        assert int(s) == int(s_un), name
        for k in g:
            np.testing.assert_allclose(np.asarray(g[k]),
                                       np.asarray(g_un[k]),
                                       rtol=1e-4, atol=1e-8,
                                       err_msg=f"{name}:{k}")


def test_fused_loss_grad_affine_rejects_scalar_fields():
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn
    import pytest

    scene, cam, cfg = _setup(width=16, height=8, spp=1, max_depth=2)
    with pytest.raises(ValueError):
        make_fused_loss_grad_fn(scene, cam, cfg,
                                fields=("diffuse", "param"), affine=True)
    # auto mode silently falls back to the remat chain for scalar fields.
    assert make_fused_loss_grad_fn(scene, cam, cfg,
                                   fields=("diffuse", "param")) is not None


def test_fused_loss_camera_gradient_matches_planar():
    """Camera-pose cotangents from the fused loss kernel (traced in-kernel
    raygen + whole-chain / per-bounce-remat vjp) equal the planar XLA
    replay's AD of the identical lane-level loss — the planar camera
    gradient is the baseline examples/recover_camera.py trains with."""
    from fspt_tpu.camera import Camera
    from fspt_tpu.ops.diff_path import make_diff_path
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn
    from fspt_tpu.ops.pallas_path import camera_pvec

    b = build_cornell_box(with_specular=True)
    scene = b.compile()
    # Thin-lens camera: aperture > 0 exercises the DoF code, so the
    # gradient covers aperture/focal_depth too.
    cam = Camera.create(origin=(3.0, -2.0, -140.0), target=(1.0, 0.5, 0.0),
                        aperture_size=1.5, focal_depth=120.0)
    # Small config: the whole-chain camera vjp compile dominates suite
    # wall time in interpret mode (minutes per (remat, config) pair).
    cfg = RenderConfig(width=12, height=8, spp=1, max_depth=2)
    rng = np.random.default_rng(2)
    target = rng.random((cfg.height, cfg.width, 3)).astype(np.float32)
    tgt_lane = jnp.repeat(jnp.asarray(target).reshape(-1, 3), cfg.spp,
                          axis=0)
    planar = make_diff_path(scene, cfg,
                            z_far=float(np.asarray(cam.z_far)))

    def ref_loss(cvec, f0):
        c = cam._replace(origin=cvec[0:3], target=cvec[3:6], fov_y=cvec[6],
                         aperture_size=cvec[7], focal_depth=cvec[8])
        a = planar(scene.materials, c, 5, f0 * cfg.spp).radiance
        bb = planar(scene.materials, c, 5, (f0 + 10007) * cfg.spp).radiance
        return jnp.mean((a - tgt_lane) * (bb - tgt_lane))

    cvec = camera_pvec(cam)
    ref_v, ref_g = jax.value_and_grad(ref_loss)(cvec, 3)

    for remat in (False, True):
        fused = make_fused_loss_grad_fn(scene, cam, cfg, fields=("camera",),
                                        remat=remat)
        assert fused is not None
        loss, grads, segs = fused({"camera": cvec}, jnp.asarray(target),
                                  5, 3, 0, cfg.height)
        np.testing.assert_allclose(float(loss), float(ref_v), rtol=1e-5,
                                   err_msg=f"remat={remat}")
        assert int(segs) > 0
        np.testing.assert_allclose(np.asarray(grads["camera"]),
                                   np.asarray(ref_g), rtol=2e-3, atol=1e-7,
                                   err_msg=f"remat={remat}")


def test_fused_loss_joint_material_camera_fields():
    """One front door: material columns and the camera 9-vector recover
    through the SAME fused kernel call; material grads must match the
    camera-free kernel exactly (raygen refactor must not change streams)."""
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn
    from fspt_tpu.ops.pallas_path import camera_pvec

    scene, cam, cfg = _setup(width=16, height=8, spp=1, max_depth=2)
    rng = np.random.default_rng(3)
    target = jnp.asarray(
        rng.random((cfg.height, cfg.width, 3)).astype(np.float32))
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive,
              "camera": camera_pvec(cam)}
    joint = make_fused_loss_grad_fn(
        scene, cam, cfg, fields=("diffuse", "emissive", "camera"))
    l1, g1, s1 = joint(params, target, 9, 2, 0, cfg.height)
    assert set(g1) == {"diffuse", "emissive", "camera"}
    assert np.all(np.isfinite(np.asarray(g1["camera"])))

    base = make_fused_loss_grad_fn(scene, cam, cfg, affine=False)
    l2, g2, s2 = base({k: params[k] for k in ("diffuse", "emissive")},
                      target, 9, 2, 0, cfg.height)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    assert int(s1) == int(s2)
    for k in g2:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-4, atol=1e-8, err_msg=k)
