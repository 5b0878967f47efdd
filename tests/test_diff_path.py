"""Differentiable planar path replay (ops/diff_path.py).

Forward parity against the oracle-verified integrator and the megakernel
(same body, same PCG streams), and gradient-vs-finite-difference checks on
material *and camera* parameters (SURVEY.md §4.3; BASELINE rtol 1e-3 class).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.ops.diff_path import make_diff_path, make_image_fn
from fspt_tpu.render import integrator

from conftest import build_cornell_box


def _radiance_close(a, b, frac=1.0, rtol=1e-4, atol=1e-5):
    close = np.isclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)
    assert close.mean() >= frac, close.mean()


def test_planar_matches_integrator_specular():
    b = build_cornell_box(with_specular=True)
    scene = b.compile()
    cam = b.cameras[0]
    cfg = RenderConfig(width=20, height=16, spp=2, max_depth=6)
    trace = make_diff_path(scene, cfg, z_far=float(np.asarray(cam.z_far)))
    out = trace(scene.materials, cam, 7, 0)
    out_ref = integrator.render_wavefront(scene, cam, cfg, 7, 0)
    _radiance_close(out.radiance, out_ref.radiance)
    assert int(out.segments) == int(out_ref.segments)
    np.testing.assert_array_equal(np.asarray(out.aov_mat),
                                  np.asarray(out_ref.aov_mat))


def test_planar_matches_megakernel_with_dof_and_fog():
    from fspt_tpu.ops.pallas_path import make_camera_path_tracer

    b = build_cornell_box(with_fog=True)
    scene = b.compile()
    cam = b.cameras[0]._replace(aperture_size=np.float32(1.5),
                                focal_depth=np.float32(110.0))
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=4)
    mk = make_camera_path_tracer(scene, cam, cfg)
    out_mk = mk(3, 2)
    trace = make_diff_path(scene, cfg, z_far=float(np.asarray(cam.z_far)))
    out = trace(scene.materials, cam, 3, 2)
    _radiance_close(out.radiance, out_mk.radiance, frac=0.999)


def test_planar_refuses_bvh_and_textures():
    import numpy as np_

    b = build_cornell_box()
    from fspt_tpu.materials import DIFFUSE, MaterialSpec
    tex = b.add_texture(np_.ones((4, 4, 3), np_.float32))
    m = b.add_material(MaterialSpec(DIFFUSE, diffuse=(1, 1, 1), tex_id=tex))
    b.add_sphere((0, 0, 0), 1.0, m)
    scene = b.compile()
    assert make_diff_path(scene, RenderConfig(width=8, height=8)) is None


def _fd_check(loss_fn, value, ad_grad, probes, h, rtol):
    for idx in probes:
        e = np.zeros(value.shape, np.float32)
        e[idx] = h
        fd = (float(loss_fn(value + e)) - float(loss_fn(value - e))) / (2 * h)
        ad = float(ad_grad[idx])
        assert np.isfinite(ad)
        if abs(fd) < 1e-7 and abs(ad) < 1e-7:
            continue
        np.testing.assert_allclose(ad, fd, rtol=rtol, err_msg=f"index {idx}")


def test_planar_albedo_gradients_match_fd():
    b = build_cornell_box()
    scene = b.compile()
    cam = b.cameras[0]
    cfg = RenderConfig(width=8, height=8, spp=4, max_depth=3)
    img_fn = make_image_fn(scene, cfg, z_far=float(np.asarray(cam.z_far)))
    target, _ = img_fn(scene.materials, cam, 9, 1, 0, cfg.height)

    @jax.jit
    def loss_fn(diffuse):
        table = scene.materials._replace(diffuse=diffuse)
        img, _ = img_fn(table, cam, 5, 0, 0, cfg.height)
        return jnp.mean((img - target) ** 2)

    value = scene.materials.diffuse
    ad_grad = jax.jit(jax.grad(loss_fn))(value)
    probes = [(0, 0), (0, 1), (1, 0), (2, 2), (3, 1)]
    _fd_check(loss_fn, np.asarray(value), np.asarray(ad_grad), probes,
              h=1e-2, rtol=2e-3)


def test_planar_emission_gradients_match_fd():
    b = build_cornell_box()
    scene = b.compile()
    cam = b.cameras[0]
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=3)
    img_fn = make_image_fn(scene, cfg, z_far=float(np.asarray(cam.z_far)))
    target = img_fn(scene.materials, cam, 9, 1, 0, cfg.height)[0] * 0.8

    @jax.jit
    def loss_fn(emissive):
        table = scene.materials._replace(emissive=emissive)
        img, _ = img_fn(table, cam, 5, 0, 0, cfg.height)
        return jnp.mean((img - target) ** 2)

    value = scene.materials.emissive
    ad_grad = jax.jit(jax.grad(loss_fn))(value)
    probes = [(3, 0), (3, 1), (3, 2), (4, 2)]
    _fd_check(loss_fn, np.asarray(value), np.asarray(ad_grad), probes,
              h=1e-2, rtol=2e-3)


def test_planar_camera_gradients_match_fd():
    """Camera origin / fov / aperture / focal-depth grads vs FD (VERDICT r2
    weak #3).

    The smooth (AD-visible) camera dependence of a *diffuse* chain is ~zero:
    diffuse coef = albedo·(bounce_dir·normal) with both factors camera-
    independent, so FD on a diffuse box only measures discrete hit-id flips
    (silhouette terms — the edge-reparameterization's job, not AD's).  The
    continuous channel is a view-dependent BRDF, so this test probes a
    ceramic sphere on interior pixels where the FD step flips nothing.
    """
    from fspt_tpu import Camera, SceneBuilder
    from fspt_tpu import materials as M
    from fspt_tpu.materials import MaterialSpec

    b = SceneBuilder()
    cer = b.add_material(MaterialSpec(M.CERAMIC, diffuse=(0.3, 0.5, 0.7),
                                      param=0.65))
    sky = b.add_material(MaterialSpec(M.LIGHT, emissive=(0.5, 0.6, 0.8)))
    b.set_sky(sky)
    b.add_sphere((0.0, 0.0, 0.0), 20.0, cer)
    cam0 = Camera.create(origin=(0.0, 0.0, -60.0), aperture_size=1.0,
                         focal_depth=60.0)
    b.add_camera(cam0)
    scene = b.compile()
    cfg = RenderConfig(width=8, height=8, spp=16, max_depth=2)
    img_fn = make_image_fn(scene, cfg, z_far=float(np.asarray(cam0.z_far)))

    # Loss = interior-pixel radiance (every spp ray hits the sphere's
    # interior for every probe step below; 16 spp × 4 px dilutes the rare
    # lane whose glossy-lobe hemisphere selection flips under the step).
    @jax.jit
    def loss_of(cam_vec):
        cam = cam0._replace(
            origin=cam_vec[:3], fov_y=cam_vec[3], aperture_size=cam_vec[4],
            focal_depth=cam_vec[5])
        img, _ = img_fn(scene.materials, cam, 5, 0, 0, cfg.height)
        return jnp.sum(img[3:5, 3:5])

    vec = jnp.asarray(np.concatenate([
        np.asarray(cam0.origin, np.float32),
        np.asarray([cam0.fov_y, cam0.aperture_size, cam0.focal_depth],
                   np.float32)]))
    ad_grad = np.asarray(jax.jit(jax.grad(loss_of))(vec))
    assert np.isfinite(ad_grad).all() and np.abs(ad_grad).max() > 0.0

    # h = 0.5 everywhere: the f32 loss is O(5), so smaller steps put the
    # FD quotient inside rounding noise (measured: fd@0.5 matches AD to
    # <1% on every parameter; fd@0.005 is off by up to 8×).
    checked = 0
    for idx, h in [(0, 0.5), (1, 0.5), (2, 0.5), (3, 0.5), (4, 0.5),
                   (5, 0.5)]:
        e = np.zeros(vec.shape, np.float32)
        e[idx] = h
        fd = (float(loss_of(vec + e)) - float(loss_of(vec - e))) / (2 * h)
        ad = float(ad_grad[idx])
        if abs(fd) < 1e-5 and abs(ad) < 1e-5:
            continue
        np.testing.assert_allclose(ad, fd, rtol=0.1,
                                   atol=1e-4 * abs(fd) + 1e-6,
                                   err_msg=f"param {idx}")
        checked += 1
    assert checked >= 4, f"only {checked} params had measurable gradients"


def test_planar_remat_matches():
    b = build_cornell_box()
    scene = b.compile()
    cam = b.cameras[0]
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=3)
    plain = make_image_fn(scene, cfg)
    remat = make_image_fn(scene, cfg, remat=True)

    def loss(img_fn, diffuse):
        table = scene.materials._replace(diffuse=diffuse)
        img, _ = img_fn(table, cam, 5, 0, 0, cfg.height)
        return jnp.mean(img ** 2)

    v = scene.materials.diffuse
    g_plain = jax.grad(lambda d: loss(plain, d))(v)
    g_remat = jax.grad(lambda d: loss(remat, d))(v)
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_remat),
                               rtol=1e-5, atol=1e-8)
