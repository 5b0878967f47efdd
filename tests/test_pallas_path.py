"""Path-tracing megakernel parity vs. the XLA wavefront integrator.

Interpreter mode on CPU; the same kernel compiles to Mosaic on TPU (bench.py)
where it is the headline forward path.  Because the in-kernel PCG matches
ops/rng.py bit-for-bit, radiance must agree to float tolerance — and the
integrator itself is oracle-verified, so this transitively pins the
megakernel to the reference semantics.
"""

import numpy as np

from fspt_tpu.camera import generate_rays
from fspt_tpu.config import RenderConfig
from fspt_tpu.ops.pallas_path import make_camera_path_tracer, make_path_tracer
from fspt_tpu.render import integrator

from conftest import build_cornell_box


def _compare(out_mk, out_ref, frac=1.0):
    close = np.isclose(np.asarray(out_mk.radiance), np.asarray(out_ref.radiance),
                       rtol=1e-4, atol=1e-5)
    assert close.mean() >= frac, close.mean()
    assert int(out_mk.segments) == int(out_ref.segments)
    np.testing.assert_array_equal(np.asarray(out_mk.aov_mat),
                                  np.asarray(out_ref.aov_mat))
    np.testing.assert_allclose(np.asarray(out_mk.aov_depth),
                               np.asarray(out_ref.aov_depth), rtol=1e-4)


def test_megakernel_matches_integrator_specular():
    b = build_cornell_box(with_specular=True)
    scene = b.compile()
    cam = b.cameras[0]
    cfg = RenderConfig(width=20, height=16, spp=2, max_depth=6)
    tracer = make_path_tracer(scene, cfg, z_far=float(np.asarray(cam.z_far)))
    start, seg, pix, smp = generate_rays(cam, cfg.width, cfg.height, cfg.spp, 7, 0)
    out_mk = tracer(start, seg, pix, smp, 7)
    out_ref = integrator.trace_radiance(scene, cfg, start, seg, pix, smp, 7, cam.z_far)
    _compare(out_mk, out_ref)


def test_camera_fused_megakernel_matches():
    b = build_cornell_box(with_specular=True)
    scene = b.compile()
    cam = b.cameras[0]
    cfg = RenderConfig(width=20, height=16, spp=2, max_depth=6)
    tracer = make_camera_path_tracer(scene, cam, cfg)
    out_mk = tracer(7, 0)
    out_ref = integrator.render_wavefront(scene, cam, cfg, 7, 0)
    _compare(out_mk, out_ref)


def test_camera_fused_with_dof_and_fog():
    b = build_cornell_box(with_fog=True)
    scene = b.compile()
    cam = b.cameras[0]._replace(aperture_size=np.float32(1.5),
                                focal_depth=np.float32(110.0))
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=4)
    tracer = make_camera_path_tracer(scene, cam, cfg)
    out_mk = tracer(3, 2)
    out_ref = integrator.render_wavefront(scene, cam, cfg, 3, 2)
    close = np.isclose(np.asarray(out_mk.radiance), np.asarray(out_ref.radiance),
                       rtol=1e-4, atol=1e-5)
    assert close.mean() >= 0.999


def test_megakernel_band_offset():
    """lane0 banding (for sharding) matches full-frame lanes."""
    b = build_cornell_box()
    scene = b.compile()
    cam = b.cameras[0]
    cfg = RenderConfig(width=16, height=8, spp=1, max_depth=3)
    tracer = make_camera_path_tracer(scene, cam, cfg)
    full = tracer(5, 0)
    half = cfg.width * cfg.height // 2
    lower = tracer(5, 0, lane0=0, n_lanes=half)
    upper = tracer(5, 0, lane0=half, n_lanes=half)
    got = np.concatenate([np.asarray(lower.radiance), np.asarray(upper.radiance)])
    np.testing.assert_array_equal(np.asarray(full.radiance), got)


def test_textured_scene_gets_deferred_tracer():
    """Textured scenes no longer fall off the megakernel (r3): they get the
    texture-deferred variant (full parity in test_textures.py); the rays-in
    tracer still declines them."""
    import numpy as np
    b = build_cornell_box()
    tex = b.add_texture(np.ones((4, 4, 3), np.float32))
    from fspt_tpu.materials import MaterialSpec, DIFFUSE
    m = b.add_material(MaterialSpec(DIFFUSE, diffuse=(1, 1, 1), tex_id=tex))
    b.add_sphere((0, 0, 0), 1.0, m)
    scene = b.compile()
    cfg = RenderConfig(width=8, height=8, spp=1)
    assert make_camera_path_tracer(scene, b.cameras[0], cfg) is not None
    assert make_path_tracer(scene, cfg) is None
