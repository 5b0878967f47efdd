"""Textured materials + textured sky: wavefront vs. oracle parity.

Covers the reference's tiled nearest-neighbor sampling (material.cpp:107-127),
textured lights (material.cpp:43-53), and the sphere-mapped sky
(scene.cpp:157-162) — the paths the megakernel declines (it falls back to
the pallas-intersect/XLA-shade pipeline, also covered here).
"""

import numpy as np
import jax

from fspt_tpu import materials as M
from fspt_tpu.camera import Camera
from fspt_tpu.config import RenderConfig
from fspt_tpu.materials import MaterialSpec
from fspt_tpu.ops.pallas_trace import make_pallas_intersector
from fspt_tpu.render import integrator, oracle
from fspt_tpu.scene.builder import SceneBuilder

from conftest import assert_images_close


def _checker(n=8):
    img = np.indices((n, n)).sum(0) % 2
    return np.stack([img, 1 - img, np.full_like(img, 0.5)], axis=-1).astype(np.float32)


def _build():
    b = SceneBuilder()
    tex = b.add_texture(_checker())
    sky_tex = b.add_texture((_checker(16) * 0.3).astype(np.float32))
    wall = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(0.7, 0.7, 0.7),
                                       tex_id=tex, tex_scale=0.05))
    ball = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(0.9, 0.4, 0.2),
                                       tex_id=tex, tex_scale=2.0))
    lamp = b.add_material(MaterialSpec(M.LIGHT, emissive=(10.0, 10.0, 10.0),
                                       tex_id=tex, tex_scale=1.0))
    sky = b.add_material(MaterialSpec(M.LIGHT, emissive=(0.1, 0.1, 0.2),
                                      tex_id=sky_tex, tex_scale=1.0))
    b.set_sky(sky)
    b.add_quad_uv((-50, -50, 50), (100, 0, 0), (0, 100, 0), wall)
    b.add_sphere((0, 0, 10), 18.0, ball)
    b.add_sphere((30, 30, -10), 8.0, lamp)
    b.add_camera(Camera.create(origin=(0, 0, -120), aperture_size=0.0))
    return b


def test_textured_render_matches_oracle():
    b = _build()
    scene = b.compile()
    cfg = RenderConfig(width=20, height=16, spp=2, max_depth=3)
    out = integrator.render_wavefront(scene, b.cameras[0], cfg, 13, 0)
    img = np.asarray(out.radiance).reshape(cfg.height, cfg.width, cfg.spp, 3).mean(2)
    img_oracle, _ = oracle.render(b, b.cameras[0], cfg, 13, frames=1)
    # spp=2 wavefront mean == oracle running mean over 2 samples
    assert_images_close(img, img_oracle, rtol=2e-3, atol=2e-4, frac=0.995)
    assert float(img.max()) > 0.1  # textures actually sampled


def test_textured_megakernel_matches_integrator():
    """Texture-deferred megakernel (r3): the in-kernel path trace emits the
    affine radiance structure; the XLA fold gathers texels.  Must match the
    oracle-verified integrator on a scene exercising textured diffuse,
    textured light, and textured sky."""
    from fspt_tpu.ops.pallas_path import make_camera_path_tracer

    b = _build()
    scene = b.compile()
    cfg = RenderConfig(width=20, height=16, spp=2, max_depth=4)
    tracer = make_camera_path_tracer(scene, b.cameras[0], cfg)
    assert tracer is not None
    out_mk = tracer(13, 0)
    out_ref = integrator.render_wavefront(scene, b.cameras[0], cfg, 13, 0)
    assert_images_close(out_mk.radiance, out_ref.radiance, rtol=1e-3,
                        atol=1e-5, frac=0.995)
    assert int(out_mk.segments) == int(out_ref.segments)
    np.testing.assert_array_equal(np.asarray(out_mk.aov_mat),
                                  np.asarray(out_ref.aov_mat))


def test_textured_scene_uses_pallas_intersect_path():
    """The pallas intersect + XLA shade fallback also matches."""
    b = _build()
    scene = b.compile()
    cfg = RenderConfig(width=16, height=12, spp=1, max_depth=3)
    inter = make_pallas_intersector(scene.geometry)
    assert inter is not None
    out_ref = integrator.render_wavefront(scene, b.cameras[0], cfg, 3, 0)
    out_pal = integrator.render_wavefront(scene, b.cameras[0], cfg, 3, 0,
                                          intersector=inter)
    assert_images_close(out_ref.radiance, out_pal.radiance, rtol=1e-4,
                        atol=1e-6, frac=0.999)
