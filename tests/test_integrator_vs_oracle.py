"""Wavefront integrator vs. the scalar NumPy oracle (SURVEY.md §4.2).

Both renderers consume identical counter-based RNG streams, so images must
match to float32 accumulation tolerance — not just statistically.
"""

import numpy as np
import jax

from fspt_tpu.config import RenderConfig
from fspt_tpu.render import framebuffer as fb_mod
from fspt_tpu.render import integrator, oracle

from conftest import assert_images_close, build_cornell_box


def _render_both(builder, cfg, seed, frames=1):
    scene = builder.compile()
    camera = builder.cameras[0]

    fb = fb_mod.create(cfg.height, cfg.width)
    step = jax.jit(
        integrator.render_step,
        static_argnames=("cfg",),
    )
    total_segments = 0
    for frame in range(frames):
        fb, segs = step(scene, camera, cfg, fb, seed, frame)
        total_segments += int(segs)
    img_wave = np.asarray(fb.mean)

    img_oracle, aux = oracle.render(builder, camera, cfg, seed, frames=frames)
    return img_wave, img_oracle, fb, aux, total_segments


def test_cornell_diffuse_matches_oracle():
    builder = build_cornell_box()
    cfg = RenderConfig(width=24, height=16, spp=2, max_depth=4)
    img_wave, img_oracle, fb, aux, segs = _render_both(builder, cfg, seed=7)
    assert_images_close(img_wave, img_oracle, rtol=2e-3, atol=2e-4, frac=0.999)
    # Segment metric agrees (no fog in this scene → exact).
    assert segs == aux["segments"]
    # AOVs: depth & material id of the last sample.
    np.testing.assert_allclose(np.asarray(fb.depth), aux["depth"], rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(fb.mat), aux["mat"])
    np.testing.assert_allclose(np.asarray(fb.normal), aux["normal"], atol=1e-4)


def test_cornell_specular_matches_oracle():
    builder = build_cornell_box(with_specular=True)
    cfg = RenderConfig(width=20, height=14, spp=2, max_depth=6)
    img_wave, img_oracle, _, _, _ = _render_both(builder, cfg, seed=11)
    assert_images_close(img_wave, img_oracle, rtol=5e-3, atol=5e-4, frac=0.995)


def test_fog_matches_oracle():
    builder = build_cornell_box(with_fog=True)
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=4)
    img_wave, img_oracle, _, _, _ = _render_both(builder, cfg, seed=3)
    assert_images_close(img_wave, img_oracle, rtol=5e-3, atol=5e-4, frac=0.995)


def test_fast_render_mode():
    builder = build_cornell_box()
    cfg = RenderConfig(width=16, height=12, spp=1, fast_render=True)
    img_wave, img_oracle, _, _, _ = _render_both(builder, cfg, seed=5)
    assert_images_close(img_wave, img_oracle, rtol=2e-3, atol=2e-4, frac=0.999)


def test_progressive_accumulation_matches():
    """Multi-frame accumulation equals the oracle's running mean."""
    builder = build_cornell_box()
    cfg = RenderConfig(width=12, height=8, spp=1, max_depth=3)
    img_wave, img_oracle, fb, _, _ = _render_both(builder, cfg, seed=13, frames=3)
    assert_images_close(img_wave, img_oracle, rtol=2e-3, atol=2e-4, frac=0.999)
    assert float(np.asarray(fb.count)[0, 0]) == 3.0


def test_depth_of_field_camera():
    builder = build_cornell_box()
    cam = builder.cameras[0]._replace(
        aperture_size=np.float32(1.5), focal_depth=np.float32(110.0)
    )
    builder.cameras[0] = cam
    cfg = RenderConfig(width=12, height=8, spp=2, max_depth=2)
    img_wave, img_oracle, _, _, _ = _render_both(builder, cfg, seed=17)
    assert_images_close(img_wave, img_oracle, rtol=2e-3, atol=2e-4, frac=0.999)


def test_light_clamp():
    """A >10-radiance light hit at depth 0 is tone-clamped (engine.cpp:148-151)."""
    from fspt_tpu import materials as M
    from fspt_tpu.camera import Camera
    from fspt_tpu.materials import MaterialSpec
    from fspt_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    hot = b.add_material(MaterialSpec(M.LIGHT, emissive=(40.0, 40.0, 40.0)))
    b.add_sphere((0, 0, 0), 20.0, hot)
    b.add_camera(Camera.create(origin=(0, 0, -100), aperture_size=0.0))
    cfg = RenderConfig(width=8, height=6, spp=1)
    img_wave, img_oracle, _, _, _ = _render_both(b, cfg, seed=1)
    assert_images_close(img_wave, img_oracle, rtol=1e-4, atol=1e-5)
    center = img_wave[3, 4]
    np.testing.assert_allclose(np.linalg.norm(center), 10.0, rtol=1e-3)
