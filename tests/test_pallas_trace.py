"""Scene-specialized Pallas megakernel vs. the XLA brute-force intersector.

Runs the kernel in interpreter mode on CPU; same kernel logic compiles to
Mosaic on TPU (exercised by bench.py).
"""

import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.ops.intersect import intersect_scene
from fspt_tpu.ops.pallas_trace import make_pallas_intersector
from fspt_tpu.camera import generate_rays
from fspt_tpu.render import integrator

from conftest import assert_images_close, build_cornell_box


def _random_rays(n, seed=0, spread=200.0):
    rs = np.random.RandomState(seed)
    start = rs.uniform(-60, 60, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(start), jnp.asarray(d * spread)


def test_pallas_matches_xla_on_random_rays():
    builder = build_cornell_box(with_specular=True)
    scene = builder.compile()
    fn = make_pallas_intersector(scene.geometry)
    assert fn is not None
    start, seg = _random_rays(1000)
    h_ref = intersect_scene(scene.geometry, start, seg)
    h_pal = fn(start, seg)
    np.testing.assert_array_equal(np.asarray(h_ref.hit), np.asarray(h_pal.hit))
    np.testing.assert_allclose(np.asarray(h_ref.t), np.asarray(h_pal.t),
                               rtol=1e-5, atol=1e-7)
    m = np.asarray(h_ref.hit)
    np.testing.assert_array_equal(np.asarray(h_ref.mat)[m], np.asarray(h_pal.mat)[m])
    np.testing.assert_array_equal(np.asarray(h_ref.prim_kind)[m],
                                  np.asarray(h_pal.prim_kind)[m])
    np.testing.assert_allclose(np.asarray(h_ref.normal)[m], np.asarray(h_pal.normal)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_ref.texcoords)[m],
                               np.asarray(h_pal.texcoords)[m], rtol=1e-4, atol=1e-5)


def test_pallas_camera_rays_full_image():
    builder = build_cornell_box()
    scene = builder.compile()
    camera = builder.cameras[0]
    fn = make_pallas_intersector(scene.geometry)
    start, seg, _, _ = generate_rays(camera, 32, 24, 1, 3, 0)
    h_ref = intersect_scene(scene.geometry, start, seg)
    h_pal = fn(start, seg)
    np.testing.assert_array_equal(np.asarray(h_ref.hit), np.asarray(h_pal.hit))
    np.testing.assert_allclose(np.asarray(h_ref.t), np.asarray(h_pal.t),
                               rtol=1e-5, atol=1e-7)


def test_render_with_pallas_intersector_matches():
    builder = build_cornell_box(with_specular=True)
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=4)
    out_ref = integrator.render_wavefront(scene, camera, cfg, 7, 0)
    fn = make_pallas_intersector(scene.geometry)
    out_pal = integrator.render_wavefront(scene, camera, cfg, 7, 0, intersector=fn)
    assert_images_close(out_ref.radiance, out_pal.radiance, rtol=1e-4,
                        atol=1e-6, frac=0.999)
    assert int(out_ref.segments) == int(out_pal.segments)


def test_triangle_scene_pallas():
    from fspt_tpu.materials import MaterialSpec, DIFFUSE
    from fspt_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    m = b.add_material(MaterialSpec(DIFFUSE, diffuse=(1, 1, 1)))
    rs = np.random.RandomState(1)
    v0 = rs.uniform(-30, 30, (20, 3)).astype(np.float32)
    v1 = v0 + rs.uniform(-10, 10, (20, 3)).astype(np.float32)
    v2 = v0 + rs.uniform(-10, 10, (20, 3)).astype(np.float32)
    b.add_triangles(v0, v1, v2, m)
    scene = b.compile()
    fn = make_pallas_intersector(scene.geometry)
    start, seg = _random_rays(500, seed=4)
    h_ref = intersect_scene(scene.geometry, start, seg)
    h_pal = fn(start, seg)
    np.testing.assert_array_equal(np.asarray(h_ref.hit), np.asarray(h_pal.hit))
    np.testing.assert_allclose(np.asarray(h_ref.t), np.asarray(h_pal.t),
                               rtol=1e-4, atol=1e-6)
