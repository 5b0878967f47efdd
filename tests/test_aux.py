"""Auxiliary subsystems: interactive session, multihost scaling, profiling."""

import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.interactive import RenderSession, trace_range
from fspt_tpu.parallel import multihost
from fspt_tpu.utils import profiling

from conftest import build_cornell_box


def test_render_session_orbit_focus_refine():
    b = build_cornell_box()
    cfg = RenderConfig(width=16, height=12, spp=1, max_depth=2)
    s = RenderSession(b, cfg, seed=3)

    segs = s.refine(2)
    assert segs > 0 and s.frame == 2
    img1 = s.snapshot()
    assert img1.shape == (12, 16, 3) and img1.dtype == np.uint8

    # Orbit resets accumulation and moves the camera.
    old_origin = np.asarray(s.camera.origin)
    s.orbit(0.3, 0.1)
    assert s.frame == 0
    assert not np.allclose(np.asarray(s.camera.origin), old_origin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(s.camera.origin) - np.asarray(s.camera.target)),
        np.linalg.norm(old_origin - np.asarray(s.camera.target)), rtol=1e-4)

    # Click-to-focus sets focal_depth to the probed distance (TraceRange).
    d = s.focus_at(8, 6)
    assert 50.0 < d < 250.0
    assert float(s.camera.focal_depth) == d

    # Fast-render preview mode re-jits with the fast config.
    s.set_fast_render(True)
    s.refine(1)
    s.set_fast_render(False)


def test_trace_range_miss_returns_zfar():
    from fspt_tpu.camera import Camera
    from fspt_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    b.add_camera(Camera.create(aperture_size=0.0))
    scene = b.compile()
    d = trace_range(scene, b.cameras[0], 8, 8, 4, 4)
    assert float(d) == float(b.cameras[0].z_far)


def test_multihost_scaling_harness():
    b = build_cornell_box()
    scene = b.compile()
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=2)
    rows = multihost.measure_scaling(scene, b.cameras[0], cfg,
                                     device_counts=[1, 2, 4, 8], frames=2)
    assert [r["devices"] for r in rows] == [1, 2, 4, 8]
    assert rows[0]["efficiency"] == 1.0
    for r in rows:
        assert r["rays_per_sec"] > 0


def test_profiling_metrics():
    t = profiling.FrameTimer()
    with t.frame():
        t.add_segments(1000)
    assert t.frames == 1 and t.segments == 1000
    assert t.mrays_per_sec > 0

    m = profiling.occupancy_metrics([100, 60, 20], n_lanes=100)
    assert m["segments"] == 180
    np.testing.assert_allclose(m["bounce_occupancy"], [1.0, 0.6, 0.2])
    assert 0 < m["mean_occupancy"] < 1
