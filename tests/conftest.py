"""Test environment: force an 8-device virtual CPU mesh (SURVEY.md §4.4).

The container may register a remote-TPU PJRT plugin at interpreter startup
(before pytest loads this file), so we cannot rely on env vars alone.  JAX
backends initialize lazily, so switching the platform config here — before
any array op — still wins.  Unit tests must be hermetic and fast; TPU
execution is exercised by bench.py / the driver.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fspt_tpu import materials as M  # noqa: E402
from fspt_tpu.camera import Camera  # noqa: E402
from fspt_tpu.materials import MaterialSpec  # noqa: E402
from fspt_tpu.scene.builder import SceneBuilder  # noqa: E402


def build_cornell_box(with_specular=False, with_fog=False):
    """A Cornell-box-class scene built from reference-style primitives.

    Quads use the u,v constructor (object.cpp:191-211) because the
    normal-based one degenerates for axis-aligned ±Y normals
    (object.cpp:176-177 cross((0,±1,0),(0,1,0)) = 0 — a reference quirk we
    reproduce but avoid relying on).
    """
    b = SceneBuilder()
    white = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(0.73, 0.73, 0.73)))
    red = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(0.65, 0.05, 0.05)))
    green = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(0.12, 0.45, 0.15)))
    light = b.add_material(MaterialSpec(M.LIGHT, emissive=(15.0, 15.0, 15.0)))
    sky = b.add_material(MaterialSpec(M.LIGHT, emissive=(0.05, 0.07, 0.10)))
    b.set_sky(sky)

    s = 50.0  # half size
    b.add_quad_uv((-s, -s, -s), (2 * s, 0, 0), (0, 0, 2 * s), white)  # floor
    b.add_quad_uv((-s, s, -s), (0, 0, 2 * s), (2 * s, 0, 0), white)  # ceiling
    b.add_quad_uv((-s, -s, s), (2 * s, 0, 0), (0, 2 * s, 0), white)  # back
    b.add_quad_uv((-s, -s, -s), (0, 2 * s, 0), (0, 0, 2 * s), red)  # left
    b.add_quad_uv((s, -s, -s), (0, 0, 2 * s), (0, 2 * s, 0), green)  # right
    b.add_quad_uv((-15.0, s - 0.5, -15.0), (30.0, 0, 0), (0, 0, 30.0), light)

    if with_specular:
        mirror = b.add_material(MaterialSpec(M.MIRROR, diffuse=(0.9, 0.9, 0.9)))
        glass = b.add_material(
            MaterialSpec(M.GLASS, diffuse=(0.95, 0.95, 0.95), ior=0.75,
                         reflectivity=0.1, frost=0.0)
        )
        metal = b.add_material(MaterialSpec(M.METAL, diffuse=(0.8, 0.6, 0.2), param=0.3))
        ceramic = b.add_material(MaterialSpec(M.CERAMIC, diffuse=(0.2, 0.4, 0.8), param=0.7))
        b.add_sphere((-25.0, -35.0, 10.0), 15.0, mirror)
        b.add_sphere((25.0, -35.0, 0.0), 15.0, glass)
        b.add_sphere((0.0, -40.0, 25.0), 10.0, metal)
        b.add_cuboid((0.0, -42.0, -10.0), 12.0, 16.0, 12.0, ceramic,
                     rot_axis=(0, 1, 0), rot_angle=0.6)
    else:
        b.add_sphere((-20.0, -35.0, 10.0), 15.0, white)
        b.add_cuboid((20.0, -35.0, -5.0), 20.0, 30.0, 20.0, white)

    if with_fog:
        fogm = b.add_material(MaterialSpec(M.FOG, diffuse=(0.6, 0.6, 0.65), frost=0.5 * 1000.0))
        b.add_sphere((0.0, 0.0, 0.0), 45.0, fogm)

    cam = Camera.create(
        origin=(0.0, 0.0, -145.0),
        target=(0.0, 0.0, 0.0),
        fov_y=45.0,
        aperture_size=0.0,
        focal_depth=80.0,
    )
    b.add_camera(cam)
    return b


@pytest.fixture
def cornell():
    return build_cornell_box()


@pytest.fixture
def cornell_specular():
    return build_cornell_box(with_specular=True)


@pytest.fixture
def rng_seed():
    return 1234


def assert_images_close(a, b, rtol=1e-3, atol=1e-4, frac=1.0):
    """Assert per-pixel closeness; ``frac`` allows a small disagreeing tail."""
    a = np.asarray(a)
    b = np.asarray(b)
    close = np.isclose(a, b, rtol=rtol, atol=atol)
    ok = close.mean()
    assert ok >= frac, f"only {ok:.4%} of values close (needed {frac:.2%})"
