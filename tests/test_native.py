"""Native (C++) host components vs. their NumPy references."""

import numpy as np
import pytest

from fspt_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_bvh_identical_to_numpy():
    from fspt_tpu.ops.bvh import _build_bvh_numpy

    rs = np.random.RandomState(3)
    n = 5000
    v0 = rs.uniform(-40, 40, (n, 3)).astype(np.float32)
    v1 = v0 + rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    v2 = v0 + rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    for max_leaf in (4, 128):
        nat = native.build_bvh(v0, v1, v2, max_leaf)
        ref = _build_bvh_numpy(v0, v1, v2, max_leaf)
        for a, b, name in zip(nat, ref,
                              ["order", "bmin", "bmax", "first", "count", "miss"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)


def test_native_obj_identical_to_numpy(tmp_path):
    from fspt_tpu.scene.mesh import parse_obj

    obj = tmp_path / "m.obj"
    obj.write_text(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 0 0 1\n"
        "vn 0 0 1\nvn 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"  # quad → fan
        "f -1//-1 -2// -3\n"  # negative indices, empty specs
        "f 1 2 5\n"  # plain vertex indices
    )
    a = native.parse_obj(str(obj))
    b = parse_obj(str(obj))
    for k in ("vertices", "normals", "texcoords", "faces"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_native_used_by_build_bvh():
    """ops.bvh.build_bvh picks up the native builder when available."""
    from fspt_tpu.ops.bvh import build_bvh

    rs = np.random.RandomState(1)
    v0 = rs.uniform(-10, 10, (300, 3)).astype(np.float32)
    v1 = v0 + 1.0
    v2 = v0 + np.array([0, 1, 0], np.float32)
    bvh = build_bvh(v0, v1, v2)
    assert bvh.n_nodes > 1
    assert sorted(np.asarray(bvh.tri_id).tolist()) == list(range(300))
