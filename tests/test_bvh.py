"""BVH build + traversal vs. brute force (SURVEY.md §4.5 property test)."""

import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.ops.bvh import build_bvh, traverse_bvh
from fspt_tpu.render import integrator

from conftest import assert_images_close, build_cornell_box


def _random_tris(n, seed=0, extent=40.0):
    rs = np.random.RandomState(seed)
    v0 = rs.uniform(-extent, extent, (n, 3)).astype(np.float32)
    v1 = v0 + rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    v2 = v0 + rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    return v0, v1, v2


def _random_rays(n, seed=1):
    rs = np.random.RandomState(seed)
    start = rs.uniform(-60, 60, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(start), jnp.asarray(d * 200.0)


def _brute(v0, v1, v2, start, seg):
    """NumPy closest-hit oracle (Möller–Trumbore)."""
    e1, e2 = v1 - v0, v2 - v0
    area2 = np.linalg.norm(np.cross(e1, e2), axis=-1)
    start, seg = np.asarray(start), np.asarray(seg)
    pvec = np.cross(seg[:, None, :], e2[None])
    det = (e1[None] * pvec).sum(-1)
    ok = np.abs(det) >= 1e-5 * area2[None]
    inv = 1.0 / np.where(ok, det, 1.0)
    tvec = start[:, None, :] - v0[None]
    u = (tvec * pvec).sum(-1) * inv
    qvec = np.cross(tvec, e1[None])
    v = (seg[:, None, :] * qvec).sum(-1) * inv
    t = (e2[None] * qvec).sum(-1) * inv
    valid = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0) & (t <= 1)
    t = np.where(valid, t, 2.0)
    idx = t.argmin(axis=1)
    tb = t[np.arange(len(t)), idx]
    return tb, np.where(tb < 2.0, idx, -1)


def test_bvh_structure():
    v0, v1, v2 = _random_tris(257, seed=3)
    bvh = build_bvh(v0, v1, v2)
    m = bvh.n_nodes
    miss = np.asarray(bvh.miss)
    count = np.asarray(bvh.count)
    first = np.asarray(bvh.first)
    assert (miss <= m).all() and (miss > np.arange(m)).all()
    # Leaves partition the reordered triangle array exactly.
    leaves = count > 0
    spans = sorted(zip(first[leaves].tolist(), count[leaves].tolist()))
    pos = 0
    for f, c in spans:
        assert f == pos
        pos += c
    assert pos == 257
    assert sorted(np.asarray(bvh.tri_id).tolist()) == list(range(257))


def test_traversal_matches_brute_force():
    for n_tris, seed in ((50, 0), (500, 1), (2000, 2)):
        v0, v1, v2 = _random_tris(n_tris, seed=seed)
        bvh = build_bvh(v0, v1, v2)
        start, seg = _random_rays(256, seed=seed + 10)
        t_ref, id_ref = _brute(v0, v1, v2, np.asarray(start), np.asarray(seg))
        t_bvh, id_bvh, _, _ = traverse_bvh(bvh, start, seg)
        np.testing.assert_allclose(np.asarray(t_bvh), t_ref, rtol=1e-4, atol=1e-6)
        hit = t_ref < 2.0
        # Ids may differ only on exact-t ties; assert t equality covers those.
        same = np.asarray(id_bvh)[hit] == id_ref[hit]
        assert same.mean() > 0.99


def test_mesh_scene_render_matches_oracle():
    """Full render through the BVH path vs. the scalar oracle."""
    from fspt_tpu.render import oracle

    builder = build_cornell_box()
    v0, v1, v2 = _random_tris(200, seed=5, extent=30.0)
    # Shift triangles into the box.
    off = np.array([0, -20, 0], np.float32)
    builder.add_triangles(v0 * 0.3 + off, v1 * 0.3 + off, v2 * 0.3 + off, mat=0)
    scene = builder.compile(bvh_threshold=64)
    assert scene.bvh is not None  # 200 ≥ threshold → BVH path
    cam = builder.cameras[0]
    cfg = RenderConfig(width=16, height=12, spp=1, max_depth=3)

    out = integrator.render_wavefront(scene, cam, cfg, 7, 0)
    img = np.asarray(out.radiance).reshape(cfg.height, cfg.width, 3)
    img_oracle, _ = oracle.render(builder, cam, cfg, 7, frames=1)
    assert_images_close(img, img_oracle, rtol=1e-3, atol=1e-4, frac=0.99)


def test_banded_render_bit_identical_to_monolithic():
    """Band-split rendering (render_wavefront y0/rows) == whole-frame render.

    bench.py renders the 100k-tri benchmark in horizontal bands to keep the
    wavefront under the tile-padding HBM ceiling (PERF_NOTES.md); RNG streams
    key on *global* pixel ids, so banding must not change a single bit.
    """
    builder = build_cornell_box()
    v0, v1, v2 = _random_tris(200, seed=5, extent=30.0)
    off = np.array([0, -20, 0], np.float32)
    builder.add_triangles(v0 * 0.3 + off, v1 * 0.3 + off, v2 * 0.3 + off, mat=0)
    scene = builder.compile(bvh_threshold=64)
    cam = builder.cameras[0]
    cfg = RenderConfig(width=16, height=12, spp=2, max_depth=3)

    whole = integrator.render_wavefront(scene, cam, cfg, 7, 0)
    rows = 4
    bands = [integrator.render_wavefront(scene, cam, cfg, 7, 0,
                                         y0=y, rows=rows)
             for y in range(0, cfg.height, rows)]
    banded = np.concatenate([np.asarray(b.radiance) for b in bands])
    np.testing.assert_array_equal(np.asarray(whole.radiance), banded)
    assert int(whole.segments) == sum(int(b.segments) for b in bands)
