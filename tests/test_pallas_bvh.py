"""Pallas BVH kernels (packet + MXU treelet) vs. the XLA traversal."""

import jax.numpy as jnp
import numpy as np

from fspt_tpu.config import RenderConfig
from fspt_tpu.ops.bvh import MAX_LEAF_TRIS, build_bvh, traverse_bvh
from fspt_tpu.ops.pallas_bvh import (
    TREELET,
    build_treelet_chunks,
    make_bvh_traverser,
    make_culled_traverser,
    make_mesh_intersector,
    make_treelet_traverser,
)
from fspt_tpu.render import integrator

from conftest import assert_images_close, build_cornell_box


def _tris(n, seed=0):
    rs = np.random.RandomState(seed)
    v0 = rs.uniform(-40, 40, (n, 3)).astype(np.float32)
    v1 = v0 + rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    v2 = v0 + rs.uniform(-8, 8, (n, 3)).astype(np.float32)
    return v0, v1, v2


def _rays(n, seed=1):
    rs = np.random.RandomState(seed)
    start = rs.uniform(-60, 60, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(start), jnp.asarray(d * 200.0)


def test_packet_traverser_matches_xla():
    v0, v1, v2 = _tris(800, seed=2)
    bvh = build_bvh(v0, v1, v2)
    start, seg = _rays(700, seed=3)
    t_ref, id_ref, _, _ = traverse_bvh(bvh, start, seg)
    trav = make_bvh_traverser(bvh, MAX_LEAF_TRIS)
    t_pal, id_pal, _, _ = trav(start, seg)
    np.testing.assert_allclose(np.asarray(t_ref), np.asarray(t_pal),
                               rtol=1e-5, atol=1e-7)
    h = np.asarray(t_ref) < 2.0
    assert (np.asarray(id_ref)[h] == np.asarray(id_pal)[h]).all()


def test_mxu_treelet_traverser_matches_xla():
    v0, v1, v2 = _tris(3000, seed=4)
    bvh_fine = build_bvh(v0, v1, v2)
    bvh_coarse = build_bvh(v0, v1, v2, max_leaf=TREELET)
    start, seg = _rays(1500, seed=5)
    t_ref, id_ref, u_ref, _ = traverse_bvh(bvh_fine, start, seg)
    trav = make_treelet_traverser(bvh_coarse)
    t_pal, id_pal, u_pal, _ = trav(start, seg)
    np.testing.assert_allclose(np.asarray(t_ref), np.asarray(t_pal),
                               rtol=1e-4, atol=1e-6)
    h = np.asarray(t_ref) < 2.0
    assert (np.asarray(id_ref)[h] == np.asarray(id_pal)[h]).mean() > 0.999
    np.testing.assert_allclose(np.asarray(u_ref)[h], np.asarray(u_pal)[h],
                               rtol=1e-3, atol=1e-4)


def test_culled_traverser_matches_xla():
    v0, v1, v2 = _tris(3000, seed=7)
    bvh_fine = build_bvh(v0, v1, v2)
    bvh_coarse = build_bvh(v0, v1, v2, max_leaf=TREELET)
    start, seg = _rays(1500, seed=8)
    t_ref, id_ref, u_ref, _ = traverse_bvh(bvh_fine, start, seg)
    trav = make_culled_traverser(bvh_coarse, block_rays=256)
    t_pal, id_pal, u_pal, _ = trav(start, seg)
    np.testing.assert_allclose(np.asarray(t_ref), np.asarray(t_pal),
                               rtol=1e-4, atol=1e-6)
    h = np.asarray(t_ref) < 2.0
    assert (np.asarray(id_ref)[h] == np.asarray(id_pal)[h]).mean() > 0.999
    np.testing.assert_allclose(np.asarray(u_ref)[h], np.asarray(u_pal)[h],
                               rtol=1e-3, atol=1e-4)


def test_culled_traverser_dead_lanes():
    """t_init<=0 lanes are dead: no hits, and live lanes are unaffected."""
    v0, v1, v2 = _tris(1000, seed=9)
    bvh_fine = build_bvh(v0, v1, v2)
    bvh_coarse = build_bvh(v0, v1, v2, max_leaf=TREELET)
    start, seg = _rays(600, seed=10)
    t_ref, id_ref, _, _ = traverse_bvh(bvh_fine, start, seg)
    trav = make_culled_traverser(bvh_coarse, block_rays=256)
    alive = np.zeros(600, bool)
    alive[::3] = True
    t0 = jnp.where(jnp.asarray(alive), 2.0, 0.0)
    t_pal, id_pal, _, _ = trav(start, seg, t_init=t0)
    assert (np.asarray(id_pal)[~alive] == -1).all()
    live = alive & (np.asarray(t_ref) < 2.0)
    np.testing.assert_allclose(np.asarray(t_ref)[live], np.asarray(t_pal)[live],
                               rtol=1e-4, atol=1e-6)
    assert (np.asarray(id_ref)[live] == np.asarray(id_pal)[live]).mean() > 0.999


def test_sorted_intersector_matches_unsorted():
    """Wavefront sorting is a pure permutation: Hit output is unchanged."""
    builder = build_cornell_box()
    v0, v1, v2 = _tris(300, seed=11)
    off = np.array([0, -25, 0], np.float32)
    builder.add_triangles(v0 * 0.2 + off, v1 * 0.2 + off, v2 * 0.2 + off, mat=0)
    scene = builder.compile(bvh_threshold=64)
    plain = make_mesh_intersector(scene, sort=False, block_rays=256)
    srt = make_mesh_intersector(scene, sort=True, block_rays=256)
    start, seg = _rays(500, seed=12)
    alive = jnp.asarray(np.random.RandomState(13).rand(500) > 0.3)
    h0 = plain(start, seg, alive)
    h1 = srt(start, seg, alive)
    m = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(h0.t)[m], np.asarray(h1.t)[m],
                               rtol=1e-4, atol=1e-6)
    assert (np.asarray(h0.mat)[m] == np.asarray(h1.mat)[m]).mean() > 0.999


def test_segmented_sort_matches_unsorted():
    """Segmented value-sort (sort="seg") is also a pure permutation."""
    from fspt_tpu.ops.pallas_bvh import SORT_SEG

    builder = build_cornell_box()
    v0, v1, v2 = _tris(300, seed=21)
    off = np.array([0, -25, 0], np.float32)
    builder.add_triangles(v0 * 0.2 + off, v1 * 0.2 + off, v2 * 0.2 + off, mat=0)
    scene = builder.compile(bvh_threshold=64)
    plain = make_mesh_intersector(scene, sort=False)
    srt = make_mesh_intersector(scene, sort="seg")
    n = SORT_SEG  # the segmented path requires n % SORT_SEG == 0
    start, seg = _rays(n, seed=22)
    alive = jnp.asarray(np.random.RandomState(23).rand(n) > 0.3)
    h0 = plain(start, seg, alive)
    h1 = srt(start, seg, alive)
    m = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(h0.t)[m], np.asarray(h1.t)[m],
                               rtol=1e-4, atol=1e-6)
    assert (np.asarray(h0.mat)[m] == np.asarray(h1.mat)[m]).mean() > 0.999


def test_mesh_intersector_full_render():
    """Mesh scene rendered via the Pallas mesh intersector == XLA BVH path."""
    builder = build_cornell_box()
    v0, v1, v2 = _tris(300, seed=6)
    off = np.array([0, -25, 0], np.float32)
    builder.add_triangles(v0 * 0.25 + off, v1 * 0.25 + off, v2 * 0.25 + off, mat=0)
    scene = builder.compile(bvh_threshold=64)
    cam = builder.cameras[0]
    cfg = RenderConfig(width=16, height=12, spp=1, max_depth=3)

    out_ref = integrator.render_wavefront(scene, cam, cfg, 7, 0)  # XLA BVH
    inter = make_mesh_intersector(scene)
    assert inter is not None
    out_pal = integrator.render_wavefront(scene, cam, cfg, 7, 0, intersector=inter)
    assert_images_close(out_ref.radiance, out_pal.radiance, rtol=1e-4,
                        atol=1e-6, frac=0.999)
    assert int(out_ref.segments) == int(out_pal.segments)


def test_pallas_cull_matches_xla_formula():
    """The in-VMEM cull kernel reproduces the XLA per-ray exact cull:
    same survivor sets, same front-to-back order, same quantized entry t."""
    import jax

    v0, v1, v2 = _tris(3000, seed=11)
    coarse = build_bvh(v0, v1, v2, max_leaf=TREELET)
    trav = make_culled_traverser(coarse, block_rays=128, sub_bundles=128)
    start, seg = _rays(512, seed=12)
    t_init = jnp.full((512,), 1.0, jnp.float32)
    t_init = t_init.at[::7].set(0.0)  # dead lanes mixed in
    counts, order, tlo, F = jax.jit(trav.prepare)(start, seg, t_init)

    # reference: the XLA formulation (pallas_bvh.cull S==R branch), inline
    f = np.asarray
    leaf_nodes = np.nonzero(f(coarse.count) > 0)[0]
    lbmin = f(coarse.bmin)[leaf_nodes]
    lbmax = f(coarse.bmax)[leaf_nodes]
    sb, gb = f(start), f(seg)
    tb = f(t_init)
    r = 1.0 / np.where(np.abs(gb) < 1e-30,
                       np.where(gb >= 0, 1e-30, -1e-30), gb)
    ta = (lbmin[None] - sb[:, None]) * r[:, None]
    tbx = (lbmax[None] - sb[:, None]) * r[:, None]
    t_lo = np.minimum(ta, tbx).max(axis=-1)
    t_hi = np.maximum(ta, tbx).min(axis=-1)
    ov = ((t_lo <= t_hi) & (t_hi >= 0.0)
          & (t_lo <= np.minimum(tb, 1.0)[:, None]) & (tb > 0.0)[:, None])
    key = np.where(ov, np.maximum(t_lo, 0.0), 3.0e38)
    key = key.reshape(4, 128, -1).min(axis=1)  # [blocks, leaves]
    counts_ref = (key < 3.0e38).sum(axis=1)
    # prepare may pad to CULL_BATCH·R granularity: extra blocks are dead.
    got = np.asarray(counts)[:, 0]
    np.testing.assert_array_equal(got[:4], counts_ref)
    assert (got[4:] == 0).all()
    for b in range(4):
        k = int(counts_ref[b])
        surv = set(np.nonzero(key[b] < 3.0e38)[0].tolist())
        assert set(np.asarray(order)[b, :k].tolist()) == surv
        # entry ts sorted ascending
        tl = np.asarray(tlo)[b, :k]
        assert (np.diff(tl) >= 0).all()


def test_ring_pipeline_matches_parity():
    """The NB-deep DMA ring sweep (pipeline_depth>2) returns exactly the
    parity kernel's results (same winners, same t/u/v)."""
    from test_diff_intersect import build_bvh_scene, rays_toward_mesh

    scene = build_bvh_scene().compile()
    fine = scene.bvh
    order0 = np.argsort(np.asarray(fine.tri_id))
    v0 = np.asarray(fine.tri_v0)[order0]
    v1 = v0 + np.asarray(fine.tri_e1)[order0]
    v2 = v0 + np.asarray(fine.tri_e2)[order0]
    coarse = build_treelet_chunks(v0, v1, v2)
    start, seg = rays_toward_mesh(256, seed=5)
    ct2 = make_culled_traverser(coarse, block_rays=64, sub_bundles=64,
                                group=8)
    ct4 = make_culled_traverser(coarse, block_rays=64, sub_bundles=64,
                                group=8, pipeline_depth=4)
    for a, c, name in zip(ct2(start, seg), ct4(start, seg),
                          ("t", "id", "u", "v")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c),
                                      err_msg=name)


def test_cullsim_sort_matches_unsorted():
    """Cull-list-similarity blocking (sort="cullsim": nearest-treelet
    major key, Morton tiebreak) is also a pure permutation."""
    builder = build_cornell_box()
    v0, v1, v2 = _tris(300, seed=31)
    off = np.array([0, -25, 0], np.float32)
    builder.add_triangles(v0 * 0.2 + off, v1 * 0.2 + off, v2 * 0.2 + off, mat=0)
    scene = builder.compile(bvh_threshold=64)
    plain = make_mesh_intersector(scene, sort=False, block_rays=256)
    srt = make_mesh_intersector(scene, sort="cullsim", block_rays=256)
    start, seg = _rays(500, seed=32)
    alive = jnp.asarray(np.random.RandomState(33).rand(500) > 0.3)
    h0 = plain(start, seg, alive)
    h1 = srt(start, seg, alive)
    m = np.asarray(alive)
    np.testing.assert_allclose(np.asarray(h0.t)[m], np.asarray(h1.t)[m],
                               rtol=1e-4, atol=1e-6)
    assert (np.asarray(h0.mat)[m] == np.asarray(h1.mat)[m]).mean() > 0.999
