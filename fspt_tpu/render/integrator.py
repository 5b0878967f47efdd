"""The wavefront path integrator — the hot path.

This is the central architectural inversion over the reference (SURVEY.md §7):
the recursive depth-first ``TraceStep`` (reference engine.cpp:59-159) becomes
an *iterative bounce loop over a ray SoA* — every lane carries
``(start, seg, throughput, radiance, alive)`` and each bounce does
intersect → shade → spawn for the whole wavefront at once.  The loop is
unrolled over the (static) maximum depth so XLA fuses each bounce into a
handful of kernels.

Semantic parity with the reference recursion:

* depth cap 8 → loop length (engine.cpp:16, 62-64),
* fast-render returns white above depth 1 (engine.cpp:67-70),
* miss → sky sample ×3 (engine.cpp:92-101, scene.cpp:157-162),
* backface flip → is_internal (scene.cpp:238-247),
* ε-offset 0.03 of the continuation segment (engine.cpp:120-127),
* affine Sample folding: L += T·bias; T *= coef (see materials.shade),
* depth-0 fog absorption resolved one bounce later, because the reference's
  fog term needs the *next* hit position (material.cpp:319-339),
* depth-0 light tone clamp ‖L‖>10 (engine.cpp:148-151),
* AOVs captured at depth 0 (engine.cpp:94-99, 147-156).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fspt_tpu import materials as mat_mod
from fspt_tpu.camera import Camera, generate_rays
from fspt_tpu.config import RenderConfig
from fspt_tpu.ops import rng
from fspt_tpu.ops.intersect import Hit, intersect_scene
from fspt_tpu.render import framebuffer as fb_mod
from fspt_tpu.scene.builder import ScenePack
from fspt_tpu.utils import vecmath as vm


def _intersect_with_bvh(scene: "ScenePack", start, seg) -> Hit:
    """Closest hit: analytic primitives (brute force) ∪ BVH triangles.

    The two-level analog of Scene::Trace → MeshBvh::Trace (scene.cpp:227-248,
    mesh.cpp:154-160): analytic SoAs are tested directly, triangle-heavy
    geometry goes through the flattened BVH, and the closer hit wins.
    """
    from fspt_tpu.ops.bvh import traverse_bvh

    base = intersect_scene(scene.geometry, start, seg)
    t_tri, tri_id, u, v = traverse_bvh(scene.bvh, start, seg)
    tri_hit = tri_id >= 0
    tid = jnp.maximum(tri_id, 0)
    ts = scene.tri_shade
    n0, n1, n2 = ts.n0[tid], ts.n1[tid], ts.n2[tid]
    normal = n0 + (n1 - n0) * u[:, None] + (n2 - n0) * v[:, None]
    t0, t1, t2 = ts.t0[tid], ts.t1[tid], ts.t2[tid]
    texcoords = t0 + (t1 - t0) * u[:, None] + (t2 - t0) * v[:, None]

    tri_wins = tri_hit & (t_tri < base.t)
    t = jnp.where(tri_wins, t_tri, base.t)
    return Hit(
        t=t,
        point=start + seg * t[:, None],
        normal=jnp.where(tri_wins[:, None], normal, base.normal),
        texcoords=jnp.where(tri_wins[:, None], texcoords, base.texcoords),
        mat=jnp.where(tri_wins, ts.mat[tid], base.mat),
        prim_kind=jnp.where(tri_wins, 5, base.prim_kind),
        hit=base.hit | tri_hit,
    )


def intersect_full(scene: "ScenePack", start, seg) -> Hit:
    """Closest hit against the FULL scene: analytic primitives ∪ BVH
    triangles.  The one-stop probe used by TraceRange-style queries
    (reference engine.cpp:298-329 traces the whole scene, meshes included)."""
    if scene.bvh is not None:
        return _intersect_with_bvh(scene, start, seg)
    return intersect_scene(scene.geometry, start, seg)


class TraceOutput(NamedTuple):
    radiance: jnp.ndarray  # [N,3]
    aov_normal: jnp.ndarray  # [N,3]
    aov_depth: jnp.ndarray  # [N]
    aov_mat: jnp.ndarray  # [N] int32
    segments: jnp.ndarray  # scalar int32: path segments traced (rays/s metric)


def trace_radiance(scene: ScenePack, cfg: RenderConfig, start, seg,
                   pixel_idx, sample_idx, seed, z_far,
                   intersector=None) -> TraceOutput:
    """Trace a ray wavefront to completion and return per-lane radiance.

    ``intersector`` (static) overrides the default XLA brute-force
    ``intersect_scene`` — e.g. the scene-specialized Pallas megakernel
    (ops/pallas_trace.py) or the BVH traversal kernel.
    """
    geom = scene.geometry
    table = scene.materials
    tex = scene.textures

    n_lanes = start.shape[0]
    radiance = jnp.zeros((n_lanes, 3), jnp.float32)
    throughput = jnp.ones((n_lanes, 3), jnp.float32)
    alive = jnp.ones((n_lanes,), bool)
    segments = jnp.zeros((), jnp.int32)

    fog_active = jnp.zeros((n_lanes,), bool)
    fog_from = jnp.zeros((n_lanes, 3), jnp.float32)
    fog_diffuse = jnp.zeros((n_lanes, 3), jnp.float32)
    fog_density = jnp.zeros((n_lanes,), jnp.float32)
    fog_u = jnp.zeros((n_lanes,), jnp.float32)

    aov_normal = jnp.zeros((n_lanes, 3), jnp.float32)
    aov_depth = jnp.zeros((n_lanes,), jnp.float32)
    aov_mat = jnp.zeros((n_lanes,), jnp.int32)
    primary_light_hit = jnp.zeros((n_lanes,), bool)

    for depth in range(cfg.effective_depth):
        segments = segments + jnp.sum(alive.astype(jnp.int32))

        if intersector is not None:
            # Intersectors that understand liveness (the sorted/culled mesh
            # path) sort dead lanes out of the working set — compaction
            # without dynamic shapes.
            if getattr(intersector, "accepts_alive", False):
                hit = intersector(start, seg, alive)
            else:
                hit = intersector(start, seg)
        elif scene.bvh is not None:
            hit = _intersect_with_bvh(scene, start, seg)
        else:
            hit = intersect_scene(geom, start, seg)

        # Backface flip → is_internal (scene.cpp:238-247): the start point
        # lies behind the plane through (normal, hit point).
        side = vm.dot(hit.normal, start - hit.point)
        internal = side < 0.0
        normal = jnp.where(internal[:, None], -hit.normal, hit.normal)

        # Depth-0 fog gets resolved here, one bounce late, because the
        # reference's absorption term uses the *next* bounce's origin
        # (material.cpp:330-337): light_pos is the next hit point, or the
        # segment end on a miss (engine.cpp:89-91).
        if depth >= 1:
            light_pos = jnp.where(hit.hit[:, None], hit.point, start + seg)
            dist = vm.length(light_pos - fog_from)
            thresh = jnp.clip(dist * dist * fog_density * 0.00005, 0.0, 1.0)
            absorbed = fog_active & (fog_u < thresh)
            radiance = radiance + jnp.where(
                (absorbed & alive)[:, None], throughput * fog_diffuse, 0.0
            )
            alive = alive & ~absorbed
            fog_active = jnp.zeros_like(fog_active)

        # Misses sample the sky (engine.cpp:92-101). In fast-render mode this
        # loop only covers depths 0..1; deeper lanes get white after it.
        miss = alive & ~hit.hit
        view_dir = vm.normalize(seg)
        sky_rgb = mat_mod.sample_sky(table, tex, scene.sky_mat, view_dir)
        radiance = radiance + jnp.where(miss[:, None], throughput * sky_rgb, 0.0)

        active = alive & hit.hit
        view = vm.normalize(hit.point - start)
        uniforms = rng.bounce_uniforms(seed, pixel_idx, sample_idx, depth,
                                       cfg.bounce_slots)
        sh = mat_mod.shade(table, tex, hit.mat, view, normal, hit.texcoords, uniforms)

        # Edge reparameterization (silhouette gradients, cfg.edge_eps > 0):
        # the expected image near a triangle edge is alpha·L_surface +
        # (1−alpha)·L_background with alpha the smoothed coverage.  Sample
        # the blend stochastically — pass-through with prob 1−alpha — and
        # carry the ratio alpha/stop_grad(alpha) in the throughput: the
        # value is 1 (the unbiased hard estimator as eps→0) but its
        # derivative is ∂alpha/alpha, which is exactly the boundary term
        # naive AD through hard hit selection drops.  At interior shared
        # edges the pass-through ray lands on the adjacent triangle, so
        # L_background ≈ L_surface and the smoothing bias vanishes.
        if cfg.edge_eps > 0.0 and hit.edge_dist is not None:
            alpha = jnp.clip(hit.edge_dist / cfg.edge_eps, 0.0, 1.0)
            ue = rng.edge_uniform(seed, pixel_idx, sample_idx, depth)
            pass_thru = active & (ue >= alpha)
            keep = active & ~pass_thru
            sg = jax.lax.stop_gradient
            ratio = jnp.where(
                pass_thru,
                (1.0 - alpha) / jnp.maximum(sg(1.0 - alpha), 1e-6),
                jnp.where(keep, alpha / jnp.maximum(sg(alpha), 1e-6), 1.0))
            throughput = throughput * ratio[:, None]
            view_dir_n = vm.normalize(seg)
            sh = sh._replace(
                direction=jnp.where(pass_thru[:, None], view_dir_n,
                                    sh.direction),
                bias=jnp.where(pass_thru[:, None], 0.0, sh.bias),
                coef=jnp.where(pass_thru[:, None], 1.0, sh.coef),
                will_indirect=jnp.where(pass_thru, True, sh.will_indirect),
                is_light=jnp.where(pass_thru, False, sh.is_light),
                is_fog=jnp.where(pass_thru, False, sh.is_fog),
            )

        if depth == 0:
            aov_normal = jnp.where(hit.hit[:, None], normal, view_dir)
            aov_depth = jnp.where(hit.hit, vm.length(hit.point - start), z_far)
            aov_mat = jnp.where(hit.hit, hit.mat, scene.sky_mat)
            primary_light_hit = hit.hit & sh.is_light
            mark = active & sh.is_fog
            fog_active = mark
            fog_from = jnp.where(mark[:, None], hit.point, fog_from)
            fog_diffuse = jnp.where(mark[:, None], sh.fog_diffuse, fog_diffuse)
            fog_density = jnp.where(mark, sh.fog_density, fog_density)
            fog_u = jnp.where(mark, uniforms[:, 3], fog_u)

        radiance = radiance + jnp.where(active[:, None], throughput * sh.bias, 0.0)
        throughput = jnp.where(active[:, None], throughput * sh.coef, throughput)

        new_start = hit.point + sh.direction * cfg.ray_offset
        new_seg = sh.direction * (z_far - cfg.ray_offset)
        start = jnp.where(active[:, None], new_start, start)
        seg = jnp.where(active[:, None], new_seg, seg)

        alive = active & sh.will_indirect

    if cfg.fast_render:
        # Lanes that would recurse past depth 1 return white (engine.cpp:67-70).
        radiance = radiance + jnp.where(alive[:, None], throughput, 0.0)
    # else: lanes alive after the last bounce hit the depth cap → 0
    # contribution (engine.cpp:62-64).

    # Depth-0 light tone clamp (engine.cpp:148-151).  The 1e-20 floor keeps
    # sqrt's gradient finite for black pixels (norm would otherwise be
    # sqrt(0) whose cotangent is inf → NaN in the backward pass).
    norm = jnp.sqrt(jnp.maximum(vm.dot(radiance, radiance), 1e-20))
    clamp = primary_light_hit & (norm > cfg.light_clamp)
    scale = jnp.where(clamp, cfg.light_clamp / norm, 1.0)
    radiance = radiance * scale[:, None]

    return TraceOutput(
        radiance=radiance,
        aov_normal=aov_normal,
        aov_depth=aov_depth,
        aov_mat=aov_mat,
        segments=segments,
    )


def render_wavefront(scene: ScenePack, camera: Camera, cfg: RenderConfig,
                     seed, sample0, y0=0, rows=None,
                     intersector=None) -> TraceOutput:
    """Generate the rows×W×spp primary wavefront and trace it."""
    start, seg, pixel_idx, sample_idx = generate_rays(
        camera, cfg.width, cfg.height, cfg.spp, seed, sample0, y0=y0, rows=rows
    )
    return trace_radiance(scene, cfg, start, seg, pixel_idx, sample_idx,
                          seed, camera.z_far, intersector=intersector)


def render_step(scene: ScenePack, camera: Camera, cfg: RenderConfig,
                fb: fb_mod.Framebuffer, seed, frame_idx, y0=0,
                intersector=None):
    """One progressive render step: trace spp samples/pixel and accumulate.

    The TPU analog of one ``TraceScene`` frame (engine.cpp:253-296); returns
    the updated framebuffer and the segment count for the rays/s metric.
    ``fb`` may be a horizontal band starting at scanline ``y0`` (sharding).
    """
    rows = fb.mean.shape[0]
    sample0 = frame_idx * cfg.spp
    out = render_wavefront(scene, camera, cfg, seed, sample0, y0=y0, rows=rows,
                           intersector=intersector)
    fb = fb_mod.accumulate(
        fb, out.radiance, out.aov_normal, out.aov_depth, out.aov_mat,
        rows, cfg.width, cfg.spp,
    )
    return fb, out.segments
