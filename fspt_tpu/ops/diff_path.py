"""Differentiable planar path replay — the fast fwd+bwd path.

The flagship forward path is the camera-fused Pallas megakernel
(ops/pallas_path.py) — a kernel with no VJP.  This module instantiates the
*same path body* (pallas_path.build_path_core) as plain XLA over
component-planar ``[N]`` arrays with the material table (and camera) left
traced, giving a fully differentiable renderer whose radiance matches the
megakernel bit-for-bit (same straight-line program, same PCG streams).

Why this is fast where the general wavefront integrator
(render/integrator.py) is not: the integrator carries ``[N,3]``/``[N,1]``
state, which XLA pads to (8,128) tiles on TPU — a 42×/128× HBM-traffic
expansion that the backward pass pays again for every saved residual
(measured r2: 8.2 Mrays/s fwd+bwd at 1080p).  Planar ``[N]`` state tiles
densely, the per-material Python loop shades only the rows the scene uses,
and the whole bounce chain is elementwise → XLA fuses each bounce into a
handful of dense kernels, forward and backward.

Gradient semantics match the hit-id-replay construction
(ops/diff_intersect.py): which primitive a lane hits is piecewise-constant,
so AD through the strict-< closest-hit merge differentiates the winning
primitive's t/normal exactly (correct almost everywhere); silhouette terms
need the integrator's edge reparameterization and are out of scope here.
Discrete RNG decisions (lobe choice, reflect-vs-refract) are functions of
uniforms, not parameters — detached by construction.

Reference analog: the whole recursive integrator being differentiated
(engine.cpp:59-159) — a capability the reference does not have
(BASELINE.json configs 4-5; north star: "forward AND backward kernels must
hit speed-of-light per chip").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu.camera import generate_rays
from fspt_tpu.ops import rng as rng_mod
from fspt_tpu.ops.pallas_path import (
    HostMaterials,
    HostScene,
    MAX_SPECIALIZED_PRIMS,
    XlaOps,
    build_path_core,
)


@jax.custom_vjp
def _sanitize_grad(x):
    """Identity whose backward replaces non-finite cotangents with 0 and
    clips the rest.  Grazing-incidence hits make the intersection chain's
    reverse derivatives heavy-tailed (1/cos-theta scaling); one overflowing
    lane would otherwise poison the whole band's camera/geometry gradient
    with NaN.  Applied to the primary-ray inputs only — well-conditioned
    lanes keep exact derivatives."""
    return x


def _sanitize_fwd(x):
    return x, None


def _sanitize_bwd(_, ct):
    return (jnp.clip(jnp.nan_to_num(ct, nan=0.0, posinf=0.0, neginf=0.0),
                     -1e12, 1e12),)


_sanitize_grad.defvjp(_sanitize_fwd, _sanitize_bwd)


def make_diff_path(scene_pack, cfg, z_far: float = 10000.0,
                   sg_hits: bool = False):
    """Build the differentiable planar renderer for a ScenePack.

    Returns ``fn(table, camera, seed, sample0, y0=0, rows=None) →
    TraceOutput`` — differentiable w.r.t. ``table`` (a MaterialTable, e.g.
    ``scene.materials._replace(diffuse=p)``) and ``camera`` (all leaves) —
    or None when the scene needs the general path (BVH triangles / textures
    / too many primitives; same envelope as the megakernel).

    ``sg_hits=True`` stops gradients at the closest-hit outputs (t, normal)
    — the hit-id-replay semantics of ops/diff_intersect.py taken one step
    further: for *material-only* optimization the intersection chain
    contributes nothing to the gradient (rays never depend on the table),
    so detaching it frees the backward pass from re-walking it and from
    saving its residuals.  Leave False for camera/geometry gradients.

    ``z_far`` must match ``camera.z_far`` (same contract as
    make_path_tracer).  ``cfg.edge_eps`` is ignored — silhouette terms need
    the general integrator.
    """
    from fspt_tpu.ops.pallas_trace import intersect_lanes
    from fspt_tpu.render.integrator import TraceOutput

    if scene_pack.bvh is not None:
        return None
    mats = HostMaterials(scene_pack.materials)
    if mats.any_textured:
        return None
    scene = HostScene(scene_pack.geometry)
    if scene.prim_count > MAX_SPECIALIZED_PRIMS:
        return None
    sky_idx = int(scene_pack.sky_mat)

    intersect = None
    if sg_hits:
        def intersect(sx, sy, sz, dx, dy, dz):
            sg = jax.lax.stop_gradient
            outs = intersect_lanes(scene, sg(sx), sg(sy), sg(sz),
                                   sg(dx), sg(dy), sg(dz),
                                   want_texcoords=False)
            return tuple(sg(o) for o in outs)

    def trace(table, camera, seed, sample0, y0=0, rows=None):
        core = build_path_core(scene, mats, cfg, sky_idx, float(z_far),
                               ops=XlaOps, tmats=table, intersect=intersect)
        start, seg, pixel_idx, sample_idx = generate_rays(
            camera, cfg.width, cfg.height, cfg.spp, seed, sample0,
            y0=y0, rows=rows)
        start = _sanitize_grad(start)
        seg = _sanitize_grad(seg)
        seed_u = jnp.asarray(seed).astype(jnp.uint32)
        h0 = rng_mod.pcg_hash(seed_u ^ jnp.uint32(0x9E3779B9))
        h0 = jax.lax.bitcast_convert_type(h0, jnp.int32)

        outs = core(h0, start[:, 0], start[:, 1], start[:, 2],
                    seg[:, 0], seg[:, 1], seg[:, 2],
                    pixel_idx.astype(jnp.int32), sample_idx.astype(jnp.int32))
        lx, ly, lz, anx, any_, anz, ad, am, segc = outs
        return TraceOutput(
            radiance=jnp.stack([lx, ly, lz], axis=-1),
            aov_normal=jnp.stack([anx, any_, anz], axis=-1),
            aov_depth=ad,
            aov_mat=am,
            segments=jnp.sum(segc),
        )

    return trace


def make_image_fn(scene_pack, cfg, z_far: float = 10000.0, remat: bool = False,
                  sg_hits: bool = False):
    """Differentiable band-image renderer on the planar path.

    Returns ``img_fn(table, camera, seed, frame_idx, y0, rows) →
    ([rows, W, 3] mean-over-spp image, segment count)`` or None when the
    scene can't use the planar path.  ``remat=True`` wraps the trace in
    ``jax.checkpoint`` — the backward pass recomputes the bounce chain
    instead of saving per-bounce residuals (trades FLOPs for HBM).
    ``sg_hits``: see make_diff_path.
    """
    trace = make_diff_path(scene_pack, cfg, z_far=z_far, sg_hits=sg_hits)
    if trace is None:
        return None

    def img_fn(table, camera, seed, frame_idx, y0, rows):
        def radiance(table, camera):
            out = trace(table, camera, seed, frame_idx * cfg.spp,
                        y0=y0, rows=rows)
            return out.radiance, out.segments

        fn = jax.checkpoint(radiance) if remat else radiance
        rad, segments = fn(table, camera)
        img = rad.reshape(rows, cfg.width, cfg.spp, 3).mean(axis=2)
        return img, segments

    return img_fn
