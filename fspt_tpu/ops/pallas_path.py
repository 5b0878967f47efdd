"""Full path-tracing Pallas megakernel — the speed-of-light forward path.

One ``pallas_call`` traces the *entire* path of every lane: the bounce loop
runs inside the kernel, so per-lane state (ray, throughput, radiance, fog
bookkeeping) lives in vector registers / VMEM for all 8 bounces and touches
HBM exactly twice — primary rays in, radiance + AOVs out.  This is the final
form of the wavefront inversion (SURVEY.md §7): the reference's recursive
``TraceStep`` (engine.cpp:59-159) becomes straight-line vector code over
8×128 lane tiles.

Specialization strategy (matches ops/pallas_trace.py): the scene — geometry
*and the material table* — is baked into the kernel at build time.  Shading
dispatch is a Python loop over the scene's actual material rows, so each lane
pays only a masked-merge per *used* material instead of a 9-way branch-free
lattice.  The RNG is the same PCG hash as ops/rng.py, evaluated in-kernel
with uint32 ops — bit-identical streams to the oracle (verified in tests).

The path *body* is shared with the differentiable planar replay
(ops/diff_path.py): :func:`build_path_core` parameterizes the body over the
bitcast primitives (Mosaic vs XLA) and the source of continuous material
values (baked NumPy scalars → kernel immediates, or traced table entries →
differentiable).  Branch *structure* (which materials exist, static glass
regimes) always comes from the NumPy snapshot, so the two instantiations
trace the same straight-line program and produce bit-comparable streams.

Limitations (fall back to the per-bounce path in ops/pallas_trace.py +
XLA shading): textured materials / textured sky, and scenes too large to
specialize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fspt_tpu import materials as M
from fspt_tpu.ops import rng as rng_mod
from fspt_tpu.ops.pallas_trace import (
    HostScene,
    LANE,
    MAX_SPECIALIZED_PRIMS,
    _atan2,
    intersect_lanes,
)
from fspt_tpu.scene.geometry import INVALID_PARAM
from fspt_tpu.utils import vecmath as vm

DEFAULT_BLOCK_ROWS = 16  # 16×128 = 2048 lanes/block; best in the bench sweep

U32 = jnp.uint32


class HostMaterials:
    """NumPy snapshot of the material table for kernel baking."""

    def __init__(self, table):
        f = lambda x: np.asarray(x)
        self.mtype = f(table.mtype)
        self.diffuse = f(table.diffuse)
        self.emissive = f(table.emissive)
        self.glow = f(table.glow)
        self.param = f(table.param)
        self.ior = f(table.ior)
        self.reflectivity = f(table.reflectivity)
        self.frost = f(table.frost)
        self.tex_id = f(table.tex_id)
        self.tex_scale = f(table.tex_scale)

    @property
    def count(self):
        return len(self.mtype)

    @property
    def any_textured(self):
        return bool((self.tex_id >= 0).any())


# --- bitcast primitives: Mosaic in-kernel vs XLA planar replay --------------


class MosaicOps:
    """uint32 bit ops as Mosaic lowers them (pltpu.bitcast)."""

    @staticmethod
    def to_u32(x_i32):
        return pltpu.bitcast(x_i32, U32)

    @staticmethod
    def unit_f32(h_u32):
        # Mosaic has no unsigned→float convert; h>>8 < 2^24 so the int32
        # bitcast is value-preserving.
        return pltpu.bitcast(h_u32 >> U32(8), jnp.int32).astype(
            jnp.float32) * np.float32(1.0 / (1 << 24))


class XlaOps:
    """The same ops in plain XLA (bit-identical results; see ops/rng.py)."""

    @staticmethod
    def to_u32(x_i32):
        return jax.lax.bitcast_convert_type(x_i32, U32)

    @staticmethod
    def unit_f32(h_u32):
        return (h_u32 >> U32(8)).astype(jnp.float32) * np.float32(
            1.0 / (1 << 24))


# --- in-kernel PCG streams (bit-identical to ops/rng.py) -------------------


def _pcg(x):
    x = x * U32(747796405) + U32(2891336453)
    word = ((x >> ((x >> U32(28)) + U32(4))) ^ x) * U32(277803737)
    return (word >> U32(22)) ^ word


def _stream_uniform(ops, h0_u32, pix_u32, smp_u32, ctr: int):
    """Uniform draw; ``h0 = pcg(seed ^ 0x9E3779B9)`` is precomputed host-side
    so the body only does vector uint32 ops (bit-identical to ops/rng.py)."""
    h = _pcg(h0_u32 + pix_u32)
    h = _pcg(h + smp_u32)
    h = _pcg(h + U32(ctr))
    return ops.unit_f32(h)


def _sphere_dir(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = (2.0 * vm.PI) * u2
    return r * jnp.cos(phi), r * jnp.sin(phi), z


def _norm3(x, y, z):
    n2 = x * x + y * y + z * z
    inv = jnp.where(n2 > 0.0, jax.lax.rsqrt(jnp.where(n2 > 0.0, n2, 1.0)), 0.0)
    return x * inv, y * inv, z * inv


def _pow25(x):
    """x**25 by repeated squaring (Mosaic-safe integer power)."""
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    x16 = x8 * x8
    return x16 * x8 * x


def _rotate(vx, vy, vz, angle, ax, ay, az):
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    ic = 1.0 - c
    ox = (c + ic * ax * ax) * vx + (ic * ax * ay - az * s) * vy + (ic * ax * az + ay * s) * vz
    oy = (ic * ax * ay + az * s) * vx + (c + ic * ay * ay) * vy + (ic * ay * az - ax * s) * vz
    oz = (ic * ax * az - ay * s) * vx + (ic * ay * az + ax * s) * vy + (c + ic * az * az) * vz
    return ox, oy, oz


def _refract(vx, vy, vz, nx, ny, nz, index):
    """vector3::refract (vector3.h:205-214): TIR → zero, else normalized.

    TIR lanes take sqrt(1) rather than sqrt(0) — sqrt's infinite slope at
    0 would turn their zero cotangent into NaN in reverse AD; the value is
    masked out by ``tir`` either way."""
    ndv = -(vx * nx + vy * ny + vz * nz)
    sin2 = (index * index) * (1.0 - ndv * ndv)
    k = index * ndv - jnp.sqrt(jnp.where(sin2 < 1.0, 1.0 - sin2, 1.0))
    rx, ry, rz = vx * index + nx * k, vy * index + ny * k, vz * index + nz * k
    rx, ry, rz = _norm3(rx, ry, rz)
    tir = sin2 >= 1.0
    zero = jnp.zeros_like(vx)
    return (jnp.where(tir, zero, rx), jnp.where(tir, zero, ry),
            jnp.where(tir, zero, rz))


#: Differentiable per-lane float state keys of the path stepper, in chain
#: order.  The per-bounce-remat backward (ops/pallas_grad.py) vjps each
#: bounce w.r.t. exactly these; everything else in the state dict is
#: discrete (masks, ids, RNG words) and carries no cotangent.
PATH_FLOAT_KEYS = (
    "Lx", "Ly", "Lz", "Tx", "Ty", "Tz",
    "sx", "sy", "sz", "dx", "dy", "dz",
    "f_fx", "f_fy", "f_fz", "f_dx", "f_dy", "f_dz", "f_dens", "f_u",
)


def build_path_core(scene: HostScene, mats: HostMaterials, cfg, sky_idx: int,
                    z_far_default: float, ops=MosaicOps, tmats=None,
                    intersect=None, deferred_tex: bool = False,
                    defer_all: bool = False, return_stepper: bool = False,
                    want_aovs: bool = True):
    """Build the path-tracing body as a pure array function.

    ``core(h0_i32, sx, sy, sz, dx, dy, dz, pix_i32, smp_i32) →
    (Lx, Ly, Lz, aov_nx, aov_ny, aov_nz, aov_depth, aov_mat, segcnt)``
    over arrays of any (broadcast-compatible) shape.

    With ``return_stepper=True`` the same body is exposed as a
    state-passing triple ``(init, step, finalize)``:
    ``init(h0_i32, sx..dz, pix_i32, smp_i32) → state`` (a flat dict),
    ``step(depth, state) → (state, slot_or_None)`` traces ONE bounce, and
    ``finalize(state, slots) → outputs`` applies the fast-render terminal
    and the depth-0 light clamp.  ``core`` is exactly
    ``finalize(loop(step, init(...)))`` — the stepper exists so a
    checkpointed backward can save only bounce-boundary states and
    re-trace one bounce at a time (ops/pallas_grad.py per-bounce remat).
    ``want_aovs=False`` skips the AOV bookkeeping inside ``step`` (the
    loss-only gradient kernels never read it; keeps their traces lean).

    * ``ops`` supplies the bitcast primitives (MosaicOps inside a Pallas
      kernel, XlaOps for the planar replay).
    * ``tmats`` supplies *continuous* material values — defaults to the
      NumPy snapshot ``mats`` (values become kernel immediates); pass a
      traced MaterialTable to differentiate radiance w.r.t. the table.
      Branch structure always comes from ``mats``.
    * ``intersect`` overrides the closest-hit function
      ``(sx,sy,sz,dx,dy,dz) → (t, nx, ny, nz, mat, kind, u, v)``; defaults
      to the baked-primitive merge (ops/pallas_trace.intersect_lanes).
    * ``deferred_tex``: texture-deferred mode.  Texture values never affect
      path *geometry* (diffuse maps only scale radiance;
      material.cpp:107-127), so the kernel traces the exact path and, per
      depth, emits the affine structure of the radiance transfer instead of
      folding it: ``coef_d = tex_d·s_d + k_d`` and ``bias_d = tex_d·se_d +
      ke_d``.  The return becomes ``(slots, p_light, aovs..., segcnt)``
      where ``slots`` is a list of per-depth dicts with planes
      ``s, k0..2, se, ke0..2, u, v, mat``; the texture gather + fold +
      depth-0 light clamp run outside (fold_deferred_radiance) where
      per-lane gathers are cheap.  Radiance planes are not produced.
    * ``defer_all``: affine-deferred PARAMETER transfer — the gradient-fast
      generalization of ``deferred_tex``.  Every radiometric table value
      (diffuse/emissive/glow columns, texels) is treated as a deferred
      "virtual texel": the kernel emits per-depth planes
      ``s, k, se, mat_c, mat_e`` (+ ``u, v`` when the scene has real
      textures) where ``coef_c = value_c(mat_c)·s + k`` and
      ``bias_c = value_e(mat_e)·se``.  ``k`` is channel-independent (only
      pure shape numbers like the ceramic spike land there), and the value
      column per row is static (diffuse for coefs; emissive/glow/diffuse
      for light/glow/fog bias rows).  The fold
      (fold_deferred_params) gathers those columns in XLA, so radiance is
      differentiable w.r.t. the whole radiometric table (and texels) by
      plain XLA AD — the kernel itself is parameter-independent and never
      recompiles during optimization.  Path geometry never depends on the
      radiometric columns, so this gradient is exact for them; scalar
      fields that bend rays (param/ior/reflectivity/frost) need the
      in-kernel-adjoint tracer (ops/pallas_grad.make_grad_path_tracer).
    """
    if defer_all:
        deferred_tex = True  # defer_all extends the deferred machinery
    if tmats is None:
        tmats = mats
    if intersect is None:
        def intersect(sx, sy, sz, dx, dy, dz):
            return intersect_lanes(scene, sx, sy, sz, dx, dy, dz,
                                   want_texcoords=deferred_tex)
    depth_count = cfg.effective_depth
    ray_offset = cfg.ray_offset
    ske = tmats.emissive[sky_idx]
    sky_e0, sky_e1, sky_e2 = ske[0] * 3.0, ske[1] * 3.0, ske[2] * 3.0
    # SampleSky ×3 (scene.cpp:157-162)
    sky_textured = deferred_tex and int(mats.tex_id[sky_idx]) >= 0
    material_rows = list(range(mats.count))
    # Edge-reparameterized silhouette gradients (integrator.py:171-201
    # parity): active when the custom intersect advertises an edge-distance
    # output and cfg asks for it.  Only the non-deferred body supports it
    # (the planar recorded replay is its consumer).
    edge_eps = float(getattr(cfg, "edge_eps", 0.0) or 0.0)
    returns_edge = getattr(intersect, "has_edge_dist", False)
    use_edge = edge_eps > 0.0 and returns_edge
    if use_edge and deferred_tex:
        raise ValueError("edge reparameterization needs the non-deferred "
                         "path body")

    def init(h0_i32, sx, sy, sz, dx, dy, dz, pix_i32, smp_i32):
        pix = ops.to_u32(pix_i32)
        smp = ops.to_u32(smp_i32)
        h0 = ops.to_u32(h0_i32)

        zero = jnp.zeros_like(sx)
        one = jnp.ones_like(sx)
        return dict(
            sx=sx, sy=sy, sz=sz, dx=dx, dy=dy, dz=dz,
            Lx=zero, Ly=zero, Lz=zero, Tx=one, Ty=one, Tz=one,
            alive=jnp.ones(sx.shape, bool),
            segcnt=jnp.zeros(sx.shape, jnp.int32),
            f_active=jnp.zeros(sx.shape, bool),
            f_fx=zero, f_fy=zero, f_fz=zero,  # fog scatter origin
            f_dx=zero, f_dy=zero, f_dz=zero,  # fog diffuse color
            f_dens=zero, f_u=zero,
            f_row=jnp.full(sx.shape, -1, jnp.int32),  # fog material row
            aov_nx=zero, aov_ny=zero, aov_nz=zero, aov_d=zero,
            aov_m=jnp.full(sx.shape, sky_idx, jnp.int32),
            p_light=jnp.zeros(sx.shape, bool),
            pix=pix, smp=smp, h0=h0,
        )

    def step(depth, st):
        sx, sy, sz = st["sx"], st["sy"], st["sz"]
        dx, dy, dz = st["dx"], st["dy"], st["dz"]
        Lx, Ly, Lz = st["Lx"], st["Ly"], st["Lz"]
        Tx, Ty, Tz = st["Tx"], st["Ty"], st["Tz"]
        alive = st["alive"]
        f_active = st["f_active"]
        f_fx, f_fy, f_fz = st["f_fx"], st["f_fy"], st["f_fz"]
        f_dx, f_dy, f_dz = st["f_dx"], st["f_dy"], st["f_dz"]
        f_dens, f_u, f_row = st["f_dens"], st["f_u"], st["f_row"]
        aov_nx, aov_ny, aov_nz = st["aov_nx"], st["aov_ny"], st["aov_nz"]
        aov_d, aov_m, p_light = st["aov_d"], st["aov_m"], st["p_light"]
        pix, smp, h0 = st["pix"], st["smp"], st["h0"]
        zero = jnp.zeros_like(sx)
        one = jnp.ones_like(sx)

        segcnt = st["segcnt"] + alive.astype(jnp.int32)

        # Texture-deferred affine-transfer structure for this depth.
        # k defaults to 1 so inactive lanes keep their throughput in the
        # fold (the in-kernel form guards with `where(active, T*c, T)`).
        sl_s = zero
        sl_k0 = sl_k1 = sl_k2 = one
        sl_se = zero
        sl_ke0 = sl_ke1 = sl_ke2 = zero
        sl_u = sl_v = zero
        sl_mat = jnp.full(sx.shape, -1, jnp.int32)
        sl_mat_e = jnp.full(sx.shape, -1, jnp.int32)  # defer_all bias row

        # Note: a whole-block early-exit (lax.cond around the intersect
        # once every lane is dead) was measured 15% SLOWER than straight-
        # line code at 4spp Cornell — the branch is an optimization
        # barrier and blocks rarely go fully dead.  Keep it branchless.
        if returns_edge:
            (t, hnx, hny, hnz, hmat, hkind, huu, hvv, hedge) = intersect(
                sx, sy, sz, dx, dy, dz)
        else:
            t, hnx, hny, hnz, hmat, hkind, huu, hvv = intersect(
                sx, sy, sz, dx, dy, dz
            )
        hit = t < INVALID_PARAM
        px, py, pz = sx + dx * t, sy + dy * t, sz + dz * t

        # Backface flip (scene.cpp:238-247): start behind the hit plane.
        side = hnx * (sx - px) + hny * (sy - py) + hnz * (sz - pz)
        flip = side < 0.0
        hnx = jnp.where(flip, -hnx, hnx)
        hny = jnp.where(flip, -hny, hny)
        hnz = jnp.where(flip, -hnz, hnz)

        # Depth-0 fog resolution one bounce later (material.cpp:330-337).
        if depth >= 1:
            lpx = jnp.where(hit, px, sx + dx)
            lpy = jnp.where(hit, py, sy + dy)
            lpz = jnp.where(hit, pz, sz + dz)
            ddx, ddy, ddz = lpx - f_fx, lpy - f_fy, lpz - f_fz
            dist2 = ddx * ddx + ddy * ddy + ddz * ddz
            thresh = jnp.clip(dist2 * f_dens * 0.00005, 0.0, 1.0)
            absorbed = f_active & (f_u < thresh) & alive
            if defer_all:
                # Fog bias event: value = diffuse[fog row] (the row's
                # bias column is diffuse — static by material kind).
                sl_se = jnp.where(absorbed, one, sl_se)
                sl_mat_e = jnp.where(absorbed, f_row, sl_mat_e)
            elif deferred_tex:
                # Fog bias event: ke = fog diffuse (never textured;
                # shade_planar fdx parity).
                sl_ke0 = jnp.where(absorbed, f_dx, sl_ke0)
                sl_ke1 = jnp.where(absorbed, f_dy, sl_ke1)
                sl_ke2 = jnp.where(absorbed, f_dz, sl_ke2)
            else:
                Lx = Lx + jnp.where(absorbed, Tx * f_dx, 0.0)
                Ly = Ly + jnp.where(absorbed, Ty * f_dy, 0.0)
                Lz = Lz + jnp.where(absorbed, Tz * f_dz, 0.0)
            alive = alive & ~absorbed
            f_active = jnp.zeros_like(f_active)

        # Miss → sky (engine.cpp:92-101).
        miss = alive & ~hit
        if defer_all:
            # Sky bias event: value = emissive[sky] ×3 (scene.cpp:
            # 157-162), or the sky texture sample when textured.
            sl_se = jnp.where(miss, 3.0, sl_se)
            sl_mat_e = jnp.where(miss, sky_idx, sl_mat_e)
            if sky_textured:
                mvx, mvy, mvz = _norm3(dx, dy, dz)
                sku = _atan2(mvx, mvz) / (2.0 * vm.PI) + 0.5
                skv = 1.0 - (mvy * 0.5 + 0.5)
                sl_u = jnp.where(miss, sku, sl_u)
                sl_v = jnp.where(miss, skv, sl_v)
        elif deferred_tex and sky_textured:
            # Textured sky: se=3 and sphere-map uv of the view direction
            # (scene.cpp:157-162, intersect.cpp:779-784).
            mvx, mvy, mvz = _norm3(dx, dy, dz)
            sku = _atan2(mvx, mvz) / (2.0 * vm.PI) + 0.5
            skv = 1.0 - (mvy * 0.5 + 0.5)
            sl_se = jnp.where(miss, 3.0, sl_se)
            sl_u = jnp.where(miss, sku, sl_u)
            sl_v = jnp.where(miss, skv, sl_v)
            sl_mat = jnp.where(miss, sky_idx, sl_mat)
        elif deferred_tex:
            sl_ke0 = jnp.where(miss, sky_e0 * one, sl_ke0)
            sl_ke1 = jnp.where(miss, sky_e1 * one, sl_ke1)
            sl_ke2 = jnp.where(miss, sky_e2 * one, sl_ke2)
        else:
            Lx = Lx + jnp.where(miss, Tx * sky_e0, 0.0)
            Ly = Ly + jnp.where(miss, Ty * sky_e1, 0.0)
            Lz = Lz + jnp.where(miss, Tz * sky_e2, 0.0)

        active = alive & hit

        # View vector (engine.cpp:114) == normalized segment direction.
        vx, vy, vz = _norm3(px - sx, py - sy, pz - sz)

        # Per-bounce uniforms, same counter layout as ops/rng.py.
        base = 16 + depth * cfg.bounce_slots
        u0 = _stream_uniform(ops, h0, pix, smp, base + 0)
        u1 = _stream_uniform(ops, h0, pix, smp, base + 1)
        u2 = _stream_uniform(ops, h0, pix, smp, base + 2)
        u3 = _stream_uniform(ops, h0, pix, smp, base + 3)

        # Shared sampling vectors.
        ndv = hnx * vx + hny * vy + hnz * vz
        rx, ry, rz = vx - 2.0 * ndv * hnx, vy - 2.0 * ndv * hny, vz - 2.0 * ndv * hnz
        gx, gy, gz = _sphere_dir(u1, u2)
        gdot = gx * hnx + gy * hny + gz * hnz
        gx = jnp.where(gdot < 0.0, -gx, gx)
        gy = jnp.where(gdot < 0.0, -gy, gy)
        gz = jnp.where(gdot < 0.0, -gz, gz)

        def lerped(amount):
            ox = gx * amount + rx * (1.0 - amount)
            oy = gy * amount + ry * (1.0 - amount)
            oz = gz * amount + rz * (1.0 - amount)
            ox, oy, oz = _norm3(ox, oy, oz)
            d = ox * hnx + oy * hny + oz * hnz
            return (jnp.where(d < 0.0, -ox, ox), jnp.where(d < 0.0, -oy, oy),
                    jnp.where(d < 0.0, -oz, oz))

        # Accumulators merged per used material.
        bx = by = bz = zero  # direction
        cx = cy = cz = zero  # coef
        ex = ey = ez = zero  # bias
        will = jnp.zeros(sx.shape, bool)
        is_light_m = jnp.zeros(sx.shape, bool)
        is_fog_m = jnp.zeros(sx.shape, bool)
        fog_dens_m = zero
        fog_cx = fog_cy = fog_cz = zero

        for mrow in material_rows:
            msk = active & (hmat == mrow)
            mtype = int(mats.mtype[mrow])
            tex_row = deferred_tex and int(mats.tex_id[mrow]) >= 0
            dsk = None  # deferred (s, k0, k1, k2) for textured coef rows
            dif = tmats.diffuse[mrow]
            d0, d1, d2 = dif[0], dif[1], dif[2]

            if mtype == M.LIGHT:
                if defer_all:
                    # Bias event: value = emissive[mrow] (or the row's
                    # emission texture — resolved by the fold's static
                    # per-row column map).
                    sl_se = jnp.where(msk, 1.0, sl_se)
                    sl_mat_e = jnp.where(msk, mrow, sl_mat_e)
                elif tex_row:
                    # Textured emission: bias = tex (material.cpp:38-44).
                    sl_se = jnp.where(msk, 1.0, sl_se)
                else:
                    em = tmats.emissive[mrow]
                    ex = jnp.where(msk, em[0] * one, ex)
                    ey = jnp.where(msk, em[1] * one, ey)
                    ez = jnp.where(msk, em[2] * one, ez)
                is_light_m = is_light_m | msk
                continue

            if mtype == M.DIFFUSE:
                ox, oy, oz = gx, gy, gz  # lobe = full hemisphere
                ndl = ox * hnx + oy * hny + oz * hnz
                w = ndl > M.DIFFUSE_CONTRIB_THRESHOLD
                nl = jnp.maximum(ndl, 0.0)
                ccx, ccy, ccz = d0 * nl, d1 * nl, d2 * nl
                if tex_row or defer_all:
                    dsk = (nl, zero, zero, zero)
            elif mtype == M.METAL:
                rough = tmats.param[mrow]
                rough_s = float(mats.param[mrow])  # static lobe regime
                ox, oy, oz = lerped(rough)
                ndl = ox * hnx + oy * hny + oz * hnz
                w = (rough_s <= M.DIFFUSE_ROUGHNESS_THRESHOLD) | (
                    ndl > M.DIFFUSE_CONTRIB_THRESHOLD)
                nl = jnp.maximum(ndl, 0.0)
                f = rough * nl + (1.0 - rough)
                ccx, ccy, ccz = d0 * f, d1 * f, d2 * f
                if tex_row or defer_all:
                    dsk = (f, zero, zero, zero)
            elif mtype == M.MIRROR:
                ox, oy, oz = rx, ry, rz
                w = jnp.ones_like(msk)
                ccx, ccy, ccz = d0 * one, d1 * one, d2 * one
                if defer_all:
                    dsk = (one, zero, zero, zero)
            elif mtype in (M.CERAMIC, M.GLOW):
                shin = tmats.param[mrow]
                amount = jnp.where(u0 < M.CERAMIC_SPIKE_PROB, 0.0, 1.0 - shin)
                ox, oy, oz = lerped(amount)
                ndl = ox * hnx + oy * hny + oz * hnz
                nl = jnp.maximum(ndl, 0.0)
                hx, hy, hz = _norm3(ox - vx, oy - vy, oz - vz)
                hn = hx * hnx + hy * hny + hz * hnz
                spec = _pow25(hn * hn)
                ccx = spec + d0 * nl * (1.0 - spec)
                ccy = spec + d1 * nl * (1.0 - spec)
                ccz = spec + d2 * nl * (1.0 - spec)
                w = jnp.ones_like(msk)
                if tex_row or defer_all:
                    dsk = (nl * (1.0 - spec), spec, spec, spec)
                if mtype == M.GLOW:
                    if defer_all:
                        # Bias event: value = glow[mrow] (static column).
                        sl_se = jnp.where(msk, 1.0, sl_se)
                        sl_mat_e = jnp.where(msk, mrow, sl_mat_e)
                    else:
                        gl = tmats.glow[mrow]
                        ex = jnp.where(msk, gl[0] * one, ex)
                        ey = jnp.where(msk, gl[1] * one, ey)
                        ez = jnp.where(msk, gl[2] * one, ez)
            elif mtype == M.GLASS:
                refl = tmats.reflectivity[mrow]
                frost = tmats.frost[mrow]
                index = tmats.ior[mrow]
                index_s = float(mats.ior[mrow])
                frost_s = float(mats.frost[mrow])
                lrx, lry, lrz = lerped(frost)
                # random_refraction (normal.cpp:64-105); regimes are
                # static in the snapshot values.
                if abs(index_s - 1.0) < vm.EPSILON:
                    fx0, fy0, fz0 = _norm3(vx, vy, vz)
                else:
                    fx0, fy0, fz0 = _refract(vx, vy, vz, hnx, hny, hnz, index)
                sa_s = vm.PI * frost_s
                if abs(sa_s - vm.PI) < vm.EPSILON:
                    qx, qy, qz = gx, gy, gz
                elif abs(sa_s) < vm.EPSILON:
                    qx, qy, qz = fx0, fy0, fz0
                else:
                    sa = vm.PI * frost
                    delta = (u3 * 2.0 - 1.0) * (sa * 0.5)
                    qx, qy, qz = _rotate(fx0, fy0, fz0, delta, gx, gy, gz)
                take_r = u0 < refl
                ox = jnp.where(take_r, lrx, qx)
                oy = jnp.where(take_r, lry, qy)
                oz = jnp.where(take_r, lrz, qz)
                w = jnp.ones_like(msk)
                ccx, ccy, ccz = d0 * one, d1 * one, d2 * one
                if defer_all:
                    dsk = (one, zero, zero, zero)
            elif mtype == M.LIQUID:
                refl = tmats.reflectivity[mrow]
                index = tmats.ior[mrow]
                qx, qy, qz = _refract(vx, vy, vz, hnx, hny, hnz, index)
                take_r = u0 < refl
                ox = jnp.where(take_r, rx, qx)
                oy = jnp.where(take_r, ry, qy)
                oz = jnp.where(take_r, rz, qz)
                w = jnp.ones_like(msk)
                ccx, ccy, ccz = d0 * one, d1 * one, d2 * one
                if defer_all:
                    dsk = (one, zero, zero, zero)
            elif mtype == M.FOG:
                ox, oy, oz = vx, vy, vz
                w = jnp.ones_like(msk)
                ccx, ccy, ccz = one, one, one
                is_fog_m = is_fog_m | msk
                fog_dens_m = jnp.where(msk, tmats.frost[mrow] * one, fog_dens_m)
                fog_cx = jnp.where(msk, d0 * one, fog_cx)
                fog_cy = jnp.where(msk, d1 * one, fog_cy)
                fog_cz = jnp.where(msk, d2 * one, fog_cz)
            else:
                raise ValueError(f"unknown material type {mtype}")

            bx = jnp.where(msk, ox, bx)
            by = jnp.where(msk, oy, by)
            bz = jnp.where(msk, oz, bz)
            if deferred_tex:
                if dsk is None:  # untextured coef: constant part only
                    sl_k0 = jnp.where(msk, ccx, sl_k0)
                    sl_k1 = jnp.where(msk, ccy, sl_k1)
                    sl_k2 = jnp.where(msk, ccz, sl_k2)
                else:
                    sv, kk0, kk1, kk2 = dsk
                    sl_s = jnp.where(msk, sv, sl_s)
                    sl_k0 = jnp.where(msk, kk0, sl_k0)
                    sl_k1 = jnp.where(msk, kk1, sl_k1)
                    sl_k2 = jnp.where(msk, kk2, sl_k2)
            else:
                cx = jnp.where(msk, ccx, cx)
                cy = jnp.where(msk, ccy, cy)
                cz = jnp.where(msk, ccz, cz)
            will = will | (msk & w)

        if use_edge:
            # Edge reparameterization (integrator.py:171-201): sample the
            # coverage blend stochastically — pass-through with prob
            # 1−alpha — and carry ratio = alpha/sg(alpha) (value 1, the
            # unbiased hard estimator; derivative ∂alpha/alpha, the
            # boundary term hard selection drops).  Folding the ratio into
            # (bias, coef) is the integrator's throughput·ratio in the
            # core's L += T·e; T *= c order.
            sg = jax.lax.stop_gradient
            alpha = jnp.clip(hedge / edge_eps, 0.0, 1.0)
            ue = _stream_uniform(ops, h0, pix, smp,
                                 rng_mod.CTR_EDGE + depth)
            pass_thru = active & (ue >= alpha)
            keep = active & ~pass_thru
            ratio = jnp.where(
                pass_thru,
                (1.0 - alpha) / jnp.maximum(sg(1.0 - alpha), 1e-6),
                jnp.where(keep, alpha / jnp.maximum(sg(alpha), 1e-6), 1.0))
            vdx, vdy, vdz = _norm3(dx, dy, dz)
            bx = jnp.where(pass_thru, vdx, bx)
            by = jnp.where(pass_thru, vdy, by)
            bz = jnp.where(pass_thru, vdz, bz)
            ex = jnp.where(pass_thru, 0.0, ex) * ratio
            ey = jnp.where(pass_thru, 0.0, ey) * ratio
            ez = jnp.where(pass_thru, 0.0, ez) * ratio
            cx = jnp.where(pass_thru, 1.0, cx) * ratio
            cy = jnp.where(pass_thru, 1.0, cy) * ratio
            cz = jnp.where(pass_thru, 1.0, cz) * ratio
            will = will | pass_thru
            is_light_m = is_light_m & ~pass_thru
            is_fog_m = is_fog_m & ~pass_thru

        if depth == 0:
            if want_aovs:
                aov_nx = jnp.where(hit, hnx, dx)
                aov_ny = jnp.where(hit, hny, dy)
                aov_nz = jnp.where(hit, hnz, dz)
                nx0, ny0, nz0 = _norm3(aov_nx, aov_ny, aov_nz)
                aov_nx = jnp.where(hit, aov_nx, nx0)
                aov_ny = jnp.where(hit, aov_ny, ny0)
                aov_nz = jnp.where(hit, aov_nz, nz0)
                dpx, dpy, dpz = px - sx, py - sy, pz - sz
                aov_d = jnp.where(
                    hit, jnp.sqrt(dpx * dpx + dpy * dpy + dpz * dpz),
                    z_far_default)
                aov_m = jnp.where(hit, hmat, sky_idx)
            p_light = hit & is_light_m
            mark = active & is_fog_m
            f_active = mark
            f_fx = jnp.where(mark, px, f_fx)
            f_fy = jnp.where(mark, py, f_fy)
            f_fz = jnp.where(mark, pz, f_fz)
            f_dx = jnp.where(mark, fog_cx, f_dx)
            f_dy = jnp.where(mark, fog_cy, f_dy)
            f_dz = jnp.where(mark, fog_cz, f_dz)
            f_dens = jnp.where(mark, fog_dens_m, f_dens)
            f_u = jnp.where(mark, u3, f_u)
            f_row = jnp.where(mark, hmat, f_row)

        slot = None
        if defer_all:
            # ``k`` is channel-independent in defer_all (only shape
            # numbers like the ceramic spike land there); bias events
            # carry (se, mat_e) instead of ke constants.
            sl_mat = jnp.where(active, hmat, sl_mat)
            sl_u = jnp.where(active, huu, sl_u)
            sl_v = jnp.where(active, hvv, sl_v)
            slot = dict(s=sl_s, k=sl_k0, se=sl_se, mat=sl_mat,
                        mat_e=sl_mat_e, u=sl_u, v=sl_v)
        elif deferred_tex:
            # Untextured emission (lights/glow) accumulated in ex; the
            # active mask is disjoint from the absorbed/miss ke events.
            sl_ke0 = jnp.where(active, ex, sl_ke0)
            sl_ke1 = jnp.where(active, ey, sl_ke1)
            sl_ke2 = jnp.where(active, ez, sl_ke2)
            sl_mat = jnp.where(active, hmat, sl_mat)
            sl_u = jnp.where(active, huu, sl_u)
            sl_v = jnp.where(active, hvv, sl_v)
            slot = dict(s=sl_s, k0=sl_k0, k1=sl_k1, k2=sl_k2,
                        se=sl_se, ke0=sl_ke0, ke1=sl_ke1,
                        ke2=sl_ke2, u=sl_u, v=sl_v, mat=sl_mat)
        else:
            Lx = Lx + jnp.where(active, Tx * ex, 0.0)
            Ly = Ly + jnp.where(active, Ty * ey, 0.0)
            Lz = Lz + jnp.where(active, Tz * ez, 0.0)
            Tx = jnp.where(active, Tx * cx, Tx)
            Ty = jnp.where(active, Ty * cy, Ty)
            Tz = jnp.where(active, Tz * cz, Tz)

        sx = jnp.where(active, px + bx * ray_offset, sx)
        sy = jnp.where(active, py + by * ray_offset, sy)
        sz = jnp.where(active, pz + bz * ray_offset, sz)
        scale = z_far_default - ray_offset
        dx = jnp.where(active, bx * scale, dx)
        dy = jnp.where(active, by * scale, dy)
        dz = jnp.where(active, bz * scale, dz)

        alive = active & will

        st2 = dict(
            sx=sx, sy=sy, sz=sz, dx=dx, dy=dy, dz=dz,
            Lx=Lx, Ly=Ly, Lz=Lz, Tx=Tx, Ty=Ty, Tz=Tz,
            alive=alive, segcnt=segcnt,
            f_active=f_active, f_fx=f_fx, f_fy=f_fy, f_fz=f_fz,
            f_dx=f_dx, f_dy=f_dy, f_dz=f_dz, f_dens=f_dens, f_u=f_u,
            f_row=f_row,
            aov_nx=aov_nx, aov_ny=aov_ny, aov_nz=aov_nz, aov_d=aov_d,
            aov_m=aov_m, p_light=p_light, pix=pix, smp=smp, h0=h0,
        )
        return st2, slot

    def finalize(st, slots):
        sx = st["sx"]
        zero = jnp.zeros_like(sx)
        one = jnp.ones_like(sx)
        alive, p_light, segcnt = st["alive"], st["p_light"], st["segcnt"]
        Lx, Ly, Lz = st["Lx"], st["Ly"], st["Lz"]
        Tx, Ty, Tz = st["Tx"], st["Ty"], st["Tz"]
        aov_nx, aov_ny, aov_nz = st["aov_nx"], st["aov_ny"], st["aov_nz"]
        aov_d, aov_m = st["aov_d"], st["aov_m"]
        slots = list(slots)

        if cfg.fast_render:
            if defer_all:
                # White terminal bias (engine.cpp:67-70): se with mat_e=-1
                # gathers the implicit unit value in the fold.
                wht = jnp.where(alive, 1.0, 0.0)
                neg = jnp.full(sx.shape, -1, jnp.int32)
                slots.append(dict(s=zero, k=one, se=wht, mat=neg, mat_e=neg,
                                  u=zero, v=zero))
            elif deferred_tex:
                # White terminal bias (engine.cpp:67-70) as an extra slot.
                wht = jnp.where(alive, 1.0, 0.0)
                slots.append(dict(s=zero, k0=one, k1=one, k2=one, se=zero,
                                  ke0=wht, ke1=wht, ke2=wht, u=zero, v=zero,
                                  mat=jnp.full(sx.shape, -1, jnp.int32)))
            else:
                Lx = Lx + jnp.where(alive, Tx, 0.0)
                Ly = Ly + jnp.where(alive, Ty, 0.0)
                Lz = Lz + jnp.where(alive, Tz, 0.0)

        if deferred_tex:
            # Radiance fold + depth-0 light clamp happen outside
            # (fold_deferred_radiance) where texel gathers are cheap.
            return (slots, p_light, aov_nx, aov_ny, aov_nz, aov_d, aov_m,
                    segcnt)

        # Depth-0 light tone clamp (engine.cpp:148-151).
        n2 = Lx * Lx + Ly * Ly + Lz * Lz
        norm = jnp.sqrt(jnp.maximum(n2, 1e-20))
        clampm = p_light & (norm > cfg.light_clamp)
        s = jnp.where(clampm, cfg.light_clamp / norm, 1.0)
        Lx, Ly, Lz = Lx * s, Ly * s, Lz * s

        return (Lx, Ly, Lz, aov_nx, aov_ny, aov_nz, aov_d, aov_m, segcnt)

    if return_stepper:
        return init, step, finalize

    def core(h0_i32, sx, sy, sz, dx, dy, dz, pix_i32, smp_i32):
        st = init(h0_i32, sx, sy, sz, dx, dy, dz, pix_i32, smp_i32)
        slots = []
        for depth in range(depth_count):
            st, slot = step(depth, st)
            if slot is not None:
                slots.append(slot)
        return finalize(st, slots)

    return core


def build_path_kernel(scene: HostScene, mats: HostMaterials, cfg, sky_idx: int,
                      z_far_default: float):
    """Wrap the path core as a Pallas kernel body (baked constants)."""
    core = build_path_core(scene, mats, cfg, sky_idx, z_far_default,
                           ops=MosaicOps)

    def kernel(h0_ref, sx_ref, sy_ref, sz_ref, dx_ref, dy_ref, dz_ref,
               pix_ref, smp_ref,
               lx_ref, ly_ref, lz_ref, anx_ref, any_ref, anz_ref,
               ad_ref, am_ref, seg_ref):
        h0 = jnp.full(sx_ref.shape, h0_ref[0], jnp.int32)
        outs = core(h0, sx_ref[:], sy_ref[:], sz_ref[:],
                    dx_ref[:], dy_ref[:], dz_ref[:], pix_ref[:], smp_ref[:])
        (lx_ref[:], ly_ref[:], lz_ref[:], anx_ref[:], any_ref[:], anz_ref[:],
         ad_ref[:], am_ref[:], seg_ref[:]) = outs

    return kernel


def make_path_tracer(scene_pack, cfg, z_far: float = 10000.0,
                     block_rows: int = DEFAULT_BLOCK_ROWS,
                     interpret: bool | None = None):
    """Compile the megakernel for a ScenePack.

    Returns ``fn(start[N,3], seg[N,3], pixel_idx[N], sample_idx[N], seed) →
    TraceOutput`` or None when the scene needs the general path (textures /
    too many primitives).
    """
    from fspt_tpu.render.integrator import TraceOutput

    if scene_pack.bvh is not None:
        return None  # BVH triangle scenes use ops/pallas_bvh.py / XLA path
    mats = HostMaterials(scene_pack.materials)
    if mats.any_textured:
        return None
    scene = HostScene(scene_pack.geometry)
    if scene.prim_count > MAX_SPECIALIZED_PRIMS:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sky_idx = int(scene_pack.sky_mat)
    kernel = build_path_kernel(scene, mats, cfg, sky_idx, float(z_far))

    def trace(start, seg, pixel_idx, sample_idx, seed):
        from fspt_tpu.ops import rng as rng_mod

        n = start.shape[0]
        rows = pl.cdiv(n, LANE)
        pad_rows = pl.cdiv(rows, block_rows) * block_rows
        n_pad = pad_rows * LANE

        def fcomp(x, i):
            return jnp.pad(x[:, i], (0, n_pad - n)).reshape(pad_rows, LANE)

        def icomp(x):
            return jnp.pad(x, (0, n_pad - n)).reshape(pad_rows, LANE)

        seed_u = jnp.asarray(seed).astype(jnp.uint32)
        h0 = rng_mod.pcg_hash(seed_u ^ jnp.uint32(0x9E3779B9))
        h0 = jax.lax.bitcast_convert_type(h0, jnp.int32).reshape(1)

        args = [h0,
                fcomp(start, 0), fcomp(start, 1), fcomp(start, 2),
                fcomp(seg, 0), fcomp(seg, 1), fcomp(seg, 2),
                icomp(pixel_idx.astype(jnp.int32)),
                icomp(sample_idx.astype(jnp.int32))]

        grid = (pad_rows // block_rows,)
        bspec = pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        f32 = jnp.float32
        out_shapes = [jax.ShapeDtypeStruct((pad_rows, LANE), f32) for _ in range(7)]
        out_shapes += [jax.ShapeDtypeStruct((pad_rows, LANE), jnp.int32) for _ in range(2)]

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[sspec] + [bspec] * 8,
            out_specs=[bspec] * 9,
            out_shape=out_shapes,
            interpret=interpret,
        )(*args)

        lx, ly, lz, anx, any_, anz, ad = [o.reshape(-1)[:n] for o in outs[:7]]
        am, segc = [o.reshape(-1)[:n] for o in outs[7:]]
        return TraceOutput(
            radiance=jnp.stack([lx, ly, lz], axis=-1),
            aov_normal=jnp.stack([anx, any_, anz], axis=-1),
            aov_depth=ad,
            aov_mat=am,
            segments=jnp.sum(segc),
        )

    return trace


def fold_deferred_radiance(table, tex, cfg, s, k0, k1, k2, se, ke0, ke1, ke2,
                           u, v, mat, p_light):
    """XLA epilogue for texture-deferred kernels.

    All slot fields are ``[S, N]`` planes from the kernel.  Per slot,
    gathers the texel ``t = texture(tex_id[mat], uv)`` (fallback 1 where
    ``s``/``se`` are zero anyway) and folds the affine transfer
    ``L += T·(t·se + ke); T *= (t·s + k)``, then applies the depth-0 light
    tone clamp (engine.cpp:148-151).  Differentiable w.r.t. the texel
    buffer — texture recovery comes for free.
    """
    from fspt_tpu import materials as M

    n = s.shape[1]
    one = jnp.ones((n,), jnp.float32)
    Tx = Ty = Tz = one
    Lx = Ly = Lz = jnp.zeros((n,), jnp.float32)
    for d in range(s.shape[0]):
        m = mat[d]
        safe = jnp.maximum(m, 0)
        tid = jnp.where(m >= 0, table.tex_id[safe], -1)
        tsc = table.tex_scale[safe]
        t0, t1, t2 = M.sample_texture_p(tex, tid, tsc, u[d], v[d],
                                        one, one, one)
        Lx = Lx + Tx * (t0 * se[d] + ke0[d])
        Ly = Ly + Ty * (t1 * se[d] + ke1[d])
        Lz = Lz + Tz * (t2 * se[d] + ke2[d])
        Tx = Tx * (t0 * s[d] + k0[d])
        Ty = Ty * (t1 * s[d] + k1[d])
        Tz = Tz * (t2 * s[d] + k2[d])

    n2 = Lx * Lx + Ly * Ly + Lz * Lz
    norm = jnp.sqrt(jnp.maximum(n2, 1e-20))
    clampm = p_light & (norm > cfg.light_clamp)
    sc = jnp.where(clampm, cfg.light_clamp / norm, 1.0)
    return Lx * sc, Ly * sc, Lz * sc


def fold_deferred_params(mats: HostMaterials, cfg, diffuse, emissive,
                         glow, tex, s, k, se, mat_c, mat_e, u, v, p_light):
    """XLA epilogue for ``defer_all`` kernels (affine-deferred parameters).

    All slot fields are ``[S, N]`` planes.  Per depth, resolves the coef
    value ``tc = texture(mat_c) | diffuse[mat_c]`` and the bias value
    ``te = texture(mat_e) | column(mat_e)`` (column = emissive for lights /
    sky, glow for Glow, diffuse for Fog — static per row), then folds
    ``L += T·(te·se); T *= (tc·s + k)`` and applies the depth-0 light tone
    clamp (engine.cpp:148-151).  Plain XLA, differentiable w.r.t.
    ``diffuse/emissive/glow`` columns and the texel buffer — the whole
    radiometric gradient of the megakernel path, with the kernel itself
    parameter-independent.
    """
    from fspt_tpu import materials as M

    mt = mats.mtype
    # Static per-row bias column: 0=emissive (Light/sky), 1=glow, 2=diffuse.
    bc = np.where(mt == M.GLOW, 1, np.where(mt == M.FOG, 2, 0))
    e_tab = jnp.where(jnp.asarray(bc == 1)[:, None], glow,
                      jnp.where(jnp.asarray(bc == 2)[:, None], diffuse,
                                emissive))
    tid_tab = mats.tex_id
    tsc_tab = jnp.asarray(mats.tex_scale, jnp.float32)
    rows = list(range(mats.count))
    any_tex = bool((tid_tab >= 0).any())

    def row_select(table, mid):
        # Static select-lattice instead of a gather: its AD transpose is
        # one masked reduction per material row — a TPU-sized [M,3] gather
        # transposes to a scatter-add, which XLA serializes (measured
        # SECONDS per band on the 1080p bench; the lattice folds to ms).
        out0 = out1 = out2 = jnp.zeros_like(mid, jnp.float32)
        for r in rows:
            m = mid == r
            out0 = jnp.where(m, table[r, 0], out0)
            out1 = jnp.where(m, table[r, 1], out1)
            out2 = jnp.where(m, table[r, 2], out2)
        return out0, out1, out2

    n = s.shape[1]
    one = jnp.ones((n,), jnp.float32)
    Tx = Ty = Tz = one
    Lx = Ly = Lz = jnp.zeros((n,), jnp.float32)
    for d in range(s.shape[0]):
        mc = mat_c[d]
        tc0, tc1, tc2 = row_select(diffuse, mc)
        if any_tex:
            safe_c = jnp.maximum(mc, 0)
            tidc = jnp.where(mc >= 0, jnp.asarray(tid_tab)[safe_c], -1)
            tc0, tc1, tc2 = M.sample_texture_p(
                tex, tidc, tsc_tab[safe_c], u[d], v[d], tc0, tc1, tc2)
        me = mat_e[d]
        te0, te1, te2 = row_select(e_tab, me)
        if any_tex:
            safe_e = jnp.maximum(me, 0)
            tide = jnp.where(me >= 0, jnp.asarray(tid_tab)[safe_e], -1)
            te0, te1, te2 = M.sample_texture_p(
                tex, tide, tsc_tab[safe_e], u[d], v[d], te0, te1, te2)
        has_e = me >= 0
        te0 = jnp.where(has_e, te0, 1.0)  # mat_e=-1: unit value
        te1 = jnp.where(has_e, te1, 1.0)  # (fast-render white slot)
        te2 = jnp.where(has_e, te2, 1.0)
        Lx = Lx + Tx * (te0 * se[d])
        Ly = Ly + Ty * (te1 * se[d])
        Lz = Lz + Tz * (te2 * se[d])
        Tx = Tx * (tc0 * s[d] + k[d])
        Ty = Ty * (tc1 * s[d] + k[d])
        Tz = Tz * (tc2 * s[d] + k[d])

    n2 = Lx * Lx + Ly * Ly + Lz * Lz
    norm = jnp.sqrt(jnp.maximum(n2, 1e-20))
    clampm = p_light & (norm > cfg.light_clamp)
    sc = jnp.where(clampm, cfg.light_clamp / norm, 1.0)
    return Lx * sc, Ly * sc, Lz * sc


def _make_deferred_camera_tracer(scene_pack, camera, cfg, scene, mats,
                                 sky_idx, block_rows, interpret):
    """Texture-deferred camera-fused megakernel (see build_path_core
    ``deferred_tex``): the kernel traces the exact path and emits per-depth
    affine-transfer structure; texel gathers + fold run in XLA."""
    from fspt_tpu.render.integrator import TraceOutput

    cam = HostCamera(camera, cfg.width, cfg.height)
    core = build_path_core(scene, mats, cfg, sky_idx, cam.z_far,
                           ops=MosaicOps, deferred_tex=True)
    raygen = build_fused_raygen(cam, cfg)
    n_slots = cfg.effective_depth + (1 if cfg.fast_render else 0)
    F = 10  # s,k0..2,se,ke0..2,u,v

    def kernel(h0_ref, s0_ref, lane0_ref, *out_refs):
        f_refs = out_refs[:F]
        mat_ref = out_refs[F]
        pl_ref = out_refs[F + 1]
        anx_ref, any_ref, anz_ref, ad_ref = out_refs[F + 2:F + 6]
        am_ref, seg_ref = out_refs[F + 6:F + 8]
        shape = pl_ref.shape
        pid = pl.program_id(0)
        sx, sy, sz, dx, dy, dz, pix_i, smp_i = raygen(
            h0_ref[0], s0_ref[0], lane0_ref[0], shape, pid)
        h0_i = jnp.full(shape, h0_ref[0], jnp.int32)
        slots, p_light, anx, any_, anz, ad, am, seg = core(
            h0_i, sx, sy, sz, dx, dy, dz, pix_i, smp_i)
        names = ("s", "k0", "k1", "k2", "se", "ke0", "ke1", "ke2", "u", "v")
        for d, sl in enumerate(slots):
            for fi, nm in enumerate(names):
                f_refs[fi][d] = sl[nm]
            mat_ref[d] = sl["mat"]
        pl_ref[:] = p_light.astype(jnp.int32)
        anx_ref[:], any_ref[:], anz_ref[:], ad_ref[:] = anx, any_, anz, ad
        am_ref[:], seg_ref[:] = am, seg

    def trace(seed, sample0, lane0=0, n_lanes=None):
        from fspt_tpu.ops import rng as rng_mod

        n = n_lanes if n_lanes is not None else cfg.height * cfg.width * cfg.spp
        rows = pl.cdiv(n, LANE)
        pad_rows = pl.cdiv(rows, block_rows) * block_rows

        seed_u = jnp.asarray(seed).astype(jnp.uint32)
        h0 = rng_mod.pcg_hash(seed_u ^ jnp.uint32(0x9E3779B9))
        h0 = jax.lax.bitcast_convert_type(h0, jnp.int32).reshape(1)
        s0 = jnp.asarray(sample0, jnp.int32).reshape(1)
        l0 = jnp.asarray(lane0, jnp.int32).reshape(1)

        grid = (pad_rows // block_rows,)
        slot_bspec = pl.BlockSpec((n_slots, block_rows, LANE),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        f32 = jnp.float32
        slot_shape = (n_slots, pad_rows, LANE)
        out_shapes = [jax.ShapeDtypeStruct(slot_shape, f32)] * F
        out_shapes += [jax.ShapeDtypeStruct(slot_shape, jnp.int32)]
        out_shapes += [jax.ShapeDtypeStruct((pad_rows, LANE), jnp.int32)]
        out_shapes += [jax.ShapeDtypeStruct((pad_rows, LANE), f32)] * 4
        out_shapes += [jax.ShapeDtypeStruct((pad_rows, LANE), jnp.int32)] * 2

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[sspec] * 3,
            out_specs=[slot_bspec] * (F + 1) + [bspec] * 7,
            out_shape=out_shapes,
            interpret=interpret,
        )(h0, s0, l0)

        flat = lambda a: a.reshape(n_slots, -1)[:, :n]
        fields = [flat(o) for o in outs[:F]]
        mat = flat(outs[F])
        pl_mask = outs[F + 1].reshape(-1)[:n] != 0
        anx, any_, anz, ad = [o.reshape(-1)[:n] for o in outs[F + 2:F + 6]]
        am, segc = [o.reshape(-1)[:n] for o in outs[F + 6:F + 8]]

        Lx, Ly, Lz = fold_deferred_radiance(
            scene_pack.materials, scene_pack.textures, cfg, *fields, mat,
            pl_mask)
        return TraceOutput(
            radiance=jnp.stack([Lx, Ly, Lz], axis=-1),
            aov_normal=jnp.stack([anx, any_, anz], axis=-1),
            aov_depth=ad,
            aov_mat=am,
            segments=jnp.sum(segc),
        )

    return trace


class HostCamera:
    """NumPy snapshot of camera parameters for kernel baking.

    Reproduces the per-thread camera setup of reference engine.cpp:184-197.
    """

    def __init__(self, camera, width: int, height: int):
        o = np.asarray(camera.origin, np.float32)
        tgt = np.asarray(camera.target, np.float32)
        self.origin = o
        self.z_far = float(np.asarray(camera.z_far))
        self.aperture = float(np.asarray(camera.aperture_size))
        self.focal_depth = float(np.asarray(camera.focal_depth))
        fwd = tgt - o
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(np.array([0.0, 1.0, 0.0], np.float32), fwd)
        right = right / np.linalg.norm(right)
        up = np.cross(fwd, right)
        up = up / np.linalg.norm(up)
        self.forward, self.right, self.up = fwd, right, up
        fovy = float(np.asarray(camera.fov_y)) * vm.PI / 180.0
        aspect = width / height
        fovx = 2.0 * np.arctan(np.tan(fovy * 0.5) * aspect)
        self.half_h = float(np.tan(fovy * 0.5) * self.z_far)
        self.half_w = float(np.tan(fovx * 0.5) * self.z_far)
        self.proj_origin = o + fwd * self.z_far
        # Focal plane (engine.cpp:195-197): normal -forward through
        # origin + forward*focal_depth.
        n = -fwd
        p = o + fwd * self.focal_depth
        self.focal_plane = np.concatenate([n, [-float(np.dot(n, p))]])


def build_fused_raygen(cam: HostCamera, cfg):
    """In-kernel primary-ray generation (reference engine.cpp:205-244).

    Returns ``raygen(h0_scalar, s0_scalar, lane0_scalar, shape, pid) →
    (sx, sy, sz, dx, dy, dz, pix_i, smp_i)`` for a ``[rows, LANE]`` block at
    grid position ``pid`` — shared by the forward megakernel and the
    backward gradient kernel (ops/pallas_grad.py)."""
    width, spp = cfg.width, cfg.spp
    inv_wm1 = 1.0 / (cfg.width - 1)
    inv_hm1 = 1.0 / (cfg.height - 1)

    def raygen(h0_s, s0_s, lane0_s, shape, pid):
        rows_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        flat = lane0_s + (pid * shape[0] + rows_ids) * LANE + col_ids

        # Integer div/mod by the (possibly non-pow2) width measured
        # perf-neutral vs a reciprocal-multiply trick on v5e (r5 probe 6):
        # Mosaic's lowering is fine — keep the plain form.
        s = jnp.remainder(flat, spp)
        pxy = flat // spp
        x = jnp.remainder(pxy, width)
        y = pxy // width
        pix_i = y * width + x
        smp_i = s + s0_s
        pix = pltpu.bitcast(pix_i, U32)
        smp = pltpu.bitcast(smp_i, U32)
        h0 = pltpu.bitcast(jnp.full(shape, h0_s, jnp.int32), U32)

        u0 = _stream_uniform(MosaicOps, h0, pix, smp, 0)
        u1 = _stream_uniform(MosaicOps, h0, pix, smp, 1)
        xf = x.astype(jnp.float32) + (u0 - 0.5)
        yf = y.astype(jnp.float32) + (u1 - 0.5)
        x_dist = cam.half_w * ((xf * inv_wm1) * 2.0 - 1.0)
        y_dist = cam.half_h * ((yf * inv_hm1) * 2.0 - 1.0)

        stopx = (float(cam.proj_origin[0]) + float(cam.right[0]) * x_dist
                 + float(cam.up[0]) * y_dist)
        stopy = (float(cam.proj_origin[1]) + float(cam.right[1]) * x_dist
                 + float(cam.up[1]) * y_dist)
        stopz = (float(cam.proj_origin[2]) + float(cam.right[2]) * x_dist
                 + float(cam.up[2]) * y_dist)
        sx = jnp.full(shape, float(cam.origin[0]), jnp.float32)
        sy = jnp.full(shape, float(cam.origin[1]), jnp.float32)
        sz = jnp.full(shape, float(cam.origin[2]), jnp.float32)
        dx, dy, dz = stopx - sx, stopy - sy, stopz - sz

        if cam.aperture > 0.0:
            # Thin-lens DoF (engine.cpp:221-244).
            u2 = _stream_uniform(MosaicOps, h0, pix, smp, 2)
            u3 = _stream_uniform(MosaicOps, h0, pix, smp, 3)
            fp = cam.focal_plane
            ts = float(fp[0]) * dx + float(fp[1]) * dy + float(fp[2]) * dz
            ns = -(float(fp[0]) * sx + float(fp[1]) * sy + float(fp[2]) * sz
                   + float(fp[3]))
            not_par = jnp.abs(ts) >= vm.EPSILON
            tf = ns / jnp.where(not_par, ts, 1.0)
            valid = not_par & (tf >= 0.0) & (tf <= 1.0)
            fx, fy, fz = sx + dx * tf, sy + dy * tf, sz + dz * tf
            angle = u2 * (2.0 * vm.PI)
            mag = jnp.sqrt(u3) * cam.aperture
            offc = jnp.cos(angle) * mag
            offs = jnp.sin(angle) * mag
            ox = float(cam.right[0]) * offc + float(cam.up[0]) * offs
            oy = float(cam.right[1]) * offc + float(cam.up[1]) * offs
            oz = float(cam.right[2]) * offc + float(cam.up[2]) * offs
            nsx, nsy, nsz = sx + ox, sy + oy, sz + oz
            ndx, ndy, ndz = _norm3(fx - nsx, fy - nsy, fz - nsz)
            zf = cam.z_far
            sx = jnp.where(valid, nsx, sx)
            sy = jnp.where(valid, nsy, sy)
            sz = jnp.where(valid, nsz, sz)
            dx = jnp.where(valid, ndx * zf, dx)
            dy = jnp.where(valid, ndy * zf, dy)
            dz = jnp.where(valid, ndz * zf, dz)

        return sx, sy, sz, dx, dy, dz, pix_i, smp_i

    return raygen


#: Packed camera-parameter layout for the traced raygen / camera-gradient
#: kernels: [origin(3), target(3), fov_y(deg), aperture, focal_depth].
CAMERA_PARAM_COUNT = 9


def camera_pvec(camera):
    """Pack a Camera into the traced raygen's 9-vector (host side)."""
    f32 = lambda x: jnp.asarray(x, jnp.float32).reshape(-1)
    return jnp.concatenate([
        f32(camera.origin), f32(camera.target), f32(camera.fov_y),
        f32(camera.aperture_size), f32(camera.focal_depth)])


def camera_from_pvec(camera, pvec):
    """Unpack a traced 9-vector back into ``camera``'s pytree."""
    return camera._replace(origin=pvec[0:3], target=pvec[3:6],
                           fov_y=pvec[6], aperture_size=pvec[7],
                           focal_depth=pvec[8])


@jax.custom_vjp
def _keep_finite(x):
    """Identity whose backward zeroes non-finite cotangents.

    The traced raygen's vjp reduces per-lane ray cotangents into 9 camera
    scalars, so a single degenerate lane (rsqrt/normalize vjp at a
    grazing or invalid-DoF lane evaluates x^{-3/2}→inf against a zero
    cotangent → NaN) would poison the whole gradient — the same boundary
    ops/diff_path.py sanitizes on the XLA planar path."""
    return x


def _kf_fwd(x):
    return x, None


def _kf_bwd(_, ct):
    return (jnp.where(jnp.isfinite(ct), ct, 0.0),)


_keep_finite.defvjp(_kf_fwd, _kf_bwd)


def build_traced_raygen(cam: HostCamera, cfg):
    """Primary-ray generation with TRACED camera parameters.

    Mirror of :func:`build_fused_raygen` (reference engine.cpp:184-244)
    whose camera basis, projection extents and focal plane are recomputed
    from 9 traced scalars (:data:`CAMERA_PARAM_COUNT` layout) — so an
    in-kernel ``jax.vjp`` over them yields exact camera-pose gradients.
    ``cam`` supplies only static structure: z_far and whether the DoF
    code is generated at all (``cam.aperture > 0`` — with a statically
    pinhole camera, aperture/focal cotangents are structurally zero).

    Returns ``raygen(cam_vals, h0_s, s0_s, lane0_s, shape, pid) → (sx,
    sy, sz, dx, dy, dz, pix_i, smp_i)``; ``cam_vals`` is a 9-sequence of
    traced f32 scalars.
    """
    width, spp = cfg.width, cfg.spp
    inv_wm1 = 1.0 / (cfg.width - 1)
    inv_hm1 = 1.0 / (cfg.height - 1)
    aspect = cfg.width / cfg.height
    zf = cam.z_far
    deg = float(vm.PI) / 180.0

    def raygen(cv, h0_s, s0_s, lane0_s, shape, pid):
        ox, oy, oz, tx, ty, tz, fov_deg, aperture, focal = cv
        # Basis (engine.cpp:187-189, world up = +Y): forward = normalize
        # (target-origin); right = normalize(cross(+Y, fwd)) = (fz,0,-fx)/n;
        # up = cross(fwd, right).
        fx, fy, fz = tx - ox, ty - oy, tz - oz
        fin = jax.lax.rsqrt(fx * fx + fy * fy + fz * fz)
        fx, fy, fz = fx * fin, fy * fin, fz * fin
        rin = jax.lax.rsqrt(jnp.maximum(fx * fx + fz * fz, 1e-20))
        rx, ry, rz = fz * rin, jnp.float32(0.0), -fx * rin
        ux = fy * rz - fz * ry
        uy = fz * rx - fx * rz
        uz = fx * ry - fy * rx
        # tan(fovx/2) = tan(fovy/2)·aspect exactly (fovx = 2·atan(·)).
        th = jnp.tan(fov_deg * (0.5 * deg))
        half_h = th * zf
        half_w = th * aspect * zf
        pox, poy, poz = ox + fx * zf, oy + fy * zf, oz + fz * zf

        rows_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        flat = lane0_s + (pid * shape[0] + rows_ids) * LANE + col_ids
        s = jnp.remainder(flat, spp)
        pxy = flat // spp
        x = jnp.remainder(pxy, width)
        y = pxy // width
        pix_i = y * width + x
        smp_i = s + s0_s
        pix = pltpu.bitcast(pix_i, U32)
        smp = pltpu.bitcast(smp_i, U32)
        h0 = pltpu.bitcast(jnp.full(shape, h0_s, jnp.int32), U32)

        u0 = _stream_uniform(MosaicOps, h0, pix, smp, 0)
        u1 = _stream_uniform(MosaicOps, h0, pix, smp, 1)
        xf = x.astype(jnp.float32) + (u0 - 0.5)
        yf = y.astype(jnp.float32) + (u1 - 0.5)
        x_dist = half_w * ((xf * inv_wm1) * 2.0 - 1.0)
        y_dist = half_h * ((yf * inv_hm1) * 2.0 - 1.0)

        stopx = pox + rx * x_dist + ux * y_dist
        stopy = poy + ry * x_dist + uy * y_dist
        stopz = poz + rz * x_dist + uz * y_dist
        one = jnp.ones(shape, jnp.float32)
        sx, sy, sz = ox * one, oy * one, oz * one
        dx, dy, dz = stopx - sx, stopy - sy, stopz - sz

        if cam.aperture > 0.0:
            # Thin-lens DoF (engine.cpp:221-244); focal plane normal is
            # -forward through origin + forward·focal.
            u2 = _stream_uniform(MosaicOps, h0, pix, smp, 2)
            u3 = _stream_uniform(MosaicOps, h0, pix, smp, 3)
            px, py, pz = ox + fx * focal, oy + fy * focal, oz + fz * focal
            fpw = px * fx + py * fy + pz * fz  # -dot(n, p) with n = -fwd
            ts = -(fx * dx + fy * dy + fz * dz)
            ns = -(-(fx * sx + fy * sy + fz * sz) + fpw)
            not_par = jnp.abs(ts) >= vm.EPSILON
            tf = ns / jnp.where(not_par, ts, 1.0)
            valid = not_par & (tf >= 0.0) & (tf <= 1.0)
            fxp, fyp, fzp = sx + dx * tf, sy + dy * tf, sz + dz * tf
            angle = u2 * (2.0 * vm.PI)
            mag = jnp.sqrt(u3) * aperture
            offc = jnp.cos(angle) * mag
            offs = jnp.sin(angle) * mag
            ax = rx * offc + ux * offs
            ay = ry * offc + uy * offs
            az = rz * offc + uz * offs
            nsx, nsy, nsz = sx + ax, sy + ay, sz + az
            ndx, ndy, ndz = _norm3(fxp - nsx, fyp - nsy, fzp - nsz)
            sx = jnp.where(valid, nsx, sx)
            sy = jnp.where(valid, nsy, sy)
            sz = jnp.where(valid, nsz, sz)
            dx = jnp.where(valid, ndx * zf, dx)
            dy = jnp.where(valid, ndy * zf, dy)
            dz = jnp.where(valid, ndz * zf, dz)

        sx, sy, sz = _keep_finite(sx), _keep_finite(sy), _keep_finite(sz)
        dx, dy, dz = _keep_finite(dx), _keep_finite(dy), _keep_finite(dz)
        return sx, sy, sz, dx, dy, dz, pix_i, smp_i

    return raygen


def make_camera_path_tracer(scene_pack, camera, cfg,
                            block_rows: int = DEFAULT_BLOCK_ROWS,
                            interpret: bool | None = None):
    """Megakernel including in-kernel camera ray generation.

    The kernel's only tensor traffic is its outputs: pixel/sample ids, AA
    jitter, thin-lens DoF (engine.cpp:205-244) and the full path trace all
    happen in VMEM.  Returns ``fn(seed, sample0, lane0=0, n_lanes=None) →
    TraceOutput`` or None if the scene can't be specialized.

    Textured scenes (diffuse maps / textured sky, material.cpp:107-127) use
    the texture-deferred variant: same in-kernel path trace, with texel
    gathers + the radiance fold in an XLA epilogue (texture size unlimited).
    """
    from fspt_tpu.render.integrator import TraceOutput

    if scene_pack.bvh is not None:
        return None  # BVH triangle scenes use ops/pallas_bvh.py / XLA path
    mats = HostMaterials(scene_pack.materials)
    scene = HostScene(scene_pack.geometry)
    if scene.prim_count > MAX_SPECIALIZED_PRIMS:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sky_idx = int(scene_pack.sky_mat)
    if mats.any_textured:
        return _make_deferred_camera_tracer(scene_pack, camera, cfg, scene,
                                            mats, sky_idx, block_rows,
                                            interpret)
    cam = HostCamera(camera, cfg.width, cfg.height)
    core = build_path_core(scene, mats, cfg, sky_idx, cam.z_far,
                           ops=MosaicOps)
    raygen = build_fused_raygen(cam, cfg)

    def kernel(h0_ref, s0_ref, lane0_ref,
               lx_ref, ly_ref, lz_ref, anx_ref, any_ref, anz_ref,
               ad_ref, am_ref, seg_ref):
        shape = lx_ref.shape
        pid = pl.program_id(0)
        sx, sy, sz, dx, dy, dz, pix_i, smp_i = raygen(
            h0_ref[0], s0_ref[0], lane0_ref[0], shape, pid)

        h0_i = jnp.full(shape, h0_ref[0], jnp.int32)
        outs = core(h0_i, sx, sy, sz, dx, dy, dz, pix_i, smp_i)
        (lx_ref[:], ly_ref[:], lz_ref[:], anx_ref[:], any_ref[:], anz_ref[:],
         ad_ref[:], am_ref[:], seg_ref[:]) = outs

    def trace(seed, sample0, lane0=0, n_lanes=None):
        from fspt_tpu.ops import rng as rng_mod

        n = n_lanes if n_lanes is not None else cfg.height * cfg.width * cfg.spp
        rows = pl.cdiv(n, LANE)
        pad_rows = pl.cdiv(rows, block_rows) * block_rows

        seed_u = jnp.asarray(seed).astype(jnp.uint32)
        h0 = rng_mod.pcg_hash(seed_u ^ jnp.uint32(0x9E3779B9))
        h0 = jax.lax.bitcast_convert_type(h0, jnp.int32).reshape(1)
        s0 = jnp.asarray(sample0, jnp.int32).reshape(1)
        l0 = jnp.asarray(lane0, jnp.int32).reshape(1)

        grid = (pad_rows // block_rows,)
        bspec = pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        f32 = jnp.float32
        out_shapes = [jax.ShapeDtypeStruct((pad_rows, LANE), f32) for _ in range(7)]
        out_shapes += [jax.ShapeDtypeStruct((pad_rows, LANE), jnp.int32) for _ in range(2)]

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[sspec, sspec, sspec],
            out_specs=[bspec] * 9,
            out_shape=out_shapes,
            interpret=interpret,
        )(h0, s0, l0)

        lx, ly, lz, anx, any_, anz, ad = [o.reshape(-1)[:n] for o in outs[:7]]
        am, segc = [o.reshape(-1)[:n] for o in outs[7:]]
        return TraceOutput(
            radiance=jnp.stack([lx, ly, lz], axis=-1),
            aov_normal=jnp.stack([anx, any_, anz], axis=-1),
            aov_depth=ad,
            aov_mat=am,
            segments=jnp.sum(segc),
        )

    return trace
