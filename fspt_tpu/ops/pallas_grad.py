"""Speed-of-light fwd+bwd: Pallas megakernel forward + Pallas adjoint kernel.

The planar XLA replay (ops/diff_path.py) makes the flagship path fully
differentiable, but its fwd+bwd runs ~10× below the forward megakernel: XLA
keeps the per-bounce residual chain in HBM.  This module closes the gap for
*material-table* gradients — the inverse-rendering workload of BASELINE
config 4 — by keeping both directions inside Pallas:

* **Forward kernel**: the camera-fused megakernel (same body,
  pallas_path.build_path_core + build_fused_raygen) with the optimized table
  entries read from SMEM instead of baked — so an optimizer can update them
  every step without recompiling.
* **Backward kernel**: ``jax.vjp`` *of the path body itself, traced inside
  the kernel*, w.r.t. those SMEM scalars.  JAX's AD runs at trace time and
  emits the adjoint as straight-line Mosaic vector code; the transpose of
  each broadcast parameter is an in-kernel full reduction, so each grid step
  writes only ``P`` scalar gradient contributions to SMEM, accumulated
  across steps.  Per-lane residuals never touch HBM — the backward pass has
  the same memory profile as the forward kernel.

The two kernels are glued with ``jax.custom_vjp``: the primal is the
forward kernel; the cotangent of the radiance flows into the backward
kernel.  Geometry/camera cotangents are not produced (use ops/diff_path.py
for those); RNG and intersection are parameter-independent, so the
material-gradient is exact — verified against the planar path's AD and
finite differences in tests/test_pallas_grad.py.

Reference analog: the recursive integrator engine.cpp:59-159, which the
reference cannot differentiate at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fspt_tpu import materials as M

from fspt_tpu.ops.pallas_path import (
    LANE,
    MAX_SPECIALIZED_PRIMS,
    PATH_FLOAT_KEYS,
    HostCamera,
    HostMaterials,
    HostScene,
    MosaicOps,
    build_fused_raygen,
    build_path_core,
    build_traced_raygen,
    fold_deferred_params,
)

DEFAULT_BLOCK_ROWS = 16  # 289 vs 271 Mrays/s at 8 on the 1080p bench (r3)

VEC3_FIELDS = ("diffuse", "emissive", "glow")
SCALAR_FIELDS = ("param", "ior", "reflectivity", "frost")
#: Pseudo-field: the 9 traced camera scalars (pallas_path.camera_pvec
#: layout) — always packed LAST, after the material-table columns.
CAMERA_FIELD = "camera"


def _field_size(mats: HostMaterials, f: int) -> int:
    if f == CAMERA_FIELD:
        from fspt_tpu.ops.pallas_path import CAMERA_PARAM_COUNT

        return CAMERA_PARAM_COUNT
    return (3 if f in VEC3_FIELDS else 1) * mats.count


def param_count(mats: HostMaterials, fields) -> int:
    return sum(_field_size(mats, f) for f in fields)


def _ordered(fields):
    """Canonical pack order: material columns first, camera last."""
    mat = [f for f in fields if f != CAMERA_FIELD]
    return tuple(mat) + ((CAMERA_FIELD,) if CAMERA_FIELD in fields else ())


def pack_params(params: dict, fields):
    """Flatten {field: column} (canonical order, camera last) into one
    f32 vector."""
    return jnp.concatenate(
        [jnp.asarray(params[f], jnp.float32).reshape(-1)
         for f in _ordered(fields)])


def unpack_params(pvec, mats: HostMaterials, fields) -> dict:
    """Inverse of pack_params (works on grads too)."""
    out = {}
    off = 0
    for f in _ordered(fields):
        n = _field_size(mats, f)
        col = pvec[off:off + n]
        out[f] = col.reshape(mats.count, 3) if f in VEC3_FIELDS else col
        off += n
    return out


class _RowVec:
    """3-component row view over traced scalars (tmats.diffuse[r][c])."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __getitem__(self, i):
        return self.v[i]


class _FieldView:
    __slots__ = ("rows",)

    def __init__(self, rows):
        self.rows = rows

    def __getitem__(self, r):
        return self.rows[r]


class _TableView:
    """MaterialTable-shaped accessor: selected fields read traced scalars
    (in pack order), the rest fall back to the NumPy snapshot."""

    def __init__(self, mats: HostMaterials, fields, vals):
        it = iter(vals)
        for name in VEC3_FIELDS + SCALAR_FIELDS:
            if name in fields:
                if name in VEC3_FIELDS:
                    rows = [_RowVec([next(it), next(it), next(it)])
                            for _ in range(mats.count)]
                else:
                    rows = [next(it) for _ in range(mats.count)]
                setattr(self, name, _FieldView(rows))
            else:
                setattr(self, name, getattr(mats, name))


def make_grad_path_tracer(scene_pack, camera, cfg,
                          fields=("diffuse", "emissive"),
                          block_rows: int = DEFAULT_BLOCK_ROWS,
                          interpret: bool | None = None):
    """Build the custom-VJP fused tracer.

    Returns ``fn(pvec, seed, sample0, lane0=0, n_lanes=None) →
    (radiance[N,3], segments)`` differentiable w.r.t. ``pvec``
    (= pack_params of the selected table columns), or None when the scene
    can't be specialized (same envelope as the megakernel).  Cotangents for
    the other arguments are zero.
    """
    if scene_pack.bvh is not None:
        return None
    mats = HostMaterials(scene_pack.materials)
    if mats.any_textured:
        return None
    scene = HostScene(scene_pack.geometry)
    if scene.prim_count > MAX_SPECIALIZED_PRIMS:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sky_idx = int(scene_pack.sky_mat)
    cam = HostCamera(camera, cfg.width, cfg.height)
    raygen = build_fused_raygen(cam, cfg)
    P = param_count(mats, fields)

    def _rays_and_body(pv_ref, h0_ref, s0_ref, l0_ref, shape):
        pid = pl.program_id(0)
        sx, sy, sz, dx, dy, dz, pix_i, smp_i = raygen(
            h0_ref[0], s0_ref[0], l0_ref[0], shape, pid)
        h0_i = jnp.full(shape, h0_ref[0], jnp.int32)
        pvals = [pv_ref[i] for i in range(P)]

        def f(*pv):
            tv = _TableView(mats, fields, list(pv))
            core = build_path_core(scene, mats, cfg, sky_idx, cam.z_far,
                                   ops=MosaicOps, tmats=tv)
            outs = core(h0_i, sx, sy, sz, dx, dy, dz, pix_i, smp_i)
            return outs[0], outs[1], outs[2], outs[8]  # Lx, Ly, Lz, segcnt

        return f, pvals

    def fwd_kernel(pv_ref, h0_ref, s0_ref, l0_ref,
                   lx_ref, ly_ref, lz_ref, seg_ref):
        f, pvals = _rays_and_body(pv_ref, h0_ref, s0_ref, l0_ref, lx_ref.shape)
        lx_ref[:], ly_ref[:], lz_ref[:], seg_ref[:] = f(*pvals)

    def bwd_kernel(pv_ref, h0_ref, s0_ref, l0_ref,
                   cx_ref, cy_ref, cz_ref, g_ref):
        f, pvals = _rays_and_body(pv_ref, h0_ref, s0_ref, l0_ref, cx_ref.shape)

        def f3(*pv):
            lx, ly, lz, _ = f(*pv)
            return lx, ly, lz

        _, vjp = jax.vjp(f3, *pvals)
        gs = vjp((cx_ref[:], cy_ref[:], cz_ref[:]))
        first = pl.program_id(0) == 0
        for i in range(P):
            prev = jnp.where(first, 0.0, g_ref[i])
            g_ref[i] = prev + gs[i]

    bspec = lambda: pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    sspec = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jnp.float32

    def _pallas_fwd(pvec, h0, s0, l0, pad_rows):
        out_shapes = [jax.ShapeDtypeStruct((pad_rows, LANE), f32)] * 3 + [
            jax.ShapeDtypeStruct((pad_rows, LANE), jnp.int32)]
        return pl.pallas_call(
            fwd_kernel,
            grid=(pad_rows // block_rows,),
            in_specs=[sspec()] * 4,
            out_specs=[bspec()] * 3 + [bspec()],
            out_shape=out_shapes,
            interpret=interpret,
        )(pvec, h0, s0, l0)

    def _pallas_bwd(pvec, h0, s0, l0, cx, cy, cz):
        pad_rows = cx.shape[0]
        return pl.pallas_call(
            bwd_kernel,
            grid=(pad_rows // block_rows,),
            in_specs=[sspec()] * 4 + [bspec()] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((P,), f32),
            interpret=interpret,
        )(pvec, h0, s0, l0, cx, cy, cz)

    def _impl(pvec, h0, s0, l0, pad_rows_t):
        return _pallas_fwd(pvec, h0, s0, l0, pad_rows_t.shape[0])

    @jax.custom_vjp
    def rad(pvec, h0, s0, l0, pad_rows_t):
        return _impl(pvec, h0, s0, l0, pad_rows_t)

    def rad_fwd(pvec, h0, s0, l0, pad_rows_t):
        outs = _impl(pvec, h0, s0, l0, pad_rows_t)
        return outs, (pvec, h0, s0, l0)

    def rad_bwd(res, cots):
        pvec, h0, s0, l0 = res
        cx, cy, cz, _ = cots
        gvec = _pallas_bwd(pvec, h0, s0, l0, cx, cy, cz)
        f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
        return (gvec, f0(h0), f0(s0), f0(l0),
                jnp.zeros((cx.shape[0],), f32))

    rad.defvjp(rad_fwd, rad_bwd)

    def trace(pvec, seed, sample0, lane0=0, n_lanes=None):
        from fspt_tpu.ops import rng as rng_mod
        from fspt_tpu.render.integrator import TraceOutput

        n = n_lanes if n_lanes is not None else cfg.height * cfg.width * cfg.spp
        rows = pl.cdiv(n, LANE)
        pad_rows = pl.cdiv(rows, block_rows) * block_rows

        seed_u = jnp.asarray(seed).astype(jnp.uint32)
        h0 = rng_mod.pcg_hash(seed_u ^ jnp.uint32(0x9E3779B9))
        h0 = jax.lax.bitcast_convert_type(h0, jnp.int32).reshape(1)
        s0 = jnp.asarray(sample0, jnp.int32).reshape(1)
        l0 = jnp.asarray(lane0, jnp.int32).reshape(1)
        pad_rows_t = jnp.zeros((pad_rows,), f32)  # static shape carrier

        lx, ly, lz, seg2d = rad(jnp.asarray(pvec, f32), h0, s0, l0, pad_rows_t)
        radiance = jnp.stack(
            [lx.reshape(-1)[:n], ly.reshape(-1)[:n], lz.reshape(-1)[:n]],
            axis=-1)
        zeros = jnp.zeros((n,), f32)
        return TraceOutput(
            radiance=radiance,
            aov_normal=jnp.zeros((n, 3), f32),  # this tracer is loss-only
            aov_depth=zeros,
            aov_mat=jnp.zeros((n,), jnp.int32),
            segments=jnp.sum(seg2d.reshape(-1)[:n]),
        )

    trace.fields = fields
    trace.n_params = P
    trace.mats = mats
    return trace


def make_grad_image_fn(scene_pack, camera, cfg,
                       fields=("diffuse", "emissive"),
                       block_rows: int = DEFAULT_BLOCK_ROWS,
                       interpret: bool | None = None):
    """Band-image renderer on the fused fwd+bwd kernels.

    Returns ``img_fn(params, seed, frame_idx, y0, rows) → ([rows,W,3]
    mean-over-spp image, segments)`` differentiable w.r.t. ``params``
    (= dict of the selected table columns), or None when the scene can't be
    specialized.  Drop-in for diff_path.make_image_fn with params instead of
    a full table.
    """
    tracer = make_grad_path_tracer(scene_pack, camera, cfg, fields=fields,
                                   block_rows=block_rows, interpret=interpret)
    if tracer is None:
        return None

    def img_fn(params, seed, frame_idx, y0, rows):
        pvec = pack_params(params, fields)
        lane0 = y0 * cfg.width * cfg.spp
        n = rows * cfg.width * cfg.spp
        out = tracer(pvec, seed, frame_idx * cfg.spp, lane0, n)
        img = out.radiance.reshape(rows, cfg.width, cfg.spp, 3).mean(axis=2)
        return img, out.segments

    return img_fn


def make_affine_grad_image_fn(scene_pack, camera, cfg,
                              block_rows: int = DEFAULT_BLOCK_ROWS,
                              interpret: bool | None = None):
    """Affine-deferred gradient renderer — radiometric fields, any
    specialized scene (textured included).

    The camera-fused megakernel runs in ``defer_all`` mode
    (pallas_path.build_path_core): it traces the exact path and emits the
    per-depth affine transfer planes; the radiance fold
    (fold_deferred_params) runs in XLA over traced table columns and
    texels, so the WHOLE radiometric gradient comes from plain XLA AD of
    a tiny epilogue — no backward kernel, no path re-trace, and the
    Pallas kernel never recompiles as the optimizer moves the parameters.

    Returns ``img_fn(params, seed, frame_idx, y0, rows) → ([rows,W,3]
    mean-over-spp image, segments)`` differentiable w.r.t. ``params`` —
    a dict with any of the keys ``diffuse``/``emissive``/``glow`` ([M,3]
    columns) and ``texels`` ([T,3] texel buffer) — or None when the scene
    can't be specialized.  Exact for radiometric fields (path geometry
    never depends on them); scalar fields that bend rays
    (param/ior/reflectivity/frost) need make_grad_path_tracer.
    """
    if scene_pack.bvh is not None:
        return None
    mats = HostMaterials(scene_pack.materials)
    scene = HostScene(scene_pack.geometry)
    if scene.prim_count > MAX_SPECIALIZED_PRIMS:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sky_idx = int(scene_pack.sky_mat)
    cam = HostCamera(camera, cfg.width, cfg.height)
    core = build_path_core(scene, mats, cfg, sky_idx, cam.z_far,
                           ops=MosaicOps, defer_all=True)
    raygen = build_fused_raygen(cam, cfg)
    n_slots = cfg.effective_depth + (1 if cfg.fast_render else 0)
    textured = mats.any_textured
    # f32 planes: s, k, se (+ u, v when the scene samples real textures).
    fkeys = ("s", "k", "se") + (("u", "v") if textured else ())
    ikeys = ("mat", "mat_e")

    def kernel(h0_ref, s0_ref, lane0_ref, *out_refs):
        f_refs = out_refs[:len(fkeys)]
        i_refs = out_refs[len(fkeys):len(fkeys) + 2]
        pl_ref, seg_ref = out_refs[len(fkeys) + 2:]
        shape = pl_ref.shape
        pid = pl.program_id(0)
        sx, sy, sz, dx, dy, dz, pix_i, smp_i = raygen(
            h0_ref[0], s0_ref[0], lane0_ref[0], shape, pid)
        h0_i = jnp.full(shape, h0_ref[0], jnp.int32)
        slots, p_light, _anx, _any, _anz, _ad, _am, seg = core(
            h0_i, sx, sy, sz, dx, dy, dz, pix_i, smp_i)
        for d, sl in enumerate(slots):
            for fi, nm in enumerate(fkeys):
                f_refs[fi][d] = sl[nm]
            for ii, nm in enumerate(ikeys):
                i_refs[ii][d] = sl[nm]
        pl_ref[:] = p_light.astype(jnp.int32)
        seg_ref[:] = seg

    def planes(seed, sample0, lane0, n):
        from fspt_tpu.ops import rng as rng_mod

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
        out_shapes = [jax.ShapeDtypeStruct(slot_shape, f32)] * len(fkeys)
        out_shapes += [jax.ShapeDtypeStruct(slot_shape, jnp.int32)] * 2
        out_shapes += [jax.ShapeDtypeStruct((pad_rows, LANE), jnp.int32)] * 2

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[sspec] * 3,
            out_specs=[slot_bspec] * (len(fkeys) + 2) + [bspec] * 2,
            out_shape=out_shapes,
            interpret=interpret,
        )(h0, s0, l0)

        flat = lambda a: a.reshape(n_slots, -1)[:, :n]
        fields = {nm: flat(o) for nm, o in zip(fkeys, outs)}
        mat = flat(outs[len(fkeys)])
        mat_e = flat(outs[len(fkeys) + 1])
        pl_mask = outs[len(fkeys) + 2].reshape(-1)[:n] != 0
        segc = outs[len(fkeys) + 3].reshape(-1)[:n]
        return fields, mat, mat_e, pl_mask, jnp.sum(segc)

    table = scene_pack.materials
    base_tex = scene_pack.textures

    def img_fn(params, seed, frame_idx, y0, rows):
        n = rows * cfg.width * cfg.spp
        lane0 = y0 * cfg.width * cfg.spp
        sg = jax.lax.stop_gradient
        fields, mat, mat_e, pl_mask, segs = planes(
            seed, frame_idx * cfg.spp, lane0, n)
        fields = {kk: sg(vv) for kk, vv in fields.items()}
        diffuse = params.get("diffuse", table.diffuse)
        emissive = params.get("emissive", table.emissive)
        glow = params.get("glow", table.glow)
        tex = base_tex
        if "texels" in params:
            tex = base_tex._replace(texels=params["texels"])
        if textured:
            u, v = fields["u"], fields["v"]
        else:
            u = v = jnp.zeros_like(fields["s"])
        Lx, Ly, Lz = fold_deferred_params(
            mats, cfg, diffuse, emissive, glow, tex,
            fields["s"], fields["k"], fields["se"], sg(mat), sg(mat_e),
            u, v, sg(pl_mask))
        rad = jnp.stack([Lx, Ly, Lz], axis=-1)
        img = rad.reshape(rows, cfg.width, cfg.spp, 3).mean(axis=2)
        return img, segs

    img_fn.planes = planes  # stage hook for profiling
    return img_fn


#: Fields whose values scale radiance without ever bending a ray
#: (material.cpp:107-127 analog): path geometry is independent of them,
#: so their gradient needs no adjoint of the trace at all.
RADIOMETRIC_FIELDS = frozenset({"diffuse", "emissive", "glow"})


def _fold_slots(tv, mats: HostMaterials, cfg, slots, p_light):
    """In-kernel affine fold: per-depth ``L += T·(te·se); T *= (tc·s+k)``
    over ``defer_all`` slot planes, with the coef/bias values selected
    from ``tv`` (traced or snapshot) by the static per-row lattice —
    the register-resident mirror of pallas_path.fold_deferred_params
    (untextured scenes; texel scenes use the XLA fold)."""
    mt = mats.mtype
    first = slots[0]["s"]
    one = jnp.ones_like(first)
    Tx = Ty = Tz = one
    Lx = Ly = Lz = jnp.zeros_like(first)
    rows = range(mats.count)
    for sl in slots:
        s, k, se = sl["s"], sl["k"], sl["se"]
        mc, me = sl["mat"], sl["mat_e"]
        tc0 = tc1 = tc2 = jnp.zeros_like(s)
        for r in rows:
            m = mc == r
            d = tv.diffuse[r]
            tc0 = jnp.where(m, d[0], tc0)
            tc1 = jnp.where(m, d[1], tc1)
            tc2 = jnp.where(m, d[2], tc2)
        # Bias column is static per row: glow for Glow, diffuse for Fog,
        # emissive otherwise (lights / sky); me = -1 keeps the implicit
        # unit value (fast-render white terminal).
        te0 = te1 = te2 = one
        for r in rows:
            m = me == r
            if mt[r] == M.GLOW:
                v = tv.glow[r]
            elif mt[r] == M.FOG:
                v = tv.diffuse[r]
            else:
                v = tv.emissive[r]
            te0 = jnp.where(m, v[0], te0)
            te1 = jnp.where(m, v[1], te1)
            te2 = jnp.where(m, v[2], te2)
        Lx = Lx + Tx * (te0 * se)
        Ly = Ly + Ty * (te1 * se)
        Lz = Lz + Tz * (te2 * se)
        Tx = Tx * (tc0 * s + k)
        Ty = Ty * (tc1 * s + k)
        Tz = Tz * (tc2 * s + k)
    n2 = Lx * Lx + Ly * Ly + Lz * Lz
    norm = jnp.sqrt(jnp.maximum(n2, 1e-20))
    clampm = p_light & (norm > cfg.light_clamp)
    sc = jnp.where(clampm, cfg.light_clamp / norm, 1.0)
    return Lx * sc, Ly * sc, Lz * sc


def make_fused_loss_grad_fn(scene_pack, camera, cfg,
                            fields=("diffuse", "emissive"),
                            block_rows: int = DEFAULT_BLOCK_ROWS,
                            interpret: bool | None = None,
                            remat: bool = False,
                            affine: bool | None = None):
    """ONE kernel per band: dual-buffer loss AND parameter gradient.

    The dual-buffer product loss has analytically-known radiance
    cotangents (∂L/∂A = (B−t)·w), so the whole recovery step fuses into a
    single Pallas kernel: trace buffer A, trace buffer B, form the
    residual products, and run both in-kernel adjoints — per band-pair
    that is 2 traces + 2 adjoints, versus the custom-VJP pair's
    2 traces (fwd kernels) + 2 re-traces + 2 adjoints (bwd kernels).
    Per-lane residuals never touch HBM; the kernel's only outputs are the
    SMEM-accumulated loss, P gradients, and segment count.

    Backward constructions, fastest applicable chosen automatically:

    * ``affine`` (default when every field is radiometric —
      diffuse/emissive/glow): the kernel traces both buffers in
      ``defer_all`` mode (the per-depth affine slot planes stay in
      VMEM/registers), folds radiance in-kernel over the traced table
      columns (:func:`_fold_slots`), and ``jax.vjp``s ONLY that tiny
      fold.  The trace never enters the AD graph — path geometry cannot
      depend on radiometric values — so the backward is D steps of
      multiply-adds plus the per-parameter reductions.
    * ``remat=False`` (default): whole-chain in-kernel vjp (the r4
      form) — the general construction for scalar fields that bend rays
      (param/ior/reflectivity/frost) and for ``"camera"``.
    * ``remat=True``: checkpoints the general adjoint at bounce
      boundaries — the forward saves only per-bounce float state
      (pallas_path.PATH_FLOAT_KEYS) and the backward re-traces ONE
      bounce at a time, vjp-ing it against the incoming state cotangent
      (bounds the live set vs. the whole-chain vjp).  CAUTION: interpret
      mode (CPU) executes this construction exactly, but on real TPU the
      Mosaic-compiled remat kernel returns wrong gradients (r5 probe 13:
      whole-chain matches host-CPU AD to ~1e-4 at every tested config;
      remat diverges by orders of magnitude) — a suspected Mosaic
      miscompile of the longer kernel, under investigation.  Do not use
      on TPU until resolved.

    All three produce identical gradients up to float re-association
    (pinned in tests/test_pallas_grad.py).

    The loss pairs SAMPLES (lane-level products, mean over lanes×channels)
    instead of spp-averaged pixels — an equally unbiased estimator of the
    same objective (independent sample sets), one that needs no cross-lane
    reshapes in-kernel.

    Returns ``fn(params, target[rows,W,3], seed, frame_idx, y0, rows) →
    (loss, grads, segments)`` or None when the scene can't be specialized.
    """
    if scene_pack.bvh is not None:
        return None
    mats = HostMaterials(scene_pack.materials)
    if mats.any_textured:
        return None
    scene = HostScene(scene_pack.geometry)
    if scene.prim_count > MAX_SPECIALIZED_PRIMS:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sky_idx = int(scene_pack.sky_mat)
    cam = HostCamera(camera, cfg.width, cfg.height)
    raygen = build_fused_raygen(cam, cfg)
    fields = _ordered(fields)
    use_camera = CAMERA_FIELD in fields
    mat_fields = tuple(f for f in fields if f != CAMERA_FIELD)
    P = param_count(mats, fields)
    P_mat = param_count(mats, mat_fields)
    traygen = build_traced_raygen(cam, cfg) if use_camera else None
    f32 = jnp.float32
    FK = PATH_FLOAT_KEYS
    D = cfg.effective_depth
    radiometric_only = set(fields) <= RADIOMETRIC_FIELDS
    if affine and not radiometric_only:
        raise ValueError(f"affine backward needs radiometric fields, "
                         f"got {fields}")
    use_affine = radiometric_only if affine is None else affine

    def kernel(pv_ref, h0_ref, s0a_ref, s0b_ref, l0_ref, n_ref,
               tx_ref, ty_ref, tz_ref, loss_ref, g_ref, seg_ref):
        pid = pl.program_id(0)
        shape = tx_ref.shape
        pvals = [pv_ref[i] for i in range(P)]

        if use_affine:
            core = build_path_core(scene, mats, cfg, sky_idx, cam.z_far,
                                   ops=MosaicOps, defer_all=True,
                                   want_aovs=False)

            def trace_one(s0):
                sx, sy, sz, dx, dy, dz, pix_i, smp_i = raygen(
                    h0_ref[0], s0, l0_ref[0], shape, pid)
                h0_i = jnp.full(shape, h0_ref[0], jnp.int32)
                slots, p_light, _nx, _ny, _nz, _d, _m, seg = core(
                    h0_i, sx, sy, sz, dx, dy, dz, pix_i, smp_i)
                return slots, p_light, seg

            slotsA, plA, segA = trace_one(s0a_ref[0])
            slotsB, plB, segB = trace_one(s0b_ref[0])
            segc = segA + segB

            def fold6(*pv):
                tv = _TableView(mats, fields, list(pv))
                la = _fold_slots(tv, mats, cfg, slotsA, plA)
                lb = _fold_slots(tv, mats, cfg, slotsB, plB)
                return (*la, *lb)

            (ax, ay, az, bx, by, bz), vjp = jax.vjp(fold6, *pvals)
        elif remat:
            mat_vals = pvals[:P_mat]
            cam_vals = pvals[P_mat:]

            def stepper(pv):
                tv = _TableView(mats, mat_fields, list(pv))
                return build_path_core(scene, mats, cfg, sky_idx, cam.z_far,
                                       ops=MosaicOps, tmats=tv,
                                       return_stepper=True, want_aovs=False)

            def gen_rays(s0):
                if use_camera:
                    return traygen(cam_vals, h0_ref[0], s0, l0_ref[0],
                                   shape, pid)
                return raygen(h0_ref[0], s0, l0_ref[0], shape, pid)

            def forward_one(s0):
                """Trace one buffer, saving every bounce-boundary state."""
                sx, sy, sz, dx, dy, dz, pix_i, smp_i = gen_rays(s0)
                h0_i = jnp.full(shape, h0_ref[0], jnp.int32)
                init, stp, fin = stepper(mat_vals)
                st = init(h0_i, sx, sy, sz, dx, dy, dz, pix_i, smp_i)
                bnds = []
                for d in range(D):
                    bnds.append(st)
                    st, _ = stp(d, st)
                outs = fin(st, [])
                return (outs[0], outs[1], outs[2], outs[8]), st, bnds

            def backward_one(cL, st_fin, bnds, s0):
                """Reverse sweep: re-trace + vjp one bounce at a time;
                the initial-state cotangent then flows through the traced
                raygen for the camera scalars (use_camera)."""
                _, _, fin0 = stepper(mat_vals)

                def fin_f(fvals):
                    s = dict(st_fin)
                    s.update(zip(FK, fvals))
                    o = fin0(s, [])
                    return o[0], o[1], o[2]

                _, vjp_fin = jax.vjp(
                    fin_f, tuple(st_fin[k] for k in FK))
                (cot,) = vjp_fin(cL)
                gacc = [jnp.zeros((), f32)] * P
                for d in reversed(range(D)):
                    st_d = bnds[d]

                    def step_f(pv, fvals, st_d=st_d, d=d):
                        _, stp, _ = stepper(list(pv))
                        s = dict(st_d)
                        s.update(zip(FK, fvals))
                        s2, _ = stp(d, s)
                        return tuple(s2[k] for k in FK)

                    _, vjp_d = jax.vjp(step_f, tuple(mat_vals),
                                       tuple(st_d[k] for k in FK))
                    cpv, cot = vjp_d(tuple(cot))
                    gacc = [g + c for g, c in
                            zip(gacc[:P_mat], cpv)] + gacc[P_mat:]
                if use_camera:
                    init0, _, _ = stepper(mat_vals)

                    def init_f(cam_pv):
                        sx, sy, sz, dx, dy, dz, pix_i, smp_i = traygen(
                            list(cam_pv), h0_ref[0], s0, l0_ref[0], shape,
                            pid)
                        h0_i = jnp.full(shape, h0_ref[0], jnp.int32)
                        st0 = init0(h0_i, sx, sy, sz, dx, dy, dz, pix_i,
                                    smp_i)
                        return tuple(st0[k] for k in FK)

                    _, vjp_i = jax.vjp(init_f, tuple(cam_vals))
                    (gcam,) = vjp_i(tuple(cot))
                    gacc = gacc[:P_mat] + [g + c for g, c in
                                           zip(gacc[P_mat:], gcam)]
                return gacc

            (ax, ay, az, sega), stA, bndA = forward_one(s0a_ref[0])
            (bx, by, bz, segb), stB, bndB = forward_one(s0b_ref[0])
            segc = sega + segb
        else:
            def make_f(s0):
                h0_i = jnp.full(shape, h0_ref[0], jnp.int32)
                if not use_camera:
                    sx, sy, sz, dx, dy, dz, pix_i, smp_i = raygen(
                        h0_ref[0], s0, l0_ref[0], shape, pid)

                def f(*pv):
                    tv = _TableView(mats, mat_fields, list(pv[:P_mat]))
                    if use_camera:
                        # Raygen inside the differentiated body: the
                        # whole-chain vjp covers rays → hits → shading.
                        rs = traygen(list(pv[P_mat:]), h0_ref[0], s0,
                                     l0_ref[0], shape, pid)
                    else:
                        rs = (sx, sy, sz, dx, dy, dz, pix_i, smp_i)
                    core = build_path_core(scene, mats, cfg, sky_idx,
                                           cam.z_far, ops=MosaicOps, tmats=tv)
                    outs = core(h0_i, *rs)
                    return outs[0], outs[1], outs[2], outs[8]

                return f

            fa = make_f(s0a_ref[0])
            fb = make_f(s0b_ref[0])

            def f6(*pv):
                ax, ay, az, sega = fa(*pv)
                bx, by, bz, segb = fb(*pv)
                return (ax, ay, az, bx, by, bz), sega + segb

            (ax, ay, az, bx, by, bz), vjp, segc = jax.vjp(
                f6, *pvals, has_aux=True)

        # Pad-lane mask (the band tail rounds up to block granularity).
        row_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        lane = (pid * shape[0] + row_i) * LANE + col_i
        w = jnp.where(lane < n_ref[0], 1.0, 0.0)

        tx, ty, tz = tx_ref[:], ty_ref[:], tz_ref[:]
        rxa, rya, rza = ax - tx, ay - ty, az - tz
        rxb, ryb, rzb = bx - tx, by - ty, bz - tz
        loss_blk = jnp.sum(w * (rxa * rxb + rya * ryb + rza * rzb))
        if use_affine:
            gs = vjp((rxb * w, ryb * w, rzb * w, rxa * w, rya * w, rza * w))
        elif remat:
            gA = backward_one((rxb * w, ryb * w, rzb * w), stA, bndA,
                              s0a_ref[0])
            gB = backward_one((rxa * w, rya * w, rza * w), stB, bndB,
                              s0b_ref[0])
            gs = [a + b for a, b in zip(gA, gB)]
        else:
            gs = vjp((rxb * w, ryb * w, rzb * w, rxa * w, rya * w, rza * w))
        seg_blk = jnp.sum(jnp.where(lane < n_ref[0], segc, 0))

        first = pid == 0
        loss_ref[0] = jnp.where(first, 0.0, loss_ref[0]) + loss_blk
        seg_ref[0] = jnp.where(first, 0, seg_ref[0]) + seg_blk
        for i in range(P):
            g_ref[i] = jnp.where(first, 0.0, g_ref[i]) + gs[i]

    bspec = pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def fn(params, target, seed, frame_idx, y0, rows):
        from fspt_tpu.ops import rng as rng_mod

        n = rows * cfg.width * cfg.spp
        prows = pl.cdiv(n, LANE)
        pad_rows = pl.cdiv(prows, block_rows) * block_rows
        n_pad = pad_rows * LANE

        pvec = pack_params(params, fields)
        seed_u = jnp.asarray(seed).astype(jnp.uint32)
        h0 = rng_mod.pcg_hash(seed_u ^ jnp.uint32(0x9E3779B9))
        h0 = jax.lax.bitcast_convert_type(h0, jnp.int32).reshape(1)
        s0a = jnp.asarray(frame_idx * cfg.spp, jnp.int32).reshape(1)
        s0b = jnp.asarray((frame_idx + 10007) * cfg.spp,
                          jnp.int32).reshape(1)
        l0 = jnp.asarray(y0 * cfg.width * cfg.spp, jnp.int32).reshape(1)
        n_t = jnp.asarray(n, jnp.int32).reshape(1)

        tgt = jnp.repeat(
            jnp.asarray(target, f32).reshape(rows * cfg.width, 3),
            cfg.spp, axis=0)
        tplanes = [
            jnp.pad(tgt[:, c], (0, n_pad - n)).reshape(pad_rows, LANE)
            for c in range(3)
        ]

        loss_s, gvec, segs = pl.pallas_call(
            kernel,
            grid=(pad_rows // block_rows,),
            in_specs=[sspec] * 6 + [bspec] * 3,
            out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
            out_shape=[jax.ShapeDtypeStruct((1,), f32),
                       jax.ShapeDtypeStruct((P,), f32),
                       jax.ShapeDtypeStruct((1,), jnp.int32)],
            interpret=interpret,
        )(pvec, h0, s0a, s0b, l0, n_t, *tplanes)

        norm = 1.0 / (3.0 * n)
        grads = unpack_params(gvec * norm, mats, fields)
        return loss_s[0] * norm, grads, segs[0]

    fn.fields = fields
    return fn
