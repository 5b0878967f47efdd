"""Batched, branch-free, differentiable material system.

Re-designs the reference's 9-class virtual material hierarchy
(reference material.h:88-328, material.cpp) as a material *parameter table*
plus pure functions evaluated over the whole wavefront with ``jnp.where``
lattices — no per-lane branching, fully differentiable w.r.t. the table.

Key observation enabling the wavefront inversion (SURVEY.md §7): every
``Material::Sample`` in the reference is affine in the indirect radiance
``L``:  ``Sample(L) = coef * L + bias``.  The recursive integrator
(engine.cpp:59-159) therefore folds into the standard throughput form
``radiance += T * bias; T *= coef`` which this module exposes via
:func:`shade`.

Per-type semantics (file:line into /root/reference/source/material.cpp):

==========  =====================================================================
DIFFUSE     Reflection = solid-angle-π lerp sample (97-105); Sample =
            albedo·L·max(0, n·l) (129-137).
LIGHT       No bounce; Sample = emissive or texture (28-53).
METAL       Reflection solid angle π·roughness (155-158); Sample =
            albedo·L·(roughness·max(0,n·l) + (1-roughness)) (160-170).
MIRROR      Perfect reflection (179-182); Sample = L·diffuse (184-190).
GLASS       Stochastic reflect-vs-refract by reflectivity, frosted lobes
            (204-213); Sample = L·diffuse (215-221).
LIQUID      Stochastic smooth reflect/refract (234-240); Sample = L·diffuse.
CERAMIC     10% mirror spike else glossy lobe π·(1-shininess) (262-270);
            Sample = L·spec + albedo·L·max(0,n·l)·(1-spec), spec=(h·n)^50
            (272-282).
GLOW        Ceramic + additive emission (284-301).
FOG         Passthrough direction (314-317); depth-0 distance² absorption
            handled by the integrator (319-339).
==========  =====================================================================
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from fspt_tpu.utils import vecmath as vm

# Material type ids (scene-factory order, reference scene.cpp:283-303).
DIFFUSE, LIGHT, METAL, MIRROR, GLASS, LIQUID, CERAMIC, GLOW, FOG = range(9)

# Thresholds from material.cpp:12-13.
DIFFUSE_CONTRIB_THRESHOLD = 0.001
DIFFUSE_ROUGHNESS_THRESHOLD = 0.95
# Ceramic mirror-spike probability (material.cpp:265) and specular power (280).
CERAMIC_SPIKE_PROB = 0.1
CERAMIC_SPEC_POWER = 50


class MaterialTable(NamedTuple):
    """Struct-of-arrays material parameters, one row per material."""

    mtype: jnp.ndarray  # [M] int32
    diffuse: jnp.ndarray  # [M,3] albedo / tint
    emissive: jnp.ndarray  # [M,3] light emission
    glow: jnp.ndarray  # [M,3] additive glow (GLOW)
    param: jnp.ndarray  # [M] roughness (METAL) / shininess (CERAMIC, GLOW)
    ior: jnp.ndarray  # [M] refraction ratio (GLASS, LIQUID)
    reflectivity: jnp.ndarray  # [M] reflect probability (GLASS, LIQUID)
    frost: jnp.ndarray  # [M] frostiness (GLASS); density*1000 (FOG, cpp:303-307)
    tex_id: jnp.ndarray  # [M] int32 texture index, -1 = none
    tex_scale: jnp.ndarray  # [M] texture tiling scale

    @property
    def count(self):
        return self.mtype.shape[0]


class TexturePack(NamedTuple):
    """All diffuse textures flattened into one texel buffer.

    Replaces per-material `diffuse_map_` (material.h:67-74) with a gather-
    friendly layout: ``texels[offset[t] + y*width[t] + x]``.
    """

    texels: jnp.ndarray  # [K,3] float32 linear RGB
    offset: jnp.ndarray  # [T] int32
    width: jnp.ndarray  # [T] int32
    height: jnp.ndarray  # [T] int32

    @classmethod
    def empty(cls) -> "TexturePack":
        return cls(
            texels=jnp.zeros((1, 3), jnp.float32),
            offset=jnp.zeros((1,), jnp.int32),
            width=jnp.ones((1,), jnp.int32),
            height=jnp.ones((1,), jnp.int32),
        )


class ShadeResult(NamedTuple):
    direction: jnp.ndarray  # [N,3] sampled bounce direction
    coef: jnp.ndarray  # [N,3] multiplier on indirect radiance
    bias: jnp.ndarray  # [N,3] emitted radiance
    will_indirect: jnp.ndarray  # [N] bool — continue the path?
    is_light: jnp.ndarray  # [N] bool — for the depth-0 tone clamp
    is_fog: jnp.ndarray  # [N] bool — depth-0 fog bookkeeping
    fog_diffuse: jnp.ndarray  # [N,3]
    fog_density: jnp.ndarray  # [N]


def sample_texture(tex: TexturePack, tex_id, tex_scale, texcoords, fallback):
    """Tiled nearest-neighbor texture fetch; reference material.cpp:107-127.

    ``x = uint32(u·scale·w + 0.5 − 1) mod w`` (floored mod keeps it in-range
    where the reference's negative-float→uint32 cast is UB).
    """
    safe_id = jnp.maximum(tex_id, 0)
    w = tex.width[safe_id]
    h = tex.height[safe_id]
    xf = texcoords[..., 0] * tex_scale * w.astype(jnp.float32) + 0.5 - 1.0
    yf = texcoords[..., 1] * tex_scale * h.astype(jnp.float32) + 0.5 - 1.0
    xi = jnp.mod(xf.astype(jnp.int32), w)
    yi = jnp.mod(yf.astype(jnp.int32), h)
    idx = tex.offset[safe_id] + yi * w + xi
    texel = tex.texels[jnp.clip(idx, 0, tex.texels.shape[0] - 1)]
    return jnp.where((tex_id >= 0)[..., None], texel, fallback)


def sample_sky(table: MaterialTable, tex: TexturePack, sky_mat, view_dir):
    """Sky radiance for a miss; reference scene.cpp:157-162 (×3 boost).

    ``view_dir`` must be normalized (engine.cpp:92-93).
    """
    texcoords = vm.sphere_map_texcoords(view_dir)
    emissive = table.emissive[sky_mat]
    value = sample_texture(
        tex, table.tex_id[sky_mat], table.tex_scale[sky_mat], texcoords, emissive
    )
    return value * 3.0


def _lerped_reflection(hemi_dir, reflect_dir, amount, normal):
    """normal_sphere::random_reflection (reference math/normal.cpp:36-62).

    Lerp a hemisphere-uniform direction with the mirror direction by
    ``amount = solid_angle/π`` and flip the result into the normal hemisphere.
    """
    r = vm.normalize(hemi_dir * amount[..., None] + reflect_dir * (1.0 - amount)[..., None])
    return jnp.where(vm.dot(r, normal)[..., None] < 0.0, -r, r)


def _random_refraction(view, normal, hemi_dir, solid_angle, index, u_aux):
    """normal_sphere::random_refraction (reference math/normal.cpp:64-105)."""
    straight = jnp.abs(index - 1.0) < vm.EPSILON
    refr = vm.refract(view, normal, index)
    refr = jnp.where(straight[..., None], view, refr)
    refr = vm.normalize(refr)

    delta = (u_aux * 2.0 - 1.0) * (solid_angle * 0.5)
    rotated = vm.rotate(refr, delta, hemi_dir)

    full_diffuse = jnp.abs(solid_angle - vm.PI) < vm.EPSILON
    no_spread = jnp.abs(solid_angle) < vm.EPSILON
    out = jnp.where(no_spread[..., None], refr, rotated)
    return jnp.where(full_diffuse[..., None], hemi_dir, out)


def shade(
    table: MaterialTable,
    tex: TexturePack,
    mat_idx,
    view,
    normal,
    texcoords,
    uniforms,
) -> ShadeResult:
    """Sample one bounce direction and the affine radiance transfer.

    Args:
      mat_idx: [N] material row per lane.
      view: [N,3] normalized view vector (hit − ray start; engine.cpp:114).
      normal: [N,3] surface normal *after* the internal flip (scene.cpp:238-247).
      texcoords: [N,2] surface texcoords.
      uniforms: [N,4] per-bounce stream draws (choice, dir_a, dir_b, aux).
    """
    mtype = table.mtype[mat_idx]
    diffuse = table.diffuse[mat_idx]
    emissive = table.emissive[mat_idx]
    glow = table.glow[mat_idx]
    param = table.param[mat_idx]
    ior = table.ior[mat_idx]
    reflectivity = table.reflectivity[mat_idx]
    frost = table.frost[mat_idx]
    tex_id = table.tex_id[mat_idx]
    tex_scale = table.tex_scale[mat_idx]

    u_choice = uniforms[..., 0]
    u_a = uniforms[..., 1]
    u_b = uniforms[..., 2]
    u_aux = uniforms[..., 3]

    is_ = lambda t: mtype == t

    # --- bounce direction -------------------------------------------------
    reflect_dir = vm.reflect(view, normal)
    sphere_dir = vm.uniform_sphere_dir(u_a, u_b)
    hemi_dir = jnp.where(vm.dot(sphere_dir, normal)[..., None] < 0.0, -sphere_dir, sphere_dir)

    # Lobe width (solid_angle/π) for the lerped-reflection family.
    lobe = jnp.where(is_(DIFFUSE), 1.0, 0.0)
    lobe = jnp.where(is_(METAL), param, lobe)
    ceramic_lobe = jnp.where(u_choice < CERAMIC_SPIKE_PROB, 0.0, 1.0 - param)
    lobe = jnp.where(is_(CERAMIC) | is_(GLOW), ceramic_lobe, lobe)
    glass_reflecting = u_choice < reflectivity
    lobe = jnp.where(is_(GLASS), frost, lobe)
    lerped = _lerped_reflection(hemi_dir, reflect_dir, lobe, normal)

    glass_refr = _random_refraction(view, normal, hemi_dir, vm.PI * frost, ior, u_aux)
    glass_dir = jnp.where(glass_reflecting[..., None], lerped, glass_refr)

    liquid_refr = vm.refract(view, normal, ior)
    liquid_dir = jnp.where(glass_reflecting[..., None], reflect_dir, liquid_refr)

    direction = lerped
    direction = jnp.where(is_(MIRROR)[..., None], reflect_dir, direction)
    direction = jnp.where(is_(GLASS)[..., None], glass_dir, direction)
    direction = jnp.where(is_(LIQUID)[..., None], liquid_dir, direction)
    direction = jnp.where(is_(FOG)[..., None], view, direction)
    direction = jnp.where(is_(LIGHT)[..., None], 0.0, direction)

    # --- continuation predicate (WillUseIndirectLight) --------------------
    n_dot_l = vm.dot(normal, direction)
    will = jnp.ones_like(u_choice, dtype=bool)
    will = jnp.where(is_(LIGHT), False, will)
    will = jnp.where(is_(DIFFUSE), n_dot_l > DIFFUSE_CONTRIB_THRESHOLD, will)
    metal_will = (param <= DIFFUSE_ROUGHNESS_THRESHOLD) | (n_dot_l > DIFFUSE_CONTRIB_THRESHOLD)
    will = jnp.where(is_(METAL), metal_will, will)

    # --- affine radiance transfer: Sample(L) = coef·L + bias --------------
    texel = sample_texture(tex, tex_id, tex_scale, texcoords, diffuse)
    ndl = jnp.maximum(n_dot_l, 0.0)[..., None]

    half_vec = vm.normalize(-view + direction)
    hn = vm.dot(half_vec, normal)
    # pow(h·n, 50) with an even integer exponent is positive for negative
    # bases in C++ (material.cpp:280); (hn²)^25 reproduces that exactly.
    spec = jnp.power(hn * hn, CERAMIC_SPEC_POWER // 2)[..., None]

    coef = texel * ndl  # DIFFUSE
    coef = jnp.where(is_(LIGHT)[..., None], 0.0, coef)
    metal_coef = texel * (param[..., None] * ndl + (1.0 - param)[..., None])
    coef = jnp.where(is_(METAL)[..., None], metal_coef, coef)
    coef = jnp.where((is_(MIRROR) | is_(GLASS) | is_(LIQUID))[..., None], diffuse, coef)
    ceramic_coef = spec + texel * ndl * (1.0 - spec)
    coef = jnp.where((is_(CERAMIC) | is_(GLOW))[..., None], ceramic_coef, coef)
    coef = jnp.where(is_(FOG)[..., None], 1.0, coef)

    light_bias = sample_texture(tex, tex_id, tex_scale, texcoords, emissive)
    bias = jnp.where(is_(LIGHT)[..., None], light_bias, 0.0)
    bias = jnp.where(is_(GLOW)[..., None], glow, bias)

    return ShadeResult(
        direction=direction,
        coef=coef,
        bias=bias,
        will_indirect=will,
        is_light=is_(LIGHT),
        is_fog=is_(FOG),
        fog_diffuse=diffuse,
        fog_density=frost,
    )


# ---------------------------------------------------------------------------
# Host-side table construction


class MaterialSpec:
    """Host-side material description, built by the scene layer."""

    __slots__ = (
        "mtype", "diffuse", "emissive", "glow", "param", "ior",
        "reflectivity", "frost", "tex_id", "tex_scale",
    )

    def __init__(self, mtype, diffuse=(0, 0, 0), emissive=(0, 0, 0), glow=(0, 0, 0),
                 param=0.0, ior=1.0, reflectivity=0.1, frost=0.0,
                 tex_id=-1, tex_scale=1.0):
        self.mtype = mtype
        self.diffuse = diffuse
        self.emissive = emissive
        self.glow = glow
        self.param = param
        self.ior = ior
        self.reflectivity = reflectivity
        self.frost = frost
        self.tex_id = tex_id
        self.tex_scale = tex_scale


def pack_materials(specs) -> MaterialTable:
    """Pack host-side specs into the device table (≥1 row)."""
    if not specs:
        specs = [MaterialSpec(LIGHT)]
    f32 = np.float32
    return MaterialTable(
        mtype=jnp.asarray([s.mtype for s in specs], jnp.int32),
        diffuse=jnp.asarray([s.diffuse for s in specs], f32),
        emissive=jnp.asarray([s.emissive for s in specs], f32),
        glow=jnp.asarray([s.glow for s in specs], f32),
        param=jnp.asarray([s.param for s in specs], f32),
        ior=jnp.asarray([s.ior for s in specs], f32),
        reflectivity=jnp.asarray([s.reflectivity for s in specs], f32),
        frost=jnp.asarray([s.frost for s in specs], f32),
        tex_id=jnp.asarray([s.tex_id for s in specs], jnp.int32),
        tex_scale=jnp.asarray([s.tex_scale for s in specs], f32),
    )
