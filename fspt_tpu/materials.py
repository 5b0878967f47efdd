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


class ShadeResultP(NamedTuple):
    """Component-planar :class:`ShadeResult` — every vector is three [N]
    planes so nothing materializes [N,3] (42× HBM padding; vecmath planar
    section).  Produced by :func:`shade_planar`; the hot integrator consumes
    this form directly."""

    dx: jnp.ndarray
    dy: jnp.ndarray
    dz: jnp.ndarray  # direction
    cx: jnp.ndarray
    cy: jnp.ndarray
    cz: jnp.ndarray  # coef (rgb)
    bx: jnp.ndarray
    by: jnp.ndarray
    bz: jnp.ndarray  # bias (rgb)
    will_indirect: jnp.ndarray  # [N] bool
    is_light: jnp.ndarray  # [N] bool
    is_fog: jnp.ndarray  # [N] bool
    fdx: jnp.ndarray
    fdy: jnp.ndarray
    fdz: jnp.ndarray  # fog diffuse (rgb)
    fog_density: jnp.ndarray  # [N]


def sample_texture_p(tex: TexturePack, tex_id, tex_scale, tu, tv,
                     fbx, fby, fbz):
    """Planar tiled nearest-neighbor texture fetch (material.cpp:107-127).

    ``x = uint32(u·scale·w + 0.5 − 1) mod w`` (floored mod keeps it in-range
    where the reference's negative-float→uint32 cast is UB).  Texcoords and
    the fallback color arrive as separate planes; texels gather per channel
    so no [N,3] intermediate materializes.
    """
    safe_id = jnp.maximum(tex_id, 0)
    w = tex.width[safe_id]
    h = tex.height[safe_id]
    xf = tu * tex_scale * w.astype(jnp.float32) + 0.5 - 1.0
    yf = tv * tex_scale * h.astype(jnp.float32) + 0.5 - 1.0
    xi = jnp.mod(xf.astype(jnp.int32), w)
    yi = jnp.mod(yf.astype(jnp.int32), h)
    idx = jnp.clip(tex.offset[safe_id] + yi * w + xi,
                   0, tex.texels.shape[0] - 1)
    has = tex_id >= 0
    return (jnp.where(has, tex.texels[:, 0][idx], fbx),
            jnp.where(has, tex.texels[:, 1][idx], fby),
            jnp.where(has, tex.texels[:, 2][idx], fbz))


def sample_texture(tex: TexturePack, tex_id, tex_scale, texcoords, fallback):
    """[N,3]-interface wrapper over :func:`sample_texture_p`."""
    r, g, b = sample_texture_p(
        tex, tex_id, tex_scale, texcoords[..., 0], texcoords[..., 1],
        fallback[..., 0], fallback[..., 1], fallback[..., 2])
    return jnp.stack([r, g, b], axis=-1)


def sample_sky_p(table: MaterialTable, tex: TexturePack, sky_mat,
                 vx, vy, vz):
    """Planar sky radiance for a miss; reference scene.cpp:157-162 (×3).

    ``(vx, vy, vz)`` must be normalized (engine.cpp:92-93).
    """
    tu, tv = vm.sphere_map_texcoords_p(vx, vy, vz)
    ex = table.emissive[sky_mat, 0]
    ey = table.emissive[sky_mat, 1]
    ez = table.emissive[sky_mat, 2]
    r, g, b = sample_texture_p(
        tex, table.tex_id[sky_mat], table.tex_scale[sky_mat], tu, tv,
        jnp.broadcast_to(ex, vx.shape), jnp.broadcast_to(ey, vx.shape),
        jnp.broadcast_to(ez, vx.shape))
    return r * 3.0, g * 3.0, b * 3.0


def sample_sky(table: MaterialTable, tex: TexturePack, sky_mat, view_dir):
    """Sky radiance for a miss; reference scene.cpp:157-162 (×3 boost).

    ``view_dir`` must be normalized (engine.cpp:92-93).
    """
    r, g, b = sample_sky_p(table, tex, sky_mat, view_dir[..., 0],
                           view_dir[..., 1], view_dir[..., 2])
    return jnp.stack([r, g, b], axis=-1)


def _lerped_reflection_p(hx, hy, hz, rx, ry, rz, amount, nx, ny, nz):
    """normal_sphere::random_reflection (reference math/normal.cpp:36-62).

    Lerp a hemisphere-uniform direction with the mirror direction by
    ``amount = solid_angle/π`` and flip the result into the normal hemisphere.
    """
    inv = 1.0 - amount
    ox, oy, oz = vm.normalize_p(hx * amount + rx * inv,
                                hy * amount + ry * inv,
                                hz * amount + rz * inv)
    flip = vm.dot_p(ox, oy, oz, nx, ny, nz) < 0.0
    return (jnp.where(flip, -ox, ox), jnp.where(flip, -oy, oy),
            jnp.where(flip, -oz, oz))


def _random_refraction_p(vx, vy, vz, nx, ny, nz, hx, hy, hz,
                         solid_angle, index, u_aux):
    """normal_sphere::random_refraction (reference math/normal.cpp:64-105)."""
    straight = jnp.abs(index - 1.0) < vm.EPSILON
    fx, fy, fz = vm.refract_p(vx, vy, vz, nx, ny, nz, index)
    fx = jnp.where(straight, vx, fx)
    fy = jnp.where(straight, vy, fy)
    fz = jnp.where(straight, vz, fz)
    fx, fy, fz = vm.normalize_p(fx, fy, fz)

    delta = (u_aux * 2.0 - 1.0) * (solid_angle * 0.5)
    ox, oy, oz = vm.rotate_p(fx, fy, fz, delta, hx, hy, hz)

    full_diffuse = jnp.abs(solid_angle - vm.PI) < vm.EPSILON
    no_spread = jnp.abs(solid_angle) < vm.EPSILON
    ox = jnp.where(no_spread, fx, ox)
    oy = jnp.where(no_spread, fy, oy)
    oz = jnp.where(no_spread, fz, oz)
    return (jnp.where(full_diffuse, hx, ox), jnp.where(full_diffuse, hy, oy),
            jnp.where(full_diffuse, hz, oz))


def shade_planar(
    table: MaterialTable,
    tex: TexturePack,
    mat_idx,
    view,
    normal,
    texcoords,
    uniforms,
) -> ShadeResultP:
    """Sample one bounce direction and the affine radiance transfer.

    The component-planar hot path: every vector argument/result is a tuple
    of [N] planes, every table column gathers separately, and nothing
    materializes an [N,3] (see the vecmath planar section for why).

    Args:
      mat_idx: [N] material row per lane.
      view: (vx,vy,vz) normalized view vector (hit − ray start; engine.cpp:114).
      normal: (nx,ny,nz) surface normal *after* the internal flip
        (scene.cpp:238-247).
      texcoords: (tu,tv) surface texcoords.
      uniforms: (choice, dir_a, dir_b, aux) per-bounce stream draws.
    """
    vx, vy, vz = view
    nx, ny, nz = normal
    tu, tv = texcoords
    u_choice, u_a, u_b, u_aux = uniforms

    mtype = table.mtype[mat_idx]
    dfx = table.diffuse[:, 0][mat_idx]
    dfy = table.diffuse[:, 1][mat_idx]
    dfz = table.diffuse[:, 2][mat_idx]
    emx = table.emissive[:, 0][mat_idx]
    emy = table.emissive[:, 1][mat_idx]
    emz = table.emissive[:, 2][mat_idx]
    glx = table.glow[:, 0][mat_idx]
    gly = table.glow[:, 1][mat_idx]
    glz = table.glow[:, 2][mat_idx]
    param = table.param[mat_idx]
    ior = table.ior[mat_idx]
    reflectivity = table.reflectivity[mat_idx]
    frost = table.frost[mat_idx]
    tex_id = table.tex_id[mat_idx]
    tex_scale = table.tex_scale[mat_idx]

    is_ = lambda t: mtype == t

    # --- bounce direction -------------------------------------------------
    rfx, rfy, rfz = vm.reflect_p(vx, vy, vz, nx, ny, nz)
    spx, spy, spz = vm.uniform_sphere_dir_p(u_a, u_b)
    hflip = vm.dot_p(spx, spy, spz, nx, ny, nz) < 0.0
    hx = jnp.where(hflip, -spx, spx)
    hy = jnp.where(hflip, -spy, spy)
    hz = jnp.where(hflip, -spz, spz)

    # Lobe width (solid_angle/π) for the lerped-reflection family.
    lobe = jnp.where(is_(DIFFUSE), 1.0, 0.0)
    lobe = jnp.where(is_(METAL), param, lobe)
    ceramic_lobe = jnp.where(u_choice < CERAMIC_SPIKE_PROB, 0.0, 1.0 - param)
    lobe = jnp.where(is_(CERAMIC) | is_(GLOW), ceramic_lobe, lobe)
    glass_reflecting = u_choice < reflectivity
    lobe = jnp.where(is_(GLASS), frost, lobe)
    lpx, lpy, lpz = _lerped_reflection_p(hx, hy, hz, rfx, rfy, rfz, lobe,
                                         nx, ny, nz)

    gfx, gfy, gfz = _random_refraction_p(vx, vy, vz, nx, ny, nz, hx, hy, hz,
                                         vm.PI * frost, ior, u_aux)
    gdx = jnp.where(glass_reflecting, lpx, gfx)
    gdy = jnp.where(glass_reflecting, lpy, gfy)
    gdz = jnp.where(glass_reflecting, lpz, gfz)

    lqx, lqy, lqz = vm.refract_p(vx, vy, vz, nx, ny, nz, ior)
    ldx = jnp.where(glass_reflecting, rfx, lqx)
    ldy = jnp.where(glass_reflecting, rfy, lqy)
    ldz = jnp.where(glass_reflecting, rfz, lqz)

    def _dir(mirror, glass, liquid, fog, base_x, base_y, base_z):
        dx = jnp.where(mirror, rfx, base_x)
        dy = jnp.where(mirror, rfy, base_y)
        dz = jnp.where(mirror, rfz, base_z)
        dx = jnp.where(glass, gdx, dx)
        dy = jnp.where(glass, gdy, dy)
        dz = jnp.where(glass, gdz, dz)
        dx = jnp.where(liquid, ldx, dx)
        dy = jnp.where(liquid, ldy, dy)
        dz = jnp.where(liquid, ldz, dz)
        dx = jnp.where(fog, vx, dx)
        dy = jnp.where(fog, vy, dy)
        dz = jnp.where(fog, vz, dz)
        return dx, dy, dz

    dx, dy, dz = _dir(is_(MIRROR), is_(GLASS), is_(LIQUID), is_(FOG),
                      lpx, lpy, lpz)
    zero = jnp.zeros_like(dx)
    light = is_(LIGHT)
    dx = jnp.where(light, zero, dx)
    dy = jnp.where(light, zero, dy)
    dz = jnp.where(light, zero, dz)

    # --- continuation predicate (WillUseIndirectLight) --------------------
    n_dot_l = vm.dot_p(nx, ny, nz, dx, dy, dz)
    will = jnp.ones_like(u_choice, dtype=bool)
    will = jnp.where(light, False, will)
    will = jnp.where(is_(DIFFUSE), n_dot_l > DIFFUSE_CONTRIB_THRESHOLD, will)
    metal_will = (param <= DIFFUSE_ROUGHNESS_THRESHOLD) | (n_dot_l > DIFFUSE_CONTRIB_THRESHOLD)
    will = jnp.where(is_(METAL), metal_will, will)

    # --- affine radiance transfer: Sample(L) = coef·L + bias --------------
    txx, txy, txz = sample_texture_p(tex, tex_id, tex_scale, tu, tv,
                                     dfx, dfy, dfz)
    ndl = jnp.maximum(n_dot_l, 0.0)

    hvx, hvy, hvz = vm.normalize_p(-vx + dx, -vy + dy, -vz + dz)
    hn = vm.dot_p(hvx, hvy, hvz, nx, ny, nz)
    # pow(h·n, 50) with an even integer exponent is positive for negative
    # bases in C++ (material.cpp:280); (hn²)^25 reproduces that exactly.
    spec = jnp.power(hn * hn, CERAMIC_SPEC_POWER // 2)

    is_metal = is_(METAL)
    is_spec_tint = is_(MIRROR) | is_(GLASS) | is_(LIQUID)
    is_ceramic = is_(CERAMIC) | is_(GLOW)
    is_fog = is_(FOG)
    metal_mix = param * ndl + (1.0 - param)
    one = jnp.ones_like(ndl)

    def _coef(tx, df):
        c = tx * ndl  # DIFFUSE
        c = jnp.where(light, 0.0, c)
        c = jnp.where(is_metal, tx * metal_mix, c)
        c = jnp.where(is_spec_tint, df, c)
        c = jnp.where(is_ceramic, spec + tx * ndl * (1.0 - spec), c)
        return jnp.where(is_fog, one, c)

    cx, cy, cz = _coef(txx, dfx), _coef(txy, dfy), _coef(txz, dfz)

    lbx, lby, lbz = sample_texture_p(tex, tex_id, tex_scale, tu, tv,
                                     emx, emy, emz)
    is_glow = is_(GLOW)

    def _bias(lb, gl):
        return jnp.where(is_glow, gl, jnp.where(light, lb, 0.0))

    bx, by, bz = _bias(lbx, glx), _bias(lby, gly), _bias(lbz, glz)

    return ShadeResultP(
        dx=dx, dy=dy, dz=dz,
        cx=cx, cy=cy, cz=cz,
        bx=bx, by=by, bz=bz,
        will_indirect=will,
        is_light=light,
        is_fog=is_fog,
        fdx=dfx, fdy=dfy, fdz=dfz,
        fog_density=frost,
    )


def shade(
    table: MaterialTable,
    tex: TexturePack,
    mat_idx,
    view,
    normal,
    texcoords,
    uniforms,
) -> ShadeResult:
    """[N,3]-interface wrapper over :func:`shade_planar` (one logic
    implementation; the planar form is the hot path).

    Args:
      mat_idx: [N] material row per lane.
      view: [N,3] normalized view vector (hit − ray start; engine.cpp:114).
      normal: [N,3] surface normal *after* the internal flip (scene.cpp:238-247).
      texcoords: [N,2] surface texcoords.
      uniforms: [N,4] per-bounce stream draws (choice, dir_a, dir_b, aux).
    """
    p = shade_planar(
        table, tex, mat_idx,
        (view[..., 0], view[..., 1], view[..., 2]),
        (normal[..., 0], normal[..., 1], normal[..., 2]),
        (texcoords[..., 0], texcoords[..., 1]),
        (uniforms[..., 0], uniforms[..., 1], uniforms[..., 2],
         uniforms[..., 3]),
    )
    st = lambda x, y, z: jnp.stack([x, y, z], axis=-1)
    return ShadeResult(
        direction=st(p.dx, p.dy, p.dz),
        coef=st(p.cx, p.cy, p.cz),
        bias=st(p.bx, p.by, p.bz),
        will_indirect=p.will_indirect,
        is_light=p.is_light,
        is_fog=p.is_fog,
        fog_diffuse=st(p.fdx, p.fdy, p.fdz),
        fog_density=p.fog_density,
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
