"""Scene-specialized Pallas intersection megakernel.

The TPU replacement for the reference's hottest loop — per-ray scene
traversal (reference scene.cpp:227-248 → intersect.cpp) — designed for how a
TPU actually runs:

* **Scene → kernel specialization.**  A scene is static for the duration of a
  render, so for small scenes (≲ a few hundred primitives) the compiler bakes
  every primitive's constants directly into the kernel as immediates.  The
  primitive loop is fully unrolled; there are no gathers, no ``[N_rays,
  N_prims]`` HBM intermediates (the XLA brute-force path's bottleneck), and
  the per-lane working set stays in vector registers / VMEM.
* **Lane-major layout.**  Rays live as component-planar ``[rows, 128]``
  tiles (the VPU's native 8×128 shape), not ``[N, 3]`` — every op below is a
  full-width VPU op.
* **Sequential strict-< merge** reproduces the XLA path's first-min
  tie-breaking, so the two intersectors are interchangeable (asserted in
  tests/test_pallas_trace.py).

Large triangle scenes use the tensorized BVH path (ops/bvh.py) instead.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fspt_tpu.ops.intersect import (
    Hit,
    KIND_CUBOID,
    KIND_DISC,
    KIND_PLANE,
    KIND_QUAD,
    KIND_SPHERE,
    KIND_TRIANGLE,
)
from fspt_tpu.scene.geometry import INVALID_PARAM
from fspt_tpu.utils import vecmath as vm

LANE = 128
SUBLANES = 8
DEFAULT_BLOCK_ROWS = 64  # 64×128 = 8192 lanes per grid step

# Above this many primitives, kernel specialization stops paying off
# (compile time, instruction cache); callers should use the BVH path.
MAX_SPECIALIZED_PRIMS = 512


class HostScene:
    """NumPy snapshot of a GeometryPack's *valid* primitives."""

    def __init__(self, g):
        f = lambda x: np.asarray(x)
        sv = f(g.sph_valid)
        self.spheres = [
            (f(g.sph_center)[i], float(f(g.sph_radius)[i]), int(f(g.sph_mat)[i]))
            for i in np.nonzero(sv)[0]
        ]
        pv = f(g.pln_valid)
        self.planes = [
            (f(g.pln_plane)[i], int(f(g.pln_mat)[i])) for i in np.nonzero(pv)[0]
        ]
        dv = f(g.dsc_valid)
        self.discs = [
            (f(g.dsc_plane)[i], f(g.dsc_origin)[i], float(f(g.dsc_radius)[i]),
             int(f(g.dsc_mat)[i]))
            for i in np.nonzero(dv)[0]
        ]
        qv = f(g.qud_valid)
        self.quads = [
            (f(g.qud_plane)[i], f(g.qud_origin)[i], f(g.qud_tangent)[i],
             f(g.qud_bitangent)[i], float(f(g.qud_half_w)[i]),
             float(f(g.qud_half_h)[i]), int(f(g.qud_mat)[i]))
            for i in np.nonzero(qv)[0]
        ]
        cv = f(g.cub_valid)
        self.cuboids = [
            (f(g.cub_planes)[i], int(f(g.cub_mat)[i])) for i in np.nonzero(cv)[0]
        ]
        tv = f(g.tri_valid)
        tidx = np.nonzero(tv)[0]
        self.triangles = [
            (f(g.tri_v0)[i], f(g.tri_e1)[i], f(g.tri_e2)[i], f(g.tri_ng)[i],
             float(f(g.tri_area2)[i]), f(g.tri_n0)[i], f(g.tri_n1)[i],
             f(g.tri_n2)[i], f(g.tri_t0)[i], f(g.tri_t1)[i], f(g.tri_t2)[i],
             int(f(g.tri_mat)[i]))
            for i in tidx
        ]

    @property
    def prim_count(self):
        return (len(self.spheres) + len(self.planes) + len(self.discs)
                + len(self.quads) + 6 * len(self.cuboids) + len(self.triangles))


def _atan2(y, x):
    """Polynomial atan2 (|err| < 2e-5 rad) — Mosaic has no atan2 lowering.

    Minimax atan on [0,1] + octant reconstruction; only feeds sphere-map
    texcoords so ~1e-5 texel error is invisible.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    z = mn / jnp.where(mx > 0.0, mx, 1.0)
    z2 = z * z
    p = z * (0.9998660 + z2 * (-0.3302995 + z2 * (0.1801410
             + z2 * (-0.0851330 + z2 * 0.0208351))))
    half_pi = 0.5 * vm.PI
    r = jnp.where(ay > ax, half_pi - p, p)
    r = jnp.where(x < 0.0, vm.PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def _merge(state, t_new, valid, nx, ny, nz, mat, kind, u=None, v=None):
    """Strict-< closest-hit merge (first primitive wins ties)."""
    t, snx, sny, snz, smat, skind, su, sv_ = state
    better = valid & (t_new < t)
    t = jnp.where(better, t_new, t)
    snx = jnp.where(better, nx, snx)
    sny = jnp.where(better, ny, sny)
    snz = jnp.where(better, nz, snz)
    smat = jnp.where(better, mat, smat)
    skind = jnp.where(better, kind, skind)
    if u is not None:
        su = jnp.where(better, u, su)
        sv_ = jnp.where(better, v, sv_)
    return (t, snx, sny, snz, smat, skind, su, sv_)


@jax.custom_vjp
def _graze_div(ns, ts, floor):
    """``ns / ts`` with a derivative floor on ``|ts|``.

    The plane-hit parameter t = ns/ts is exact in the forward pass, but its
    derivatives scale as 1/ts — at glancing incidence (|ts| = |seg|·cosθ →
    0) reverse-mode cotangents overflow f32 and poison the whole band's
    gradient with 0·inf = NaN (observed through the camera chain at depth
    3).  The backward pass therefore clamps |ts| to ``floor`` (≈1e-3·|seg|,
    i.e. incidence shallower than ~0.06°): values are untouched, well-
    conditioned lanes keep exact derivatives, and pathological lanes get a
    bounded (slightly biased) derivative instead of NaN.
    """
    return ns / ts


def _graze_div_fwd(ns, ts, floor):
    return ns / ts, (ns, ts, floor)


def _graze_div_bwd(res, ct):
    ns, ts, floor = res
    sgn = jnp.where(ts < 0.0, -1.0, 1.0)
    ts_safe = sgn * jnp.maximum(jnp.abs(ts), floor)
    return (ct / ts_safe, -ct * ns / (ts_safe * ts_safe), None)


_graze_div.defvjp(_graze_div_fwd, _graze_div_bwd)


@jax.custom_vjp
def _graze_sqrt(x, floor):
    """``sqrt(x)`` whose backward floors the root at ``floor`` — the
    sphere-tangent analog of :func:`_graze_div` (disc → 0 at grazing
    incidence makes d sqrt = ct/(2·sqrt) explode)."""
    return jnp.sqrt(x)


def _graze_sqrt_fwd(x, floor):
    r = jnp.sqrt(x)
    return r, (r, floor)


def _graze_sqrt_bwd(res, ct):
    r, floor = res
    return (ct / (2.0 * jnp.maximum(r, floor)), None)


_graze_sqrt.defvjp(_graze_sqrt_fwd, _graze_sqrt_bwd)



def intersect_lanes(scene: HostScene, sx, sy, sz, dx, dy, dz,
                    want_texcoords: bool = True):
    """Closest-hit over baked primitives for a lane block.

    Pure function of lane-planar components — callable from any Pallas kernel
    (the standalone intersector below and the full path megakernel in
    ops/pallas_path.py).  Returns ``(t, nx, ny, nz, mat, kind, u, v)``.
    ``want_texcoords=False`` skips the sphere/planar-map math (atan2 etc.)
    for untextured scenes.
    """
    eps = vm.EPSILON
    if True:  # keep the primitive loops' indentation stable
        zero = jnp.zeros_like(sx)
        state = (
            jnp.full_like(sx, INVALID_PARAM), zero, zero, zero,
            jnp.full(sx.shape, -1, jnp.int32), jnp.full(sx.shape, -1, jnp.int32),
            zero, zero,
        )

        kfull = lambda val: jnp.full(sx.shape, val, jnp.int32)
        # Derivative floor for plane-hit divisions (see _graze_div).
        seg_len = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        graze_floor = jax.lax.stop_gradient(1e-3 * seg_len + 1e-20)

        # --- spheres (intersect.cpp:421-488) --------------------------------
        for (c, r, m) in scene.spheres:
            c0, c1, c2 = (float(c[0]), float(c[1]), float(c[2]))
            ox, oy, oz = sx - c0, sy - c1, sz - c2
            a = dx * dx + dy * dy + dz * dz
            b = 2.0 * (ox * dx + oy * dy + oz * dz)
            oc2 = ox * ox + oy * oy + oz * oz
            cc = oc2 - r * r
            disc = b * b - 4.0 * a * cc
            # Miss lanes take sqrt(1), not sqrt(0): sqrt's infinite slope
            # at 0 turns their zero cotangent into 0·inf = NaN in reverse
            # AD (the differentiable planar replay shares this body; same
            # guard as ops/intersect.py).  Valid-lane values are unchanged;
            # near-tangent valid lanes get the _graze_sqrt derivative floor.
            sq = _graze_sqrt(jnp.where(disc >= 0.0, disc, 1.0),
                             jax.lax.stop_gradient(1e-3 * jnp.abs(b) + 1e-12))
            inside = oc2 <= r * r
            tc = jnp.where(inside, -b + sq, -b - sq) / (2.0 * a)
            valid = (disc >= 0.0) & (tc >= 0.0) & (tc <= 1.0)
            px, py, pz = sx + dx * tc, sy + dy * tc, sz + dz * tc
            inv_r = 1.0 / r
            state = _merge(state, tc, valid,
                           (px - c0) * inv_r, (py - c1) * inv_r, (pz - c2) * inv_r,
                           kfull(m), kfull(KIND_SPHERE))

        # --- infinite planes (intersect.cpp:728-745) ------------------------
        for (p, m) in scene.planes:
            p0, p1, p2, pw = (float(p[0]), float(p[1]), float(p[2]), float(p[3]))
            ts = p0 * dx + p1 * dy + p2 * dz
            ns = -(p0 * sx + p1 * sy + p2 * sz + pw)
            np_ = jnp.abs(ts) >= eps
            tc = _graze_div(ns, jnp.where(np_, ts, 1.0),
                            graze_floor)
            valid = np_ & (tc >= 0.0) & (tc <= 1.0)
            ones = jnp.ones_like(sx)
            state = _merge(state, tc, valid, p0 * ones, p1 * ones, p2 * ones,
                           kfull(m), kfull(KIND_PLANE))

        # --- discs (object.cpp:97-113) --------------------------------------
        for (p, o, r, m) in scene.discs:
            p0, p1, p2, pw = (float(p[0]), float(p[1]), float(p[2]), float(p[3]))
            ts = p0 * dx + p1 * dy + p2 * dz
            ns = -(p0 * sx + p1 * sy + p2 * sz + pw)
            np_ = jnp.abs(ts) >= eps
            tc = _graze_div(ns, jnp.where(np_, ts, 1.0),
                            graze_floor)
            px, py, pz = sx + dx * tc, sy + dy * tc, sz + dz * tc
            ex, ey, ez = px - float(o[0]), py - float(o[1]), pz - float(o[2])
            in_r = (ex * ex + ey * ey + ez * ez) <= r * r
            valid = np_ & (tc >= 0.0) & (tc <= 1.0) & in_r
            ones = jnp.ones_like(sx)
            state = _merge(state, tc, valid, p0 * ones, p1 * ones, p2 * ones,
                           kfull(m), kfull(KIND_DISC))

        # --- quads (object.cpp:213-237) -------------------------------------
        for (p, o, tan, bit, hw, hh, m) in scene.quads:
            p0, p1, p2, pw = (float(p[0]), float(p[1]), float(p[2]), float(p[3]))
            ts = p0 * dx + p1 * dy + p2 * dz
            ns = -(p0 * sx + p1 * sy + p2 * sz + pw)
            np_ = jnp.abs(ts) >= eps
            tc = _graze_div(ns, jnp.where(np_, ts, 1.0),
                            graze_floor)
            px, py, pz = sx + dx * tc, sy + dy * tc, sz + dz * tc
            ex, ey, ez = px - float(o[0]), py - float(o[1]), pz - float(o[2])
            td = float(tan[0]) * ex + float(tan[1]) * ey + float(tan[2]) * ez
            bd = float(bit[0]) * ex + float(bit[1]) * ey + float(bit[2]) * ez
            inside = (jnp.abs(bd) <= hw) & (jnp.abs(td) <= hh)
            valid = np_ & (tc >= 0.0) & (tc <= 1.0) & inside
            ones = jnp.ones_like(sx)
            state = _merge(state, tc, valid, p0 * ones, p1 * ones, p2 * ones,
                           kfull(m), kfull(KIND_QUAD))

        # --- cuboids (object.cpp:126-165): 6 faces each ---------------------
        for (planes, m) in scene.cuboids:
            for i in range(6):
                p0, p1, p2, pw = (float(planes[i][0]), float(planes[i][1]),
                                  float(planes[i][2]), float(planes[i][3]))
                ts = p0 * dx + p1 * dy + p2 * dz
                ns = -(p0 * sx + p1 * sy + p2 * sz + pw)
                np_ = jnp.abs(ts) >= eps
                tc = _graze_div(ns, jnp.where(np_, ts, 1.0),
                                graze_floor)
                px, py, pz = sx + dx * tc, sy + dy * tc, sz + dz * tc
                inside = np_
                for jf in range(6):
                    if jf // 2 == i // 2:
                        continue
                    q0, q1, q2, qw = (float(planes[jf][0]), float(planes[jf][1]),
                                      float(planes[jf][2]), float(planes[jf][3]))
                    dist = q0 * px + q1 * py + q2 * pz + qw
                    inside = inside & (dist <= 0.0)
                valid = inside & (tc >= 0.0) & (tc <= 1.0)
                ones = jnp.ones_like(sx)
                state = _merge(state, tc, valid, p0 * ones, p1 * ones, p2 * ones,
                               kfull(m), kfull(KIND_CUBOID))

        # --- triangles (Möller–Trumbore; see ops/intersect.py) --------------
        for (v0, e1, e2, ng, area2, n0, n1, n2, t0, t1, t2, m) in scene.triangles:
            e1x, e1y, e1z = float(e1[0]), float(e1[1]), float(e1[2])
            e2x, e2y, e2z = float(e2[0]), float(e2[1]), float(e2[2])
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            np_ = jnp.abs(det) >= eps * float(area2)
            inv = 1.0 / jnp.where(np_, det, 1.0)
            tx, ty, tz = sx - float(v0[0]), sy - float(v0[1]), sz - float(v0[2])
            ub = (tx * pvx + ty * pvy + tz * pvz) * inv
            qvx = ty * e1z - tz * e1y
            qvy = tz * e1x - tx * e1z
            qvz = tx * e1y - ty * e1x
            vb = (dx * qvx + dy * qvy + dz * qvz) * inv
            tc = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
            valid = (np_ & (ub >= 0.0) & (vb >= 0.0) & (ub + vb <= 1.0)
                     & (tc >= 0.0) & (tc <= 1.0))
            # Interpolated shading normal / texcoords.
            inx = (float(n0[0]) + (float(n1[0]) - float(n0[0])) * ub
                   + (float(n2[0]) - float(n0[0])) * vb)
            iny = (float(n0[1]) + (float(n1[1]) - float(n0[1])) * ub
                   + (float(n2[1]) - float(n0[1])) * vb)
            inz = (float(n0[2]) + (float(n1[2]) - float(n0[2])) * ub
                   + (float(n2[2]) - float(n0[2])) * vb)
            iu = (float(t0[0]) + (float(t1[0]) - float(t0[0])) * ub
                  + (float(t2[0]) - float(t0[0])) * vb)
            iv = (float(t0[1]) + (float(t1[1]) - float(t0[1])) * ub
                  + (float(t2[1]) - float(t0[1])) * vb)
            state = _merge(state, tc, valid, inx, iny, inz, kfull(m),
                           kfull(KIND_TRIANGLE), iu, iv)

        t, nx, ny, nz, mat, kind, uu, vv = state

        if not want_texcoords:
            return t, nx, ny, nz, jnp.maximum(mat, 0), kind, uu, vv

        # Texcoords by winner kind (sphere map / planar map / cuboid ×0.1 /
        # triangle barycentric already merged).
        px, py, pz = sx + dx * t, sy + dy * t, sz + dz * t
        two_pi = 2.0 * vm.PI
        su = _atan2(nx, nz) / two_pi + 0.5
        sv = 1.0 - (ny * 0.5 + 0.5)
        use_x = (nx > ny) & (nx > nz)
        use_y = (ny > nx) & (ny > nz) & ~use_x
        pu = jnp.where(use_x, py, jnp.where(use_y, px, px))
        pv = jnp.where(use_x, pz, jnp.where(use_y, pz, py))
        scale = jnp.where(kind == KIND_CUBOID, 0.1, 1.0)
        uu = jnp.where(kind == KIND_SPHERE, su,
                       jnp.where(kind == KIND_TRIANGLE, uu, pu * scale))
        vv = jnp.where(kind == KIND_SPHERE, sv,
                       jnp.where(kind == KIND_TRIANGLE, vv, pv * scale))

        return t, nx, ny, nz, jnp.maximum(mat, 0), kind, uu, vv


def _build_kernel(scene: HostScene):
    def kernel(sx_ref, sy_ref, sz_ref, dx_ref, dy_ref, dz_ref,
               t_ref, nx_ref, ny_ref, nz_ref, mat_ref, kind_ref, u_ref, v_ref):
        t, nx, ny, nz, mat, kind, uu, vv = intersect_lanes(
            scene, sx_ref[:], sy_ref[:], sz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:],
        )
        t_ref[:] = t
        nx_ref[:] = nx
        ny_ref[:] = ny
        nz_ref[:] = nz
        mat_ref[:] = mat
        kind_ref[:] = kind
        u_ref[:] = uu
        v_ref[:] = vv

    return kernel


def make_pallas_intersector(geometry, block_rows: int = DEFAULT_BLOCK_ROWS,
                            interpret: bool | None = None):
    """Compile a scene-specialized intersector: ``fn(start[N,3], seg[N,3]) → Hit``.

    Returns None when the scene is too large to specialize (use the BVH path).
    ``interpret`` defaults to True off-TPU so tests exercise the same kernel
    logic on the CPU mesh.
    """
    scene = HostScene(geometry)
    if scene.prim_count > MAX_SPECIALIZED_PRIMS:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = _build_kernel(scene)

    def intersect(start, seg):
        n = start.shape[0]
        rows = pl.cdiv(n, LANE)
        pad_rows = pl.cdiv(rows, block_rows) * block_rows
        n_pad = pad_rows * LANE

        def comp(x, i):
            flat = jnp.pad(x[:, i], (0, n_pad - n))
            return flat.reshape(pad_rows, LANE)

        args = [comp(start, 0), comp(start, 1), comp(start, 2),
                comp(seg, 0), comp(seg, 1), comp(seg, 2)]

        grid = (pad_rows // block_rows,)
        bspec = pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        f32 = jnp.float32
        out_shapes = [jax.ShapeDtypeStruct((pad_rows, LANE), f32) for _ in range(4)]
        out_shapes += [jax.ShapeDtypeStruct((pad_rows, LANE), jnp.int32) for _ in range(2)]
        out_shapes += [jax.ShapeDtypeStruct((pad_rows, LANE), f32) for _ in range(2)]

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bspec] * 6,
            out_specs=[bspec] * 8,
            out_shape=out_shapes,
            interpret=interpret,
        )(*args)

        t, nx, ny, nz, mat, kind, uu, vv = [o.reshape(-1)[:n] for o in outs]
        point = start + seg * t[:, None]
        normal = jnp.stack([nx, ny, nz], axis=-1)
        texcoords = jnp.stack([uu, vv], axis=-1)
        return Hit(
            t=t,
            point=point,
            normal=normal,
            texcoords=texcoords,
            mat=mat,
            prim_kind=kind,
            hit=t < INVALID_PARAM,
        )

    return intersect
