"""Scalar NumPy oracle renderer — the golden reference for tests.

A deliberately slow, obviously-correct transliteration of the reference
integrator's *semantics* (reference engine.cpp:59-250, material.cpp,
object.cpp, scene.cpp:227-248) in per-pixel recursive NumPy.  It shares the
counter-based RNG streams (ops/rng.py) with the wavefront renderer, so both
consume bit-identical uniforms and the TPU image must match the oracle to
float tolerance — the SURVEY.md §4.2 test strategy.

This module intentionally avoids jax: it is an independent implementation
(different control flow, different library) whose agreement with the
wavefront integrator is strong evidence both are right.
"""

from __future__ import annotations

import math

import numpy as np

from fspt_tpu import materials as M
from fspt_tpu.ops import rng

EPSILON = 1.0e-5
PI = 3.14159262
INVALID = 2.0


def _normalize(v):
    n = math.sqrt(float(np.dot(v, v)))
    return v / n if n > 0 else v * 0.0


def _reflect(v, n):
    return v - n * (2.0 * float(np.dot(n, v)))


def _refract(v, n, index):
    ndv = -float(np.dot(v, n))
    sin2 = index * index * (1.0 - ndv * ndv)
    if sin2 >= 1.0:
        return np.zeros(3, np.float32)
    r = v * index + n * (index * ndv - math.sqrt(1.0 - sin2))
    return _normalize(r)


def _rotate(v, angle, axis):
    c, s = math.cos(angle), math.sin(angle)
    ic = 1.0 - c
    ax, ay, az = axis
    x, y, z = v
    return np.array(
        [
            (c + ic * ax * ax) * x + (ic * ax * ay - az * s) * y + (ic * ax * az + ay * s) * z,
            (ic * ax * ay + az * s) * x + (c + ic * ay * ay) * y + (ic * ay * az - ax * s) * z,
            (ic * ax * az - ay * s) * x + (ic * ay * az + ax * s) * y + (c + ic * az * az) * z,
        ],
        np.float32,
    )


def _sphere_dir(u1, u2):
    z = 1.0 - 2.0 * u1
    r = math.sqrt(max(1.0 - z * z, 0.0))
    phi = 2.0 * PI * u2
    return np.array([r * math.cos(phi), r * math.sin(phi), z], np.float32)


def _sphere_map(normal):
    u = math.atan2(normal[0], normal[2]) / (2.0 * PI) + 0.5
    v = normal[1] * 0.5 + 0.5
    return np.array([u, 1.0 - v], np.float32)


def _planar_map(point, normal):
    n0, n1, n2 = normal
    if n0 > n1 and n0 > n2:
        return np.array([point[1], point[2]], np.float32)
    if n1 > n0 and n1 > n2:
        return np.array([point[0], point[2]], np.float32)
    return np.array([point[0], point[1]], np.float32)


# ---------------------------------------------------------------------------
# Intersection (iterates primitives in the same type order as the device
# kernels so strict-< tie-breaking matches)


class OracleHit:
    __slots__ = ("t", "point", "normal", "mat", "texcoords", "internal")

    def __init__(self):
        self.t = INVALID
        self.point = np.zeros(3, np.float32)
        self.normal = np.zeros(3, np.float32)
        self.mat = -1
        self.texcoords = np.zeros(2, np.float32)
        self.internal = False


def _plane_t(plane, start, seg):
    ts = float(np.dot(plane[:3], seg))
    if abs(ts) < EPSILON:
        return None
    t = -(float(np.dot(plane[:3], start)) + plane[3]) / ts
    if t < 0.0 or t > 1.0:
        return None
    return t


def trace_scene(builder, start, seg):
    """Closest hit over the builder's host-side primitives."""
    hit = OracleHit()

    for s in builder._spheres:
        c = np.asarray(s["center"], np.float32)
        r = s["radius"]
        oc = start - c
        a = float(np.dot(seg, seg))
        b = 2.0 * float(np.dot(oc, seg))
        cc = float(np.dot(oc, oc)) - r * r
        d = b * b - 4.0 * a * cc
        if d < 0.0:
            continue
        if float(np.dot(oc, oc)) <= r * r:
            t = (-b + math.sqrt(d)) / (2 * a)
        else:
            t = (-b - math.sqrt(d)) / (2 * a)
        if t < 0.0 or t > 1.0 or t >= hit.t:
            continue
        hit.t = t
        hit.point = start + seg * t
        hit.normal = _normalize(hit.point - c)
        hit.mat = s["mat"]
        hit.texcoords = _sphere_map(hit.normal)

    for p in builder._planes:
        t = _plane_t(np.asarray(p["plane"], np.float32), start, seg)
        if t is None or t >= hit.t:
            continue
        hit.t = t
        hit.point = start + seg * t
        hit.normal = np.asarray(p["plane"][:3], np.float32)
        hit.mat = p["mat"]
        hit.texcoords = _planar_map(hit.point, hit.normal)

    for dsc in builder._discs:
        t = _plane_t(np.asarray(dsc["plane"], np.float32), start, seg)
        if t is None or t >= hit.t:
            continue
        point = start + seg * t
        if np.linalg.norm(point - dsc["origin"]) > dsc["radius"]:
            continue
        hit.t = t
        hit.point = point
        hit.normal = np.asarray(dsc["plane"][:3], np.float32)
        hit.mat = dsc["mat"]
        hit.texcoords = _planar_map(point, hit.normal)

    for q in builder._quads:
        t = _plane_t(np.asarray(q["plane"], np.float32), start, seg)
        if t is None or t >= hit.t:
            continue
        point = start + seg * t
        ph = point - q["origin"]
        if abs(float(np.dot(q["bitangent"], ph))) > q["half_w"]:
            continue
        if abs(float(np.dot(q["tangent"], ph))) > q["half_h"]:
            continue
        hit.t = t
        hit.point = point
        hit.normal = np.asarray(q["plane"][:3], np.float32)
        hit.mat = q["mat"]
        hit.texcoords = _planar_map(point, hit.normal)

    for c in builder._cuboids:
        planes = c["planes"]
        for i in range(6):
            t = _plane_t(planes[i], start, seg)
            if t is None or t >= hit.t:
                continue
            point = start + seg * t
            ok = True
            for jf in range(6):
                if jf // 2 == i // 2:
                    continue
                if float(np.dot(planes[jf][:3], point)) + planes[jf][3] > 0.0:
                    ok = False
                    break
            if not ok:
                continue
            hit.t = t
            hit.point = point
            hit.normal = planes[i][:3].copy()
            hit.mat = c["mat"]
            hit.texcoords = _planar_map(point, hit.normal) * 0.1

    for chunk in builder._tri_chunks:
        v0s, v1s, v2s = chunk["v0"], chunk["v1"], chunk["v2"]
        mats = chunk["mat"]
        for i in range(len(v0s)):
            v0, v1, v2 = v0s[i], v1s[i], v2s[i]
            e1, e2 = v1 - v0, v2 - v0
            cr = np.cross(e1, e2)
            area2 = float(np.linalg.norm(cr))
            pvec = np.cross(seg, e2)
            det = float(np.dot(e1, pvec))
            if abs(det) < EPSILON * area2:
                continue
            inv = 1.0 / det
            tvec = start - v0
            u = float(np.dot(tvec, pvec)) * inv
            qvec = np.cross(tvec, e1)
            v = float(np.dot(seg, qvec)) * inv
            t = float(np.dot(e2, qvec)) * inv
            if u < 0 or v < 0 or u + v > 1 or t < 0 or t > 1 or t >= hit.t:
                continue
            hit.t = t
            hit.point = start + seg * t
            ng = cr / area2 if area2 > 0 else cr
            n0 = chunk.get("n0", None)
            if n0 is not None:
                nn0, nn1, nn2 = chunk["n0"][i], chunk["n1"][i], chunk["n2"][i]
                hit.normal = nn0 + (nn1 - nn0) * u + (nn2 - nn0) * v
            else:
                hit.normal = ng.astype(np.float32)
            t0 = chunk.get("t0", None)
            if t0 is not None:
                tt0, tt1, tt2 = chunk["t0"][i], chunk["t1"][i], chunk["t2"][i]
                hit.texcoords = tt0 + (tt1 - tt0) * u + (tt2 - tt0) * v
            else:
                hit.texcoords = np.zeros(2, np.float32)
            hit.mat = int(mats[i])

    if hit.t < INVALID:
        # Backface flip (scene.cpp:238-247).
        if float(np.dot(hit.normal, start - hit.point)) < 0.0:
            hit.normal = -hit.normal
            hit.internal = True
        return hit
    return None


# ---------------------------------------------------------------------------
# Materials


def _texel(spec, textures, texcoords, fallback):
    if spec.tex_id < 0:
        return np.asarray(fallback, np.float32)
    img = textures[spec.tex_id]
    h, w = img.shape[:2]
    xi = int(texcoords[0] * spec.tex_scale * w + 0.5 - 1.0) % w
    yi = int(texcoords[1] * spec.tex_scale * h + 0.5 - 1.0) % h
    return img[yi, xi].astype(np.float32)


def sample_sky(builder, sky_idx, view_dir):
    spec = _spec(builder, sky_idx)
    tc = _sphere_map(view_dir)
    return _texel(spec, builder._textures, tc, spec.emissive) * 3.0


def _spec(builder, idx):
    mats = builder._materials
    if idx < len(mats):
        return mats[idx]
    return M.MaterialSpec(M.LIGHT)  # implicit black sky row


def _lerped_reflection(hemi, reflect_dir, amount, normal):
    r = _normalize(hemi * amount + reflect_dir * (1.0 - amount))
    if float(np.dot(r, normal)) < 0.0:
        r = -r
    return r


def material_bounce(spec, view, normal, u):
    """Reflection() + WillUseIndirectLight(); returns (direction, will)."""
    u_choice, u_a, u_b, u_aux = (float(x) for x in u)
    reflect_dir = _reflect(view, normal)
    sph = _sphere_dir(u_a, u_b)
    hemi = -sph if float(np.dot(sph, normal)) < 0.0 else sph

    t = spec.mtype
    if t == M.LIGHT:
        return np.zeros(3, np.float32), False
    if t == M.DIFFUSE:
        d = _lerped_reflection(hemi, reflect_dir, 1.0, normal)
        return d, float(np.dot(d, normal)) > M.DIFFUSE_CONTRIB_THRESHOLD
    if t == M.METAL:
        d = _lerped_reflection(hemi, reflect_dir, spec.param, normal)
        will = (spec.param <= M.DIFFUSE_ROUGHNESS_THRESHOLD) or (
            float(np.dot(d, normal)) > M.DIFFUSE_CONTRIB_THRESHOLD
        )
        return d, will
    if t == M.MIRROR:
        return reflect_dir, True
    if t in (M.CERAMIC, M.GLOW):
        amount = 0.0 if u_choice < M.CERAMIC_SPIKE_PROB else 1.0 - spec.param
        return _lerped_reflection(hemi, reflect_dir, amount, normal), True
    if t == M.GLASS:
        if u_choice < spec.reflectivity:
            return _lerped_reflection(hemi, reflect_dir, spec.frost, normal), True
        # random_refraction (normal.cpp:64-105)
        sa = PI * spec.frost
        if abs(spec.ior - 1.0) < EPSILON:
            refr = view.copy()
        else:
            refr = _refract(view, normal, spec.ior)
        refr = _normalize(refr)
        if abs(sa - PI) < EPSILON:
            return hemi, True
        if abs(sa) < EPSILON:
            return refr, True
        delta = (u_aux * 2.0 - 1.0) * (sa * 0.5)
        return _rotate(refr, delta, hemi), True
    if t == M.LIQUID:
        if u_choice < spec.reflectivity:
            return reflect_dir, True
        return _refract(view, normal, spec.ior), True
    if t == M.FOG:
        return view.copy(), True
    raise ValueError(f"unknown material type {t}")


def material_sample(spec, textures, depth, sample_pos, view, light_pos,
                    light_dir, light_color, normal, texcoords, fog_u):
    """Material::Sample dispatch (material.cpp)."""
    t = spec.mtype
    if t == M.LIGHT:
        return _texel(spec, textures, texcoords, spec.emissive)
    if t == M.DIFFUSE:
        texel = _texel(spec, textures, texcoords, spec.diffuse)
        return texel * light_color * max(0.0, float(np.dot(normal, light_dir)))
    if t == M.METAL:
        texel = _texel(spec, textures, texcoords, spec.diffuse)
        ndl = max(0.0, float(np.dot(normal, light_dir)))
        return texel * light_color * (spec.param * ndl + (1.0 - spec.param))
    if t in (M.MIRROR, M.GLASS, M.LIQUID):
        return light_color * np.asarray(spec.diffuse, np.float32)
    if t in (M.CERAMIC, M.GLOW):
        half = _normalize(-view + light_dir)
        hn = float(np.dot(half, normal))
        dot_spec = (hn * hn) ** (M.CERAMIC_SPEC_POWER // 2)
        texel = _texel(spec, textures, texcoords, spec.diffuse)
        ndl = max(0.0, float(np.dot(normal, light_dir)))
        out = light_color * dot_spec + texel * light_color * ndl * (1.0 - dot_spec)
        if t == M.GLOW:
            out = out + np.asarray(spec.glow, np.float32)
        return out
    if t == M.FOG:
        if depth == 0:
            dist = float(np.linalg.norm(light_pos - sample_pos))
            thresh = min(max(dist * dist * spec.frost * 0.00005, 0.0), 1.0)
            if fog_u < thresh:
                return np.asarray(spec.diffuse, np.float32)
        return light_color
    raise ValueError(f"unknown material type {t}")


# ---------------------------------------------------------------------------
# Recursive integrator (TraceStep, engine.cpp:59-159)


def trace_step(builder, sky_idx, cfg, start, seg, depth, pixel, sample, seed,
               z_far, result):
    if depth >= cfg.max_depth:
        return np.zeros(3, np.float32), start + seg
    if cfg.fast_render and depth > 1:
        return np.ones(3, np.float32), start + seg

    result["segments"] += 1

    hit = trace_scene(builder, start, seg)
    if hit is None:
        view = _normalize(seg)
        out = sample_sky(builder, sky_idx, view)
        if depth == 0:
            result["color"] = out
            result["normal"] = view
            result["mat"] = sky_idx
            result["depth"] = z_far
        return out, start + seg

    spec = _spec(builder, hit.mat)
    view = _normalize(hit.point - start)
    u = np.array(
        [
            rng.stream_uniform(seed, pixel, sample, rng.CTR_BOUNCE + depth * cfg.bounce_slots + s)
            for s in range(4)
        ],
        np.float32,
    )
    direction, will = material_bounce(spec, view, hit.normal, u)

    new_start = hit.point + direction * cfg.ray_offset
    new_seg = direction * (z_far - cfg.ray_offset)

    indirect = np.zeros(3, np.float32)
    indirect_origin = np.zeros(3, np.float32)
    if will:
        indirect, indirect_origin = trace_step(
            builder, sky_idx, cfg, new_start, new_seg, depth + 1, pixel, sample,
            seed, z_far, result,
        )

    out = material_sample(
        spec, builder._textures, depth, hit.point, view, indirect_origin,
        direction, indirect, hit.normal, hit.texcoords, float(u[3]),
    )

    if depth == 0:
        if spec.mtype == M.LIGHT:
            norm = float(np.linalg.norm(out))
            if norm > cfg.light_clamp:
                out = out / norm * cfg.light_clamp
        result["color"] = out
        result["normal"] = hit.normal
        result["mat"] = hit.mat
        result["depth"] = float(np.linalg.norm(hit.point - start))

    return out, hit.point


def camera_ray(camera_np, width, height, i, j, seed, pixel, sample):
    """Per-pixel transliteration of engine.cpp:184-244 in NumPy."""
    origin = np.asarray(camera_np["origin"], np.float32)
    target = np.asarray(camera_np["target"], np.float32)
    z_far = float(camera_np["z_far"])
    forward = _normalize(target - origin)
    right = _normalize(np.cross(np.array([0.0, 1.0, 0.0], np.float32), forward))
    up = _normalize(np.cross(forward, right))
    fovy = float(camera_np["fov_y"]) * PI / 180.0
    aspect = width / height
    fovx = 2.0 * math.atan(math.tan(fovy * 0.5) * aspect)
    half_h = math.tan(fovy * 0.5) * z_far
    half_w = math.tan(fovx * 0.5) * z_far
    proj_origin = origin + forward * z_far

    u = [
        float(rng.stream_uniform(seed, pixel, sample, rng.CTR_CAMERA + s))
        for s in range(4)
    ]
    x_dist = half_w * (((i + u[0] - 0.5) / (width - 1)) * 2.0 - 1.0)
    y_dist = half_h * (((j + u[1] - 0.5) / (height - 1)) * 2.0 - 1.0)
    stop = proj_origin + right * x_dist + up * y_dist
    start = origin.copy()
    seg = stop - start

    aperture = float(camera_np["aperture_size"])
    if aperture > 0.0:
        focal_plane_n = -forward
        focal_point_on = origin + forward * float(camera_np["focal_depth"])
        plane = np.concatenate([focal_plane_n, [-float(np.dot(focal_plane_n, focal_point_on))]])
        t = _plane_t(plane.astype(np.float32), start, seg)
        if t is not None:
            focal_hit = start + seg * t
            angle = u[2] * 2.0 * PI
            mag = math.sqrt(u[3]) * aperture
            offset = right * math.cos(angle) * mag + up * math.sin(angle) * mag
            start = start + offset
            seg = _normalize(focal_hit - start) * z_far
    return start, seg


def render(builder, camera, cfg, seed, frames=1):
    """Full oracle render: returns (mean image [H,W,3], aov dict)."""
    if hasattr(camera, "_asdict"):
        cam = {k: np.asarray(v) for k, v in camera._asdict().items()}
    else:
        cam = camera
    sky_idx = builder._sky_mat
    if sky_idx is None:
        sky_idx = len(builder._materials)  # implicit black sky row
    H, W = cfg.height, cfg.width
    mean = np.zeros((H, W, 3), np.float32)
    aov_normal = np.zeros((H, W, 3), np.float32)
    aov_depth = np.zeros((H, W), np.float32)
    aov_mat = np.zeros((H, W), np.int64)
    count = 0
    segments = 0
    for frame in range(frames):
        for s_local in range(cfg.spp):
            sample = frame * cfg.spp + s_local
            for j in range(H):
                for i in range(W):
                    pixel = j * W + i
                    start, seg = camera_ray(cam, W, H, float(i), float(j), seed, pixel, sample)
                    result = {"segments": 0}
                    color, _ = trace_step(
                        builder, sky_idx, cfg, start, seg, 0, pixel, sample,
                        seed, float(cam["z_far"]), result,
                    )
                    segments += result["segments"]
                    mean[j, i] = (mean[j, i] * count + result.get("color", color)) / (count + 1)
                    aov_normal[j, i] = result.get("normal", 0.0)
                    aov_depth[j, i] = result.get("depth", 0.0)
                    aov_mat[j, i] = result.get("mat", 0)
            # per-sample loop keeps the running mean identical to WritePixel
            count += 1
    return mean, dict(normal=aov_normal, depth=aov_depth, mat=aov_mat, segments=segments)
