"""Round-3 mesh profiler: stage decomposition + per-bounce visits, one process.

Replays the integrator's bounce loop outside jit to capture each bounce's
actual wavefront (start/seg/alive), then times every pipeline stage on those
real wavefronts and reports sweep leaf-visit counts.  All numbers from one
process so relay variance doesn't scramble cross-stage comparisons.

    python examples/profile_mesh_r3.py [width height spp depth]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=4, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main(width=1024, height=256, spp=4, depth=4):
    from bench import build_mesh_scene
    from fspt_tpu.camera import generate_rays
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops import pallas_bvh as pb
    from fspt_tpu.render import integrator
    from fspt_tpu import materials as mat_mod
    from fspt_tpu.ops import rng
    from fspt_tpu.utils import vecmath as vm

    log(f"backend: {jax.default_backend()}")
    builder = build_mesh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=depth)
    inter = pb.make_mesh_intersector(scene)
    n = width * height * spp
    log(f"wavefront: {n} lanes, depth={depth}")

    # --- capture real per-bounce wavefronts by replaying the loop ---
    start, seg, pix, samp = jax.jit(
        lambda: generate_rays(camera, cfg.width, cfg.height, cfg.spp, 7, 0))()
    table, tex = scene.materials, scene.textures
    waves = []
    alive = jnp.ones((n,), bool)
    z_far = float(np.asarray(camera.z_far))
    for d in range(depth):
        waves.append((start, seg, alive))
        hit = jax.jit(lambda s, g, a: inter(s, g, a))(start, seg, alive)
        side = vm.dot(hit.normal, start - hit.point)
        normal = jnp.where((side < 0.0)[:, None], -hit.normal, hit.normal)
        active = alive & hit.hit
        view = vm.normalize(hit.point - start)
        uniforms = rng.bounce_uniforms(7, pix, samp, d, cfg.bounce_slots)
        sh = mat_mod.shade(table, tex, hit.mat, view, normal, hit.texcoords,
                           uniforms)
        new_start = hit.point + sh.direction * cfg.ray_offset
        new_seg = sh.direction * (z_far - cfg.ray_offset)
        start = jnp.where(active[:, None], new_start, start)
        seg = jnp.where(active[:, None], new_seg, seg)
        alive = active & sh.will_indirect
        log(f"bounce {d}: live={int(alive.sum())}")

    # --- stage timings on each bounce's wavefront ---
    trav = inter  # full intersector
    # underlying traverser pieces
    from fspt_tpu.ops.bvh import build_bvh
    fine = scene.bvh
    order0 = np.argsort(np.asarray(fine.tri_id))
    v0 = np.asarray(fine.tri_v0)[order0]
    v1 = v0 + np.asarray(fine.tri_e1)[order0]
    v2 = v0 + np.asarray(fine.tri_e2)[order0]
    coarse = build_bvh(v0, v1, v2, max_leaf=pb.TREELET)
    ct = pb.make_culled_traverser(coarse, block_rays=128, group=8)
    mlo = np.minimum(v0, np.minimum(v1, v2)).min(axis=0)
    mhi = np.maximum(v0, np.maximum(v1, v2)).max(axis=0)
    lo_j, hi_j = jnp.asarray(mlo, jnp.float32), jnp.asarray(mhi, jnp.float32)

    from fspt_tpu.ops.pallas_trace import make_pallas_intersector
    base_fn = make_pallas_intersector(scene.geometry)

    def box_exit(s, g):
        inv = 1.0 / jnp.where(jnp.abs(g) < 1e-30,
                              jnp.where(g >= 0, 1e-30, -1e-30), g)
        ta = (lo_j - s) * inv
        tb = (hi_j - s) * inv
        tnear = jnp.max(jnp.minimum(ta, tb), axis=-1)
        tfar = jnp.min(jnp.maximum(ta, tb), axis=-1)
        hb = (tnear <= tfar) & (tfar > 0.0)
        return jnp.where(hb, tfar * 1.0001 + 1e-5, 0.0)

    def stage_tinit(s, g, a):
        base = base_fn(s, g)
        ti = jnp.minimum(base.t, box_exit(s, g))
        return jnp.where(a, ti, 0.0)

    def stage_sortkey(s, g, a):
        key = pb.morton_keys(s, g, a, lo_j, hi_j)
        return jnp.argsort(key)

    j_tinit = jax.jit(stage_tinit)
    j_order = jax.jit(stage_sortkey)
    j_prep = jax.jit(lambda s, g, ti: ct.prepare(s, g, ti))
    j_sweep = jax.jit(lambda c, o, tl, F: ct.sweep(c, o, tl, F))

    for d, (s, g, a) in enumerate(waves):
        live = int(a.sum())
        t_base = timeit(j_tinit, s, g, a)
        ti = j_tinit(s, g, a)
        t_sort = timeit(j_order, s, g, a)
        order = j_order(s, g, a)
        ss, gs, tis = s[order], g[order], ti[order]
        t_prep = timeit(j_prep, ss, gs, tis)
        counts, ordr, tlo, F = j_prep(ss, gs, tis)
        t_swp = timeit(j_sweep, counts, ordr, tlo, F)
        out = j_sweep(counts, ordr, tlo, F)
        visits = np.asarray(out[::128, 2])  # per block
        nblocks = len(visits)
        nz = visits[visits > 0]
        t_full = timeit(jax.jit(lambda s, g, a: inter(s, g, a).t), s, g, a)
        log(f"bounce {d}: live={live} ({live/n:.1%}) | base+tinit {t_base*1e3:6.1f} "
            f"sort {t_sort*1e3:6.1f} prep(cull) {t_prep*1e3:6.1f} "
            f"sweep {t_swp*1e3:6.1f} full {t_full*1e3:6.1f} ms | "
            f"visits tot {int(visits.sum())} blocks>0 {len(nz)}/{nblocks} "
            f"mean {nz.mean() if len(nz) else 0:.1f} max {int(visits.max())}")


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
