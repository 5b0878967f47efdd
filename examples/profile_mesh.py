"""Stage-level timing breakdown of the 100k-tri mesh path (dev tool).

Times each stage of the culled-treelet intersector independently on the
current backend so optimization effort goes where the milliseconds are:
  sort (6-D Morton argsort) / cull (XLA frustum x treelet slab tests +
  argsort) / sweep (Pallas MXU kernel) / analytic base / full bounce loop.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = 1e30
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main(width=512, height=512, spp=2):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import build_mesh_scene
    from fspt_tpu.camera import generate_rays
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops import pallas_bvh as pb
    from fspt_tpu.ops.bvh import build_bvh
    from fspt_tpu.ops.pallas_trace import make_pallas_intersector
    import numpy as np

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    builder = build_mesh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=4)

    start, seg, pix, samp = jax.jit(
        lambda: generate_rays(camera, cfg.width, cfg.height, cfg.spp, 7, 0))()
    jax.block_until_ready(start)
    n = start.shape[0]
    log(f"wavefront: {n} rays")

    fine = scene.bvh
    order = np.argsort(np.asarray(fine.tri_id))
    v0 = np.asarray(fine.tri_v0)[order]
    v1 = v0 + np.asarray(fine.tri_e1)[order]
    v2 = v0 + np.asarray(fine.tri_e2)[order]
    coarse = build_bvh(v0, v1, v2, max_leaf=pb.TREELET)
    log(f"treelets: {int(np.sum(np.asarray(coarse.count) > 0))} leaves")

    lo = np.minimum(v0, np.minimum(v1, v2)).min(axis=0)
    hi = np.maximum(v0, np.maximum(v1, v2)).max(axis=0)

    # 1. Morton sort + inverse permute
    def sort_only(s, g):
        key = pb.morton_keys(s, g, None, jnp.asarray(lo), jnp.asarray(hi))
        o = jnp.argsort(key)
        inv = jnp.zeros((n,), jnp.int32).at[o].set(jnp.arange(n, dtype=jnp.int32))
        return s[o][inv]

    t = timeit(jax.jit(sort_only), start, seg)
    log(f"sort+unsort: {t*1e3:.1f} ms")

    # 2. analytic base intersector
    base_fn = make_pallas_intersector(scene.geometry)
    t = timeit(jax.jit(lambda s, g: base_fn(s, g).t), start, seg)
    log(f"analytic base: {t*1e3:.1f} ms")

    # full culled traverser (cull + sweep together)
    trav = pb.make_culled_traverser(coarse, block_rays=128, group=8)
    t_init = jnp.full((n,), 1.0, jnp.float32)
    t = timeit(jax.jit(lambda s, g, ti: trav(s, g, ti)[0]), start, seg, t_init)
    log(f"culled traverse (primary, coherent): {t*1e3:.1f} ms")

    # shuffled wavefront = bounce-like incoherence
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, n)
    ss, gs = start[perm], seg[perm]
    t = timeit(jax.jit(lambda s, g, ti: trav(s, g, ti)[0]), ss, gs, t_init)
    log(f"culled traverse (shuffled, incoherent): {t*1e3:.1f} ms")

    # 3. full intersector call (sort + base + cull + sweep + gathers)
    inter = pb.make_mesh_intersector(scene)
    t = timeit(jax.jit(lambda s, g: inter(s, g).t), start, seg)
    log(f"full intersector (primary): {t*1e3:.1f} ms")

    # 4. one full frame
    from fspt_tpu.render import integrator
    fn = jax.jit(lambda: integrator.render_wavefront(
        scene, camera, cfg, 7, 0, intersector=inter).segments)
    t = timeit(fn, iters=2)
    segs = int(fn())
    log(f"full frame ({cfg.max_depth} bounces): {t*1e3:.1f} ms "
        f"→ {segs/t/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
