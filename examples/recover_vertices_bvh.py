"""BVH-scale differentiable geometry recovery (BASELINE.md config 5 at the
config-3 scene scale).

Builds a triangle heightfield large enough to go through the flattened-BVH
path, perturbs every vertex with a global y-offset, then recovers the
surface by gradient descent through the hit-id replay intersector
(fspt_tpu/ops/diff_intersect.py): the culled-treelet Pallas sweep decides
winners under stop_gradient, an XLA Möller–Trumbore replay of the single
winning triangle differentiates t/normal/uv w.r.t. the traced vertices, and
the O(N·T) brute-force differentiable path is never built.  Rays are
sharded over the device mesh with pmean-reduced vertex gradients
(fspt_tpu/parallel/train.py:make_bvh_vertex_recovery_step).

The reference has no differentiable anything; this capability is the TPU
build's own (reference analog for the forward path: bvh.h:145-231 octree
traversal of mesh faces).

    python examples/recover_vertices_bvh.py [--grid 224] [--iters 60]

``--grid 224`` ≈ 100k triangles (BASELINE config 3 scale); the default 64
(~8k tris) keeps a CPU smoke run under a minute.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fspt_tpu import Camera, RenderConfig, SceneBuilder
from fspt_tpu import materials as M
from fspt_tpu.materials import MaterialSpec
from fspt_tpu.ops.diff_intersect import (make_diff_mesh_intersector,
                                         tris_from_scene)
from fspt_tpu.parallel import make_bvh_vertex_recovery_step, make_mesh
from fspt_tpu.parallel.train import render_image_rows


def build_scene(grid):
    """Heightfield in a lit box (same family as bench.py:build_mesh_scene)."""
    b = SceneBuilder()
    terra = b.add_material(MaterialSpec(M.DIFFUSE, diffuse=(0.55, 0.45, 0.35)))
    light = b.add_material(MaterialSpec(M.LIGHT, emissive=(12.0, 12.0, 12.0)))
    sky = b.add_material(MaterialSpec(M.LIGHT, emissive=(0.3, 0.4, 0.6)))
    b.set_sky(sky)
    b.add_quad_uv((-20, 55.0, -20), (40, 0, 0), (0, 0, 40), light)

    xs = np.linspace(-45, 45, grid, dtype=np.float32)
    X, Z = np.meshgrid(xs, xs, indexing="ij")
    Y = (6.0 * np.sin(X * 0.18) * np.cos(Z * 0.15)
         + 3.0 * np.sin(X * 0.51 + 1.0) * np.sin(Z * 0.43) - 20.0)
    P = np.stack([X, Y, Z], axis=-1)
    a = P[:-1, :-1].reshape(-1, 3)
    bq = P[1:, :-1].reshape(-1, 3)
    c = P[1:, 1:].reshape(-1, 3)
    d = P[:-1, 1:].reshape(-1, 3)
    v0 = np.concatenate([a, a])
    v1 = np.concatenate([bq, c])
    v2 = np.concatenate([c, d])
    b.add_triangles(v0, v1, v2, terra)
    print(f"scene: {len(v0)} triangles")
    b.add_camera(Camera.create(origin=(0.0, 25.0, -110.0),
                               target=(0.0, -15.0, 0.0), aperture_size=0.0))
    return b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=24,
                    help="heightfield grid; 224 ≈ 100k triangles")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.3)
    ap.add_argument("--res", type=int, default=128)
    args = ap.parse_args()

    builder = build_scene(args.grid)
    scene = builder.compile()
    assert scene.bvh is not None, "scene too small to cross the BVH threshold"
    cam = builder.cameras[0]
    mesh = make_mesh()
    n = mesh.devices.size
    h = args.res - args.res % n if args.res % n else args.res
    cfg = RenderConfig(width=args.res, height=h, spp=2, max_depth=2,
                       edge_eps=0.05)

    baked = tris_from_scene(scene)
    true_params = {k: baked[k] for k in ("v0", "v1", "v2")}

    # Target: average a few frames of the unperturbed scene through the
    # same replay intersector the loss uses.
    diff = make_diff_mesh_intersector(scene)
    target = np.mean([
        np.asarray(render_image_rows(scene, cam, cfg, 11, f, 0, cfg.height,
                                     intersector=diff))
        for f in range(4)
    ], axis=0)
    jax.block_until_ready(target)

    # Perturb: global y-offset.  Hit-id replay freezes hit topology at the
    # baked geometry, so the perturbation must stay within the regime where
    # the original winner ids remain approximately valid.
    shift = jnp.asarray([0.0, 0.5, 0.0], jnp.float32)
    params = {k: v + shift for k, v in true_params.items()}

    import optax

    step = make_bvh_vertex_recovery_step(
        mesh, cfg, scene, optimizer=optax.adam(args.lr), pool=1)
    opt_state = step.init(params)

    def mean_dy(p):
        return float(jnp.mean(p["v0"][:, 1] - true_params["v0"][:, 1]))

    e0 = mean_dy(params)
    print(f"initial mean vertex y-error: {e0:.3f} world units")
    t0 = time.time()
    for it in range(args.iters):
        params, opt_state, loss = step(params, opt_state, scene, cam,
                                       jnp.asarray(target), 11, it)
        if it % 10 == 0 or it == args.iters - 1:
            print(f"iter {it:4d}  loss {float(loss):.6f}  "
                  f"mean-dy {mean_dy(params):+.4f}")
    jax.block_until_ready(params)
    dt = time.time() - t0
    e1 = mean_dy(params)
    print(f"{args.iters} iters in {dt:.1f}s on {n} device(s) "
          f"({dt/args.iters:.2f} s/fwd+bwd step); "
          f"mean vertex y-error {e0:.3f} -> {e1:.4f}")
    if not (0.0 <= e1 < 0.6 * e0):
        raise SystemExit(f"recovery insufficient: {e0} -> {e1}")
    print("ok")


if __name__ == "__main__":
    main()
