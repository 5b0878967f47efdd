"""Round-5 TPU probe batch 10: where the two-phase mesh-grad step goes.

For bench (512^2 x 2spp depth 2) and scaled (1024^2 x 4spp depth 4)
configs:
  a. phase1_unrolled — record pass alone (unrolled wavefront + sweep,
                       2*spp, ids stacked), fori-timed.
  b. phase1_queue    — record pass alone through the regenerating queue.
  c. step_wavefront  — full recovery step, replay="wavefront".
  d. step_planar     — full recovery step, replay="planar".
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def setup(width, height, spp, depth):
    import dataclasses

    from bench import build_mesh_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.diff_intersect import make_diff_mesh_intersector

    builder = build_mesh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=depth,
                       edge_eps=0.05)
    cfg2 = dataclasses.replace(cfg, spp=2 * cfg.spp)
    diff = make_diff_mesh_intersector(scene)
    return scene, camera, cfg, cfg2, diff


def phase1(which, width, height, spp, depth, iters=3):
    from fspt_tpu.ops.diff_intersect import tris_from_scene
    from fspt_tpu.render import integrator
    from fspt_tpu.render.queue import render_queued

    scene, camera, cfg, cfg2, diff = setup(width, height, spp, depth)
    baked = tris_from_scene(scene)
    sg = jax.lax.stop_gradient
    tr_sg = jax.tree.map(sg, baked)

    if which == "queue":
        def rec(f0):
            _, (ids, hitm) = render_queued(
                scene, camera, cfg2, 11, f0 * cfg2.spp,
                intersector=diff.bind(tr_sg), queue=1 << 17, aovs=False,
                record_hits=True)
            return ids.sum(), hitm.sum()
    else:
        def rec(f0):
            recb = []
            inner = diff.bind(tr_sg)

            def recorder(start, seg, alive=None):
                h = inner(start, seg, alive)
                recb.append((h.prim_id, h.hit))
                return h

            recorder.accepts_alive = True
            out = integrator.render_wavefront(
                scene, camera, cfg2, 11, f0 * cfg2.spp,
                intersector=recorder)
            ids = jnp.stack([i for i, _ in recb], axis=1)
            return ids.sum(), out.radiance.sum()

    fn = jax.jit(rec)
    t0 = time.time()
    jax.block_until_ready(fn(0))
    log(f"[phase1_{which} {width}x{spp}x{depth}] compile+first "
        f"{time.time()-t0:.1f}s")
    for it in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn(it + 1))
        log(f"[phase1_{which} {width}x{spp}x{depth}] iter {it}: "
            f"{(time.time()-t0)*1e3:.0f} ms")


def full_step(replay, width, height, spp, depth, iters=3, use_queue=False):
    import optax

    from fspt_tpu.ops.diff_intersect import tris_from_scene
    from fspt_tpu.parallel import make_bvh_vertex_recovery_step, make_mesh
    from fspt_tpu.render import integrator

    scene, camera, cfg, cfg2, diff = setup(width, height, spp, depth)
    mesh = make_mesh(1)
    baked = tris_from_scene(scene)
    params = {k: baked[k] for k in ("v0", "v1", "v2")}
    target = jnp.zeros((height, width, 3), jnp.float32)
    step = make_bvh_vertex_recovery_step(mesh, cfg, scene,
                                         optimizer=optax.adam(0.05), pool=1,
                                         replay=replay, use_queue=use_queue)
    opt_state = step.init(params)
    t0 = time.time()
    for w in range(2):
        params, opt_state, loss = step(params, opt_state, scene, camera,
                                       target, 11, w)
        jax.block_until_ready(params)
    log(f"[step_{replay} {width}x{spp}x{depth}] compile+warmup "
        f"{time.time()-t0:.1f}s loss={float(loss):.4f}")
    segs = 2 * int(jax.jit(lambda: integrator.render_wavefront(
        scene, camera, cfg, 11, 0, intersector=diff).segments)())
    for it in range(iters):
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, scene, camera,
                                       target, 11, it + 2)
        jax.block_until_ready(params)
        dt = time.time() - t0
        log(f"[step_{replay} {width}x{spp}x{depth}] iter {it}: "
            f"{dt*1e3:.0f} ms/step, {segs/dt/1e6:.2f} Mrays/s fwd+bwd")


CONFIGS = {"bench": (512, 512, 2, 2), "big": (1024, 1024, 4, 4)}


def main():
    log(f"devices: {jax.devices()}")
    which = sys.argv[1:] or [
        "phase1_unrolled:bench", "phase1_queue:bench",
        "step_wavefront:bench", "step_planar:bench",
        "phase1_unrolled:big", "step_wavefront:big",
    ]
    for w in which:
        name, _, cname = w.partition(":")
        wconf = CONFIGS[cname or "bench"]
        t0 = time.time()
        try:
            if name.startswith("phase1_"):
                phase1(name.split("_", 1)[1], *wconf)
            elif name.startswith("qstep_"):
                full_step(name.split("_", 1)[1], *wconf, use_queue=True)
            elif name.startswith("step_"):
                full_step(name.split("_", 1)[1], *wconf)
        except Exception:
            import traceback
            traceback.print_exc(file=sys.stderr)
        log(f"[{w}] total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
