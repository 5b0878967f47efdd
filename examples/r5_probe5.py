"""Round-5 TPU probe batch 5: sync-free timing (no per-call host reads).

Per-call ``int(segs)`` in earlier probes forced a device->host sync every
call — every "slow" 1080p rate was dispatch-latency-bound, not compute.

a. fwd_nosync    — 1920x1080x4spp forward, 20 calls/window, block at end.
b. affine_nosync — affine fused loss full-frame, 10 calls/window.
c. meshgrad_planar — two-phase vertex recovery with the planar replay,
                     bench config and scaled config.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fwd_nosync(iters=3, calls=20):
    from bench import build_bench_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_path import make_camera_path_tracer

    builder = build_bench_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=1920, height=1080, spp=4, max_depth=8)
    tracer = make_camera_path_tracer(scene, camera, cfg)
    fn = jax.jit(lambda seed, s0: tracer(seed, s0))
    t0 = time.time()
    out = fn(7, 0)
    jax.block_until_ready(out)
    log(f"[fwd_nosync] compile+first {time.time()-t0:.1f}s "
        f"segs={int(out.segments)}")
    for it in range(iters):
        t0 = time.time()
        segs = []
        for c in range(calls):
            out = fn(7, it * calls + c + 1)
            segs.append(out.segments)
        jax.block_until_ready(out)
        dt = time.time() - t0
        total = sum(int(s) for s in segs)
        log(f"[fwd_nosync] iter {it}: {dt/calls*1e3:.1f} ms/call, "
            f"{total/dt/1e6:.1f} Mrays/s")


def affine_nosync(block_rows=32, iters=3, calls=10):
    from bench import build_bench_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_grad import make_fused_loss_grad_fn

    builder = build_bench_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=1920, height=1080, spp=4, max_depth=8)
    fused = make_fused_loss_grad_fn(scene, camera, cfg,
                                    block_rows=block_rows, affine=True)
    params = {"diffuse": scene.materials.diffuse,
              "emissive": scene.materials.emissive}
    target = jnp.zeros((1080, 1920, 3), jnp.float32)
    fn = jax.jit(lambda p, f0: fused(p, target, 7, f0, 0, 1080))
    t0 = time.time()
    loss, grads, segs = fn(params, 1)
    jax.block_until_ready(grads)
    log(f"[affine_nosync br={block_rows}] compile+first {time.time()-t0:.1f}s "
        f"segs={int(segs)} loss={float(loss):.5f}")
    for it in range(iters):
        t0 = time.time()
        ss = []
        for c in range(calls):
            loss, grads, segs = fn(params, it * calls + c + 2)
            ss.append(segs)
        jax.block_until_ready(grads)
        dt = time.time() - t0
        total = sum(int(s) for s in ss)
        log(f"[affine_nosync br={block_rows}] iter {it}: "
            f"{dt/calls*1e3:.1f} ms/call, {total/dt/1e6:.1f} Mrays/s")


def meshgrad_planar(width=512, height=512, spp=2, depth=2, iters=3,
                    tag="bench"):
    import optax

    from bench import build_mesh_scene
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.diff_intersect import tris_from_scene
    from fspt_tpu.parallel import make_bvh_vertex_recovery_step, make_mesh

    builder = build_mesh_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp,
                       max_depth=depth, edge_eps=0.05)
    mesh = make_mesh(1)
    baked = tris_from_scene(scene)
    params = {k: baked[k] for k in ("v0", "v1", "v2")}
    target = jnp.zeros((height, width, 3), jnp.float32)
    step = make_bvh_vertex_recovery_step(mesh, cfg, scene,
                                         optimizer=optax.adam(0.05), pool=1)
    opt_state = step.init(params)
    t0 = time.time()
    for w in range(2):
        params, opt_state, loss = step(params, opt_state, scene, camera,
                                       target, 11, w)
        jax.block_until_ready(params)
    log(f"[meshgrad_planar {tag}] compile+warmup {time.time()-t0:.1f}s "
        f"loss={float(loss):.4f}")
    # Segment accounting: both buffers' forward segments per step.
    from fspt_tpu.ops.diff_intersect import make_diff_mesh_intersector
    from fspt_tpu.render import integrator
    diff = make_diff_mesh_intersector(scene)
    segs = 2 * int(jax.jit(lambda: integrator.render_wavefront(
        scene, camera, cfg, 11, 0, intersector=diff).segments)())
    for it in range(iters):
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, scene, camera,
                                       target, 11, it + 2)
        jax.block_until_ready(params)
        dt = time.time() - t0
        log(f"[meshgrad_planar {tag}] iter {it}: {dt*1e3:.0f} ms/step, "
            f"{segs/dt/1e6:.2f} Mrays/s fwd+bwd")


def meshgrad_planar_big():
    meshgrad_planar(width=1024, height=1024, spp=4, depth=4, tag="1024x4x4")


def main():
    log(f"devices: {jax.devices()}")
    which = sys.argv[1:] or ["fwd_nosync", "affine_nosync",
                             "meshgrad_planar", "meshgrad_planar_big"]
    for w in which:
        t0 = time.time()
        try:
            globals()[w]()
        except Exception as e:
            import traceback
            traceback.print_exc(file=sys.stderr)
            log(f"[{w}] FAILED: {type(e).__name__}: {e}")
        log(f"[{w}] total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
