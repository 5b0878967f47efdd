"""Benchmark harness: rays/s/chip on the Cornell-box-class forward path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

``vs_baseline`` is measured against the driver target of 1e9 path segments
per second per chip (BASELINE.md).  The segment count matches the reference's
Mrays/sec accounting (one count per TraceStep invocation that traces,
reference engine.cpp:72, 283-293).

Diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

TARGET = 1.0e9


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_bench_scene():
    from __graft_entry__ import _flagship_builder

    return _flagship_builder()


def bench_forward(width=512, height=512, spp=4, max_depth=8, inner_frames=4,
                  outer_iters=5):
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.render import integrator

    builder = build_bench_scene()
    scene = builder.compile()
    camera = builder.cameras[0]
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=max_depth)

    def many_frames(scene, camera, seed, frame0):
        def body(i, carry):
            acc, segs = carry
            out = integrator.render_wavefront(scene, camera, cfg, seed, (frame0 + i) * cfg.spp)
            return acc + out.radiance, segs + out.segments

        n = cfg.height * cfg.width * cfg.spp
        acc0 = jnp.zeros((n, 3), jnp.float32)
        return jax.lax.fori_loop(0, inner_frames, body, (acc0, jnp.zeros((), jnp.int32)))

    fn = jax.jit(many_frames)

    t0 = time.time()
    acc, segs = fn(scene, camera, 7, 0)
    jax.block_until_ready(acc)
    log(f"compile+first: {time.time()-t0:.1f}s; segments/call={int(segs)}")

    best = 0.0
    for it in range(outer_iters):
        t0 = time.time()
        acc, segs = fn(scene, camera, 7, it + 1)
        jax.block_until_ready(acc)
        dt = time.time() - t0
        rate = int(segs) / dt
        best = max(best, rate)
        log(f"iter {it}: {dt*1000:.0f} ms, {rate/1e6:.1f} Mrays/s")
    return best


def main():
    log(f"devices: {jax.devices()}")
    rate = bench_forward()
    print(json.dumps({
        "metric": "fwd_rays_per_sec_per_chip_cornell",
        "value": rate,
        "unit": "rays/s",
        "vs_baseline": rate / TARGET,
    }))


if __name__ == "__main__":
    main()
