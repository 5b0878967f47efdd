"""Command-line renderer — the app layer.

Replaces the reference's Win32 interactive loop (reference main.cpp:47-165)
with a headless progressive render: parse a ``.scene`` file, run N
accumulation frames on the fastest available path (camera-fused Pallas
megakernel → Pallas intersect → XLA), report Mrays/sec per frame
(engine.cpp:283-293), and write the tonemapped image + optional AOVs.

Flags --file/--width/--height mirror main.cpp:61-76.

    python -m fspt_tpu.cli --file scenes/cornell.scene --width 800 --height 480 \
        --frames 64 --spp 4 --output out.png
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="fspt_tpu path tracer")
    p.add_argument("--file", required=True, help="input .scene file")
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--frames", type=int, default=16, help="accumulation frames")
    p.add_argument("--spp", type=int, default=1, help="samples/pixel per frame")
    p.add_argument("--depth", type=int, default=8, help="max path depth")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--camera", type=int, default=0, help="camera index")
    p.add_argument("--output", default="render.png")
    p.add_argument("--aov-prefix", default=None,
                   help="write <prefix>_normal.png/_depth.npy/_mat.npy")
    p.add_argument("--fast", action="store_true", help="fast-render preview mode")
    p.add_argument("--no-gamma", action="store_true")
    p.add_argument("--denoise", action="store_true",
                   help="AOV-guided denoise before writing")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint path; resumes if it exists, saves each frame")
    p.add_argument("--checkpoint-every", type=int, default=8)
    p.add_argument("--first-hit-cache", action="store_true",
                   help="warm-start first-hit cache on the BVH path "
                        "(reference ImagePlaneCache analog): depth-0 "
                        "resolves outside the queue while the camera is "
                        "still.  Exact; ~1.26x per frame on the bench mesh "
                        "scene, behind a one-time pose pass + compile that "
                        "long runs amortize — see PERF_NOTES round 5")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax

    from fspt_tpu.config import RenderConfig
    from fspt_tpu.ops.pallas_path import make_camera_path_tracer
    from fspt_tpu.render import framebuffer as fb_mod
    from fspt_tpu.render.dispatch import make_scene_step
    from fspt_tpu.scene.parser import load_scene
    from fspt_tpu.utils.image import write_image

    builder = load_scene(args.file)
    scene = builder.compile()
    print(f"Scene file {args.file} loaded successfully.")  # scene.cpp:532
    if not builder.cameras:
        from fspt_tpu.camera import Camera

        builder.add_camera(Camera.create())
    camera = builder.cameras[min(args.camera, len(builder.cameras) - 1)]

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.depth, fast_render=args.fast,
                       gamma_correct=not args.no_gamma)

    tracer = make_camera_path_tracer(scene, camera, cfg)
    if tracer is not None:
        print("render path: camera-fused pallas megakernel")

        def step(fb, frame_idx):
            out = tracer(args.seed, frame_idx * cfg.spp)
            fb = fb_mod.accumulate(fb, out.radiance, out.aov_normal,
                                   out.aov_depth, out.aov_mat,
                                   cfg.height, cfg.width, cfg.spp)
            return fb, out.segments
    else:
        # Same cascade bench.py measures (VERDICT r3 #2): BVH scenes get
        # the queued wavefront + Pallas treelet sweep, analytic scenes the
        # baked Pallas intersect kernel, else the XLA fallbacks.  The CLI
        # camera is static for the whole run, so BVH scenes also get the
        # first-hit cache (reference ImagePlaneCache, engine.h:46-65):
        # depth-0 collisions come from a G-buffer built once up front.
        from fspt_tpu.render.dispatch import make_cached_scene_step

        cname, cstep, cache_fn = make_cached_scene_step(scene, cfg) \
            if args.first_hit_cache else (None, None, None)
        if cstep is not None:
            print(f"render path: {cname}")
            pose = jax.jit(cache_fn)(scene, camera, args.seed)

            # The pose bundle rides as a jit argument — closed over it
            # would bake the warm tables into the executable as constants.
            cjit = jax.jit(lambda fb, frame_idx, p: cstep(
                scene, camera, fb, args.seed, frame_idx, p))

            def step(fb, frame_idx):
                return cjit(fb, frame_idx, pose)
        else:
            name, scene_step = make_scene_step(scene, cfg)
            print(f"render path: {name}")

            step = jax.jit(lambda fb, frame_idx: scene_step(
                scene, camera, fb, args.seed, frame_idx))
    if tracer is not None:
        step = jax.jit(step)
    fb = fb_mod.create(cfg.height, cfg.width)
    frame0 = 0

    if args.checkpoint:
        from fspt_tpu.utils import checkpoint as ckpt

        restored = ckpt.load(args.checkpoint)
        if restored is not None:
            fb, frame0 = restored
            print(f"resumed from {args.checkpoint} at frame {frame0}")

    for frame in range(frame0, args.frames):
        t0 = time.time()
        fb, segments = step(fb, frame)
        jax.block_until_ready(fb)
        dt = time.time() - t0
        # Frame timing printf parity (engine.cpp:291-292).
        print(f"Frame {frame} render time: {dt:.2f} sec. "
              f"Mrays/sec: {int(segments) / (1e6 * dt):.2f}")
        if args.checkpoint and (frame + 1) % args.checkpoint_every == 0:
            from fspt_tpu.utils import checkpoint as ckpt

            ckpt.save(args.checkpoint, fb, frame + 1)

    image = fb.mean
    if args.denoise:
        from fspt_tpu.render.denoiser import denoise

        image = denoise(fb)
    display = np.asarray(fb_mod.to_display(image, cfg.gamma_correct))
    # Row 0 is the bottom scanline (camera up = +Y); flip for image files.
    write_image(args.output, display[::-1])
    print(f"wrote {args.output}")

    if args.aov_prefix:
        normal_u8 = np.asarray(
            fb_mod.to_display(fb.normal * 0.5 + 0.5, gamma_correct=False)
        )
        write_image(f"{args.aov_prefix}_normal.png", normal_u8[::-1])
        np.save(f"{args.aov_prefix}_depth.npy", np.asarray(fb.depth))
        np.save(f"{args.aov_prefix}_mat.npy", np.asarray(fb.mat))
        print(f"wrote {args.aov_prefix}_normal.png/_depth.npy/_mat.npy")

    if args.checkpoint:
        from fspt_tpu.utils import checkpoint as ckpt

        ckpt.save(args.checkpoint, fb, args.frames)
    return 0


if __name__ == "__main__":
    sys.exit(main())
