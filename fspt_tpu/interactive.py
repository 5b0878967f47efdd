"""Interactive render session: orbit / focus / progressive refinement.

The TPU stand-in for the reference's Win32 event loop (reference
main.cpp:114-165): instead of WndProc mouse events, a small host-side
session object exposes the same interactions as methods —

* :meth:`orbit` — rotate the camera about its target (main.cpp:127-143's
  left-drag yaw/pitch), which resets accumulation like ``DisplayFrame::
  Reset`` + ``ImagePlaneCache::Invalidate`` (main.cpp:142-143),
* :meth:`focus_at` — click-to-focus: probe the scene depth under a pixel
  and set ``focal_depth`` (main.cpp:144-154 → TraceRange),
* :meth:`set_fast_render` — 1-bounce preview while dragging (main.cpp:124),
* :meth:`refine` — run N progressive frames,
* :meth:`snapshot` — tonemapped u8 image (optionally denoised).

Works in notebooks/REPLs; a terminal loop lives in ``python -m
fspt_tpu.interactive <scene>``.
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from fspt_tpu.camera import Camera, probe_ray
from fspt_tpu.config import RenderConfig
from fspt_tpu.render import framebuffer as fb_mod
from fspt_tpu.render import integrator


def trace_range(scene, camera: Camera, width: int, height: int, x, y):
    """Distance from the camera to the first hit under pixel (x, y).

    The reference's ``TraceRange`` (engine.cpp:298-329): un-jittered center
    ray, FULL scene trace (analytic primitives ∪ BVH triangles — the
    reference traces meshes here too), distance or z_far on miss.
    """
    start, seg = probe_ray(camera, width, height, x, y)
    hit = integrator.intersect_full(scene, start[None], seg[None])
    dist = jax.numpy.linalg.norm(hit.point[0] - start)
    return jax.numpy.where(hit.hit[0], dist, camera.z_far)


class RenderSession:
    """Progressive render with reference-style interactions."""

    def __init__(self, builder, cfg: RenderConfig | None = None, seed: int = 0,
                 camera_index: int = 0, first_hit_cache: bool = False):
        self.builder = builder
        self.scene = builder.compile()
        self.camera = builder.cameras[camera_index] if builder.cameras else Camera.create()
        self.cfg = cfg or RenderConfig(width=400, height=240, spp=1)
        self.seed = seed
        self.frame = 0
        self.fast_render = False
        self._fb = fb_mod.create(self.cfg.height, self.cfg.width)
        self._steps = {}
        self.path_name = None  # set on first refine()
        # Warm-start first-hit cache (reference ImagePlaneCache,
        # engine.h:46-65): while the camera is still, depth-0 resolves
        # outside the queue from a pose-keyed bundle; orbit/focus/reset
        # invalidate it (main.cpp:142-143).  Exact and ~1.26x per frame on
        # the bench mesh scene, but opt-in: the pose pass + one-time
        # compile (~90 s on TPU) only pays off for long static-camera
        # refinement (PERF_NOTES round 5).
        self.first_hit_cache = first_hit_cache
        self._cached = None   # (jit step, jit cache_fn) | False (n/a)
        self._fh = None       # current G-buffer
        self._fh_key = None   # camera-pose key it was built for

    # -- interactions (main.cpp:117-154) -----------------------------------

    def reset(self):
        """Restart accumulation (DisplayFrame::Reset, frame.cpp:43-51)."""
        self._fb = fb_mod.create(self.cfg.height, self.cfg.width)
        self.frame = 0

    def orbit(self, yaw: float, pitch: float):
        """Rotate camera origin about its target; resets accumulation."""
        from fspt_tpu.utils import vecmath as vm

        origin = self.camera.origin - self.camera.target
        origin = vm.rotate(origin, yaw, jax.numpy.array([0.0, 1.0, 0.0]))
        fwd = vm.normalize(-origin)
        right = vm.normalize(jax.numpy.cross(jax.numpy.array([0.0, 1.0, 0.0]), fwd))
        origin = vm.rotate(origin, pitch, right)
        self.camera = self.camera._replace(origin=origin + self.camera.target)
        self.reset()

    def focus_at(self, x: int, y: int):
        """Click-to-focus: focal_depth := scene depth under the pixel."""
        dist = trace_range(self.scene, self.camera, self.cfg.width,
                           self.cfg.height, x, y)
        self.camera = self.camera._replace(focal_depth=dist)
        self.reset()
        return float(dist)

    def set_fast_render(self, enabled: bool):
        if enabled != self.fast_render:
            self.fast_render = enabled
            self.reset()

    # -- rendering ----------------------------------------------------------

    def _step_fn(self):
        """Jitted step for the current cfg, on the fastest scene path.

        Uses the same cascade as cli.py/bench.py (render/dispatch.py):
        BVH scenes run the queued wavefront + Pallas treelet sweep, not
        the XLA miss-link walk (VERDICT r3 #2).  The camera rides as a
        live argument, so orbit/focus do not recompile.
        """
        import dataclasses

        from fspt_tpu.render.dispatch import make_scene_step

        cfg = self.cfg
        if self.fast_render:
            cfg = dataclasses.replace(cfg, fast_render=True)
        if cfg not in self._steps:
            name, step = make_scene_step(self.scene, cfg)
            self.path_name = name
            self._steps[cfg] = jax.jit(step)
        return self._steps[cfg]

    def _camera_key(self):
        return b"".join(np.asarray(leaf).tobytes()
                        for leaf in jax.tree_util.tree_leaves(self.camera))

    def _cached_step_fn(self):
        """Jitted (step, cache_fn) for the first-hit-cached BVH path, or
        None when the scene/config can't use it (analytic scenes keep the
        megakernel — primaries are already free there)."""
        if self._cached is False:
            return None
        if self._cached is None:
            from fspt_tpu.render.dispatch import make_cached_scene_step

            name, step, cache_fn = make_cached_scene_step(self.scene,
                                                          self.cfg)
            if step is None:
                self._cached = False
                return None
            self.path_name = name
            self._cached = (jax.jit(step), jax.jit(cache_fn))
        return self._cached

    def refine(self, frames: int = 1):
        cached = None
        if self.first_hit_cache and not self.fast_render:
            cached = self._cached_step_fn()
        if cached is not None:
            step, cache_fn = cached
            key = self._camera_key()
            if self._fh is None or key != self._fh_key:
                self._fh = cache_fn(self.scene, self.camera, self.seed)
                self._fh_key = key
            segments = 0
            for _ in range(frames):
                self._fb, segs = step(self.scene, self.camera, self._fb,
                                      self.seed, self.frame, self._fh)
                self.frame += 1
                segments += int(segs)
            return segments
        step = self._step_fn()
        segments = 0
        for _ in range(frames):
            self._fb, segs = step(self.scene, self.camera, self._fb,
                                  self.seed, self.frame)
            self.frame += 1
            segments += int(segs)
        return segments

    def snapshot(self, denoise: bool = False):
        image = self._fb.mean
        if denoise:
            from fspt_tpu.render.denoiser import denoise as run_denoise

            image = run_denoise(self._fb)
        return np.asarray(fb_mod.to_display(image, self.cfg.gamma_correct))

    @property
    def framebuffer(self):
        return self._fb


def main(argv=None):
    """Tiny terminal loop: orbit with a/d/w/s, f=focus center, q=quit."""
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m fspt_tpu.interactive <scene-file>")
        return 1
    from fspt_tpu.scene.parser import load_scene
    from fspt_tpu.utils.image import write_image

    session = RenderSession(load_scene(argv[0]))
    print("commands: a/d orbit yaw, w/s orbit pitch, f focus center, "
          "r refine 8 frames, p save preview.png, q quit")
    while True:
        cmd = input("> ").strip() or "r"
        if cmd == "q":
            break
        elif cmd == "a":
            session.orbit(-0.1, 0.0)
        elif cmd == "d":
            session.orbit(0.1, 0.0)
        elif cmd == "w":
            session.orbit(0.0, 0.1)
        elif cmd == "s":
            session.orbit(0.0, -0.1)
        elif cmd == "f":
            d = session.focus_at(session.cfg.width // 2, session.cfg.height // 2)
            print(f"Setting focus distance to {d:.2f}")  # main.cpp:151
        elif cmd == "p":
            write_image("preview.png", session.snapshot(denoise=True)[::-1])
            print("wrote preview.png")
        session.refine(4)
        print(f"frame {session.frame}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
