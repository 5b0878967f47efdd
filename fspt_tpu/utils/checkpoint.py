"""Checkpoint / resume for progressive renders and recovery runs.

The reference has no checkpointing (SURVEY.md §5.4): its only analog is the
accumulation state surviving across frames until Reset (frame.cpp:43-51).
Here the framebuffer (mean/m2/count/AOVs), the frame counter, and optional
optimizer state round-trip through a single ``.npz`` — enough to resume a
preempted multi-hour render or a gradient-descent recovery loop exactly
(RNG is counter-based, so resuming at frame k reproduces the uninterrupted
run bit-for-bit).
"""

from __future__ import annotations

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from fspt_tpu.render.framebuffer import Framebuffer

_FB_FIELDS = ("mean", "m2", "count", "normal", "depth", "mat")


def save(path: str, fb: Framebuffer, frame: int, extra: dict | None = None):
    """Atomically write the render state (tmp file + rename)."""
    payload = {f"fb_{k}": np.asarray(getattr(fb, k)) for k in _FB_FIELDS}
    payload["frame"] = np.asarray(frame, np.int64)
    for key, val in (extra or {}).items():
        payload[f"extra_{key}"] = np.asarray(val)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load(path: str, with_extra: bool = False):
    """Returns (fb, frame) or (fb, frame, extra); None if absent/corrupt."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            fb = Framebuffer(**{k: jnp.asarray(z[f"fb_{k}"]) for k in _FB_FIELDS})
            frame = int(z["frame"])
            if with_extra:
                extra = {
                    k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")
                }
                return fb, frame, extra
            return fb, frame
    except Exception:
        return None
