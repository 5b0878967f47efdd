"""Metrics, timing, and observability.

The reference's entire observability story is a per-frame printf of
Mrays/sec (reference engine.cpp:283-293) plus scattered status prints
(SURVEY.md §5.1/5.5).  Here: a structured per-step metrics dict (rays
traced, per-bounce occupancy, throughput), wall-clock timers, an optional
``jax.profiler`` trace context, and a small structured logger.
"""

from __future__ import annotations

import contextlib
import json
import logging
import sys
import time

import jax
import numpy as np

logger = logging.getLogger("fspt_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


def log_event(event: str, **fields):
    """One structured (JSON) log line."""
    logger.info("%s %s", event, json.dumps(fields, default=float))


class FrameTimer:
    """Rays/s accounting compatible with the reference counter
    (path segments per wall-clock second, engine.cpp:291-292)."""

    def __init__(self):
        self.frames = 0
        self.segments = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def frame(self):
        t0 = time.time()
        yield self
        self.seconds += time.time() - t0
        self.frames += 1

    def add_segments(self, n):
        self.segments += int(n)

    @property
    def mrays_per_sec(self):
        return self.segments / (1e6 * self.seconds) if self.seconds else 0.0

    def summary(self) -> dict:
        return dict(frames=self.frames, segments=self.segments,
                    seconds=self.seconds, mrays_per_sec=self.mrays_per_sec)


def occupancy_metrics(alive_counts, n_lanes: int) -> dict:
    """Per-bounce wavefront occupancy (SURVEY.md §5.1: active-ray occupancy).

    ``alive_counts``: sequence of lane counts entering each bounce.
    """
    counts = [int(c) for c in alive_counts]
    occ = [c / n_lanes for c in counts]
    total = sum(counts)
    full = len(counts) * n_lanes
    return dict(
        segments=total,
        bounce_occupancy=occ,
        mean_occupancy=total / full if full else 0.0,
        wasted_lane_fraction=1.0 - (total / full) if full else 0.0,
    )


@contextlib.contextmanager
def device_trace(log_dir: str):
    """``jax.profiler`` trace context for perfetto/tensorboard inspection."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Best-effort device memory stats (bytes)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {k: int(v) for k, v in stats.items()
                if isinstance(v, (int, np.integer))}
    except Exception:
        return {}
