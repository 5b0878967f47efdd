"""Static render configuration.

Collapses the reference's scattered compile-time knobs into one dataclass:
``kMaximumTraceDepth``/epsilon (reference engine.cpp:16-17), default window
size (main.cpp:53-54), gamma toggle (frame.cpp:4), fast-render mode
(camera.h:60, engine.cpp:67-70).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (non-traced) configuration for a render step."""

    width: int = 800
    height: int = 480
    spp: int = 1
    # Maximum path depth; reference engine.cpp:16 (kMaximumTraceDepth = 8).
    max_depth: int = 8
    # Epsilon offset applied along the bounce direction so the continuation
    # ray does not re-hit its origin object; reference engine.cpp:17.
    ray_offset: float = 0.03
    # One-bounce interactive preview returning white sky; engine.cpp:67-70.
    fast_render: bool = False
    # Gamma-correct the display buffer (frame.cpp:4, frame.cpp:66-69).
    gamma_correct: bool = True
    # Light tone clamp threshold at the primary hit; engine.cpp:148-151.
    light_clamp: float = 10.0
    # Number of uniforms drawn per bounce from the per-sample RNG stream.
    # Fixed so the oracle and the wavefront renderer consume identical streams.
    bounce_slots: int = 4
    # Edge-reparameterization bandwidth (world units) for silhouette
    # gradients w.r.t. triangle vertices.  0 disables it (default): forward
    # renders are untouched and AD sees only interior gradients.  When > 0,
    # triangle hits within this distance of an edge stochastically pass
    # through the surface with probability (1 - edge_dist/eps); the
    # throughput ratio-trick makes the expected image differentiable
    # through the visibility boundary (see integrator.trace_radiance).
    edge_eps: float = 0.0

    @property
    def effective_depth(self) -> int:
        # In fast-render mode every path terminates with white sky at depth 2
        # (engine.cpp:67-70), so only bounces 0 and 1 are ever traced.
        return min(self.max_depth, 2) if self.fast_render else self.max_depth
