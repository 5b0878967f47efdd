"""fspt_tpu — a TPU-native differentiable Monte Carlo path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``ramenhut/final-stage-path-tracer-2-0`` (reference: /root/reference/source/*):

* the reference's recursive per-pixel integrator (engine.cpp:59-159) becomes a
  wavefront bounce loop over a ray SoA inside one jitted step,
* its pointer-based octrees (bvh.h, scene.cpp, mesh.cpp) become flattened
  tensor BVHs traversed by XLA/Pallas kernels,
* its polymorphic material hierarchy (material.h:88-328) becomes a material
  parameter table with branch-free batched sample/eval,
* its thread-per-scanline parallelism (engine.cpp:261-274) becomes
  ``shard_map`` over a device mesh with psum framebuffer reduction,
* its xorshift64* RNG (math/random.cpp) becomes counter-based per-sample
  streams, deterministic across shardings.
"""

__version__ = "0.1.0"

from fspt_tpu.camera import Camera
from fspt_tpu.config import RenderConfig
from fspt_tpu.scene.builder import SceneBuilder

__all__ = ["Camera", "RenderConfig", "SceneBuilder", "__version__"]
