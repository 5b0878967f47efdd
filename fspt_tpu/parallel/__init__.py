"""Device-mesh parallelism for the wavefront renderer.

The reference's entire parallel story is one std::thread per hardware thread,
each owning a band of scanlines with a join barrier per frame
(reference engine.cpp:261-281).  Here that becomes a 1-D ``jax.sharding.Mesh``
over chips: each device renders a band of scanlines (``shard_map``), the
framebuffer lives band-sharded with *no* forward collective, and gradient
reduction (``psum``) appears only in the differentiable path.
"""

from fspt_tpu.parallel.mesh import make_mesh, mesh_devices
from fspt_tpu.parallel.render import (
    make_sharded_megakernel_step,
    make_sharded_render_step,
    sharded_framebuffer,
)
from fspt_tpu.parallel.scene_shard import (
    make_scene_sharded_render_step,
    shard_scene_triangles,
)
from fspt_tpu.parallel.train import (
    apply_vertices,
    make_bvh_vertex_recovery_step,
    make_fused_recovery_step,
    make_recovery_step,
    make_vertex_recovery_step,
)

__all__ = [
    "make_mesh",
    "mesh_devices",
    "make_sharded_render_step",
    "make_sharded_megakernel_step",
    "sharded_framebuffer",
    "make_scene_sharded_render_step",
    "shard_scene_triangles",
    "make_recovery_step",
    "make_fused_recovery_step",
    "make_vertex_recovery_step",
    "make_bvh_vertex_recovery_step",
    "apply_vertices",
]
