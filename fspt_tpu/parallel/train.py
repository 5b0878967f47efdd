"""Differentiable recovery: sharded gradient-descent steps on scene params.

The capability the reference cannot express (BASELINE.json configs 4-5):
optimize material albedo/emission (and later geometry) so the rendered image
matches a target.  Rays are data-parallel over the mesh; parameter gradients
are ``pmean``-reduced across devices — the all-reduce rides ICI and XLA
overlaps it with the backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fspt_tpu.config import RenderConfig
from fspt_tpu.parallel.mesh import RAY_AXIS
from fspt_tpu.render import integrator


def _apply_params(scene, params):
    """Swap the optimizable leaves into the scene's material table."""
    table = scene.materials._replace(**params)
    return scene._replace(materials=table)


def render_image_rows(scene, camera, cfg: RenderConfig, seed, frame_idx, y0, rows):
    """Differentiable mean-radiance image for a scanline band [rows,W,3]."""
    out = integrator.render_wavefront(
        scene, camera, cfg, seed, frame_idx * cfg.spp, y0=y0, rows=rows
    )
    return out.radiance.reshape(rows, cfg.width, cfg.spp, 3).mean(axis=2)


def make_recovery_step(mesh, cfg: RenderConfig, param_names=("diffuse", "emissive"),
                       lr: float = 0.5):
    """Build a jitted sharded SGD step on the named material-table columns.

    Returns ``step(params, scene, camera, target, seed, frame_idx) ->
    (params, loss)`` where ``target`` is the full [H,W,3] target image
    (band-sharded or replicated — shard_map slices it) and ``params`` is a
    dict of material-table columns, replicated across devices.
    """
    n = mesh.devices.size
    if cfg.height % n != 0:
        raise ValueError(f"height {cfg.height} not divisible by {n} devices")
    rows_local = cfg.height // n

    def local_loss(params, scene, camera, target_local, seed, frame_idx, y0):
        scene = _apply_params(scene, params)
        img = render_image_rows(scene, camera, cfg, seed, frame_idx, y0, rows_local)
        return jnp.mean((img - target_local) ** 2)

    def local_step(params, scene, camera, target_local, seed, frame_idx):
        band = jax.lax.axis_index(RAY_AXIS)
        y0 = band * rows_local
        loss, grads = jax.value_and_grad(local_loss)(
            params, scene, camera, target_local, seed, frame_idx, y0
        )
        loss = jax.lax.pmean(loss, RAY_AXIS)
        grads = jax.lax.pmean(grads, RAY_AXIS)
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, loss

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(RAY_AXIS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
