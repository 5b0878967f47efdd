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


def apply_vertices(scene, params):
    """Swap optimizable triangle vertices {v0,v1,v2} into the geometry,
    rebuilding the derived fields (edges, geometric/flat shading normals,
    2·area) so the whole intersector stays differentiable w.r.t. them."""
    v0, v1, v2 = params["v0"], params["v1"], params["v2"]
    e1, e2 = v1 - v0, v2 - v0
    cr = jnp.cross(e1, e2)
    area2 = jnp.linalg.norm(cr, axis=-1)
    ng = cr / jnp.maximum(area2, 1e-30)[:, None]
    g = scene.geometry._replace(tri_v0=v0, tri_e1=e1, tri_e2=e2,
                                tri_ng=ng, tri_area2=area2,
                                tri_n0=ng, tri_n1=ng, tri_n2=ng)
    return scene._replace(geometry=g)


def render_image_rows(scene, camera, cfg: RenderConfig, seed, frame_idx, y0,
                      rows, intersector=None):
    """Differentiable mean-radiance image for a scanline band [rows,W,3]."""
    out = integrator.render_wavefront(
        scene, camera, cfg, seed, frame_idx * cfg.spp, y0=y0, rows=rows,
        intersector=intersector
    )
    return out.radiance.reshape(rows, cfg.width, cfg.spp, 3).mean(axis=2)


# Physical box constraints per material-table column; projecting onto them
# after each step breaks the albedo↔emission gauge freedom (radiance only
# constrains their products, so unconstrained recovery can trade a dim light
# against >1 albedos).
DEFAULT_CONSTRAINTS = {
    "diffuse": (0.0, 1.0),
    "emissive": (0.0, None),
    "glow": (0.0, None),
}


def make_recovery_step(mesh, cfg: RenderConfig, param_names=("diffuse", "emissive"),
                       lr: float = 0.5, optimizer=None, constraints=None,
                       apply_fn=_apply_params, pool: int = 8,
                       intersector_bind=None, render_fn=None,
                       pair_render_fn=None, loss_fn=None,
                       loss_and_grad_fn=None):
    """Build a jitted sharded optimizer step on the named material-table columns.

    Returns ``step(params, scene, camera, target, seed, frame_idx) ->
    (params, loss)`` where ``target`` is the full [H,W,3] target image
    (band-sharded or replicated — shard_map slices it) and ``params`` is a
    dict of material-table columns, replicated across devices.

    ``optimizer``: an optax GradientTransformation; defaults to plain SGD at
    ``lr``.  With an optimizer, call :func:`make_recovery_step_with_state`
    semantics via the returned step's ``init(params)`` attribute.

    ``pool``: noise-pooling patch size in the loss.  Patches never cross
    shard bands, so the objective depends on the device count unless
    ``pool == 1`` (which is exactly the unpooled dual-buffer product and is
    shard-count invariant).

    ``loss_fn(img_a, img_b, target_local) → scalar`` replaces the pooled
    dual-buffer product with an arbitrary image objective (the two
    independently-sampled renders let unbiased estimators pair them;
    single-buffer losses just use ``img_a``).

    ``loss_and_grad_fn(params, target_local, seed, frame_idx, y0, rows) →
    (loss, grads, segments)`` bypasses XLA AD entirely — the hook for the
    fused Pallas loss kernel (ops/pallas_grad.make_fused_loss_grad_fn),
    which computes the dual-buffer loss AND its parameter gradient in one
    kernel call per band.  Mutually exclusive with the render hooks.
    """
    n = mesh.devices.size
    if cfg.height % n != 0:
        raise ValueError(f"height {cfg.height} not divisible by {n} devices")
    rows_local = cfg.height // n

    def _pool(x, p):
        h, w = x.shape[0], x.shape[1]
        py, px = max(1, min(p, h)), max(1, min(p, w))  # thin sharded bands
        ph, pw = h - h % py, w - w % px
        return x[:ph, :pw].reshape(ph // py, py, pw // px, px, 3).mean(axis=(1, 3))

    def local_loss(params, scene, camera, target_local, seed, frame_idx, y0):
        # Two noise-robustness devices, both standard in inverse rendering:
        # 1. Dual-buffer product: naive MSE against a Monte-Carlo render is
        #    biased — E[(X−t)²] = Var(X) + (E[X]−t)² and Var grows with the
        #    parameters, so the optimum lands darker than truth.  Two
        #    independent sample sets A, B give E[(A−t)(B−t)] = (E[X]−t)²;
        #    the variance term cancels and the gradient is unbiased.
        # 2. Spatial pooling before the product: the *target's* residual
        #    noise adds a linear-in-params term with random slope
        #    −2Σ c_p δ_p that shifts the optimum; averaging p×p patches
        #    shrinks every noise projection by p² while global material
        #    parameters lose no constraints.
        if pair_render_fn is not None:
            # One call yields both correlated buffers (renderers that share
            # work between them, e.g. the two-phase BVH replay).
            img_a, img_b = pair_render_fn(params, scene, camera, seed,
                                          frame_idx, y0, rows_local)
        elif render_fn is not None:
            img_a = render_fn(params, scene, camera, seed, frame_idx, y0,
                              rows_local)
            img_b = render_fn(params, scene, camera, seed, frame_idx + 10007,
                              y0, rows_local)
        else:
            scene = apply_fn(scene, params)
            inter = None if intersector_bind is None else intersector_bind(params)
            img_a = render_image_rows(scene, camera, cfg, seed, frame_idx, y0,
                                      rows_local, intersector=inter)
            img_b = render_image_rows(scene, camera, cfg, seed, frame_idx + 10007,
                                      y0, rows_local, intersector=inter)
        if loss_fn is not None:
            return loss_fn(img_a, img_b, target_local)
        da = _pool(img_a - target_local, pool)
        db = _pool(img_b - target_local, pool)
        return jnp.mean(da * db)

    use_optax = optimizer is not None

    def local_step(params, opt_state, scene, camera, target_local, seed, frame_idx):
        band = jax.lax.axis_index(RAY_AXIS)
        y0 = band * rows_local
        if loss_and_grad_fn is not None:
            loss, grads, _segs = loss_and_grad_fn(
                params, target_local, seed, frame_idx, y0, rows_local)
        else:
            loss, grads = jax.value_and_grad(local_loss)(
                params, scene, camera, target_local, seed, frame_idx, y0
            )
        loss = jax.lax.pmean(loss, RAY_AXIS)
        grads = jax.lax.pmean(grads, RAY_AXIS)
        if use_optax:
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
        else:
            params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        box = DEFAULT_CONSTRAINTS if constraints is None else constraints
        params = {
            k: jnp.clip(v, *box[k]) if k in box else v for k, v in params.items()
        }
        return params, opt_state, loss

    fn = jax.jit(jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(RAY_AXIS), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    ))

    # Commit replicated inputs to their post-step sharding up front: the
    # step's outputs carry NamedSharding(mesh, P()), so a first call with
    # unspecified-sharding inputs would compile a second executable for
    # every later call (measured: a full duplicate ~50 s compile on TPU).
    _rep = jax.sharding.NamedSharding(mesh, P())

    def _commit(tree):
        return jax.tree.map(
            lambda x: jax.device_put(x, _rep)
            if isinstance(x, jax.Array) else x, tree)

    if use_optax:
        def step(params, opt_state, scene, camera, target, seed, frame_idx):
            return fn(_commit(params), _commit(opt_state), scene, camera,
                      target, seed, frame_idx)

        # jit commits the optimizer-state dtypes (plain optax init returns
        # weak-typed leaves whose post-update strong types forced a full
        # second compile of the step — the r3 bench's "two warmups").
        step.init = jax.jit(optimizer.init)
        return step

    def step(params, scene, camera, target, seed, frame_idx):
        params, _, loss = fn(_commit(params), 0, scene, camera, target,
                             seed, frame_idx)
        return params, loss

    return step


def make_fused_recovery_step(mesh, scene, camera, cfg: RenderConfig,
                             fields=("diffuse", "emissive"), lr: float = 0.5,
                             optimizer=None, constraints=None, pool: int = 8,
                             loss_fn=None, **tracer_kwargs):
    """ONE gradient front door: sharded recovery on the fused Pallas
    fwd+bwd machinery (ops/pallas_grad.py), fastest applicable
    construction chosen automatically —

    1. the single fused LOSS KERNEL (dual-buffer loss + every parameter
       gradient in one Pallas call per band; covers material columns AND
       the traced-raygen ``"camera"`` 9-vector, pallas_path.camera_pvec)
       when the default lane-level loss applies (``pool=1``, no custom
       ``loss_fn``),
    2. the in-kernel-adjoint kernel pair (band images via custom VJP),
    3. the affine-deferred fold (textured scenes / ``"texels"`` recovery,
       radiometric fields, arbitrary image losses through XLA AD of
       loss∘fold).

    Parameter gradients pmean across the mesh — the multi-chip form of the
    headline fwd+bwd path ("the fast path × N workers", reference
    engine.cpp:261-274).

    ``params`` for the returned step is a dict of the selected fields
    (e.g. {"diffuse": [M,3], "camera": camera_pvec(cam)}).  Scene and the
    static camera are baked into the kernels (a live-recovered camera
    rides in ``params["camera"]``).  ``loss_fn(img_a, img_b, target)``
    swaps in an arbitrary image objective on constructions 2-3.  Raises
    ValueError when the scene can't be specialized (use
    make_recovery_step then).
    """
    from fspt_tpu.ops.pallas_grad import (CAMERA_FIELD,
                                          make_affine_grad_image_fn,
                                          make_fused_loss_grad_fn,
                                          make_grad_image_fn)

    if loss_fn is None and pool == 1 and "texels" not in fields:
        fused = make_fused_loss_grad_fn(scene, camera, cfg, fields=fields,
                                        **tracer_kwargs)
        if fused is not None:
            return make_recovery_step(mesh, cfg, param_names=fields, lr=lr,
                                      optimizer=optimizer,
                                      constraints=constraints, pool=1,
                                      loss_and_grad_fn=fused)
    if CAMERA_FIELD in fields:
        raise ValueError("camera recovery needs the fused loss kernel "
                         "(untextured specialized scene, pool=1, default "
                         "loss)")

    # Untextured scenes: the in-kernel-adjoint pair (fastest measured
    # fwd+bwd with a custom/pooled loss).  Textured scenes / texel
    # recovery: the affine-deferred fold — radiometric fields only (path
    # geometry can't depend on them).
    radiometric = {"diffuse", "emissive", "glow", "texels"}
    img_fn = None
    if "texels" not in fields:
        img_fn = make_grad_image_fn(scene, camera, cfg, fields=fields,
                                    **tracer_kwargs)
    if img_fn is None and set(fields) <= radiometric:
        img_fn = make_affine_grad_image_fn(scene, camera, cfg,
                                           **tracer_kwargs)
    if img_fn is None:
        raise ValueError("scene can't use the fused kernels; "
                         "use make_recovery_step")

    def render_fn(params, _scene, _camera, seed, frame_idx, y0, rows):
        img, _ = img_fn(params, seed, frame_idx, y0, rows)
        return img

    return make_recovery_step(mesh, cfg, param_names=fields, lr=lr,
                              optimizer=optimizer, constraints=constraints,
                              pool=pool, render_fn=render_fn,
                              loss_fn=loss_fn)


def make_vertex_recovery_step(mesh, cfg: RenderConfig, lr: float = 0.05,
                              optimizer=None, pool: int = 1):
    """BASELINE config 5: edge-reparameterized vertex gradients with rays
    sharded across the device mesh.

    ``cfg.edge_eps`` should be > 0 so silhouette motion is differentiable
    (integrator.trace_radiance); interior shading gradients flow through the
    Möller–Trumbore intersector either way.  Vertex grads are pmean-reduced
    across the ray shards like material grads.
    """
    return make_recovery_step(mesh, cfg, lr=lr, optimizer=optimizer,
                              constraints={}, apply_fn=apply_vertices,
                              pool=pool)


def make_bvh_vertex_recovery_step(mesh, cfg: RenderConfig, scene,
                                  lr: float = 0.05, optimizer=None,
                                  pool: int = 1, shade_normals="flat",
                                  queue: int | None = None,
                                  use_queue: bool = False,
                                  replay: str = "wavefront",
                                  **fast_kwargs):
    """Vertex recovery on a BVH-scale scene (100k+ triangles) by TWO-PHASE
    hit-id replay:

    1. **Record** (no gradients): both correlated sample buffers stream
       through the regenerating ray queue as one ``2·spp`` render with the
       culled-treelet Pallas sweep intersector, recording each segment's
       winner id (render/queue.py ``record_hits``).
    2. **Replay** (differentiable): the unrolled wavefront re-renders the
       SAME paths through ops/diff_intersect.make_recorded_replay — one
       Möller–Trumbore of the recorded winner per segment, reading the
       traced vertex arrays.  The sort/cull/sweep machinery never enters
       the AD graph, so the step compiles ~6× faster than differentiating
       the one-phase pipeline and the forward rides the queue's
       full-occupancy schedule.

    Phase 2 is deterministically equivalent to phase 1 (same RNG streams,
    same decisions — the queue's schedule-invariance argument), so the
    gradient is exactly the one-phase replay gradient.

    ``params`` is ``{"v0": [T,3], "v1": [T,3], "v2": [T,3]}`` in original
    triangle order (start from ops/diff_intersect.tris_from_scene).  The
    BVH itself stays baked to the scene's build-time vertices: hits remain
    exact while perturbed triangles stay inside their (slightly stale)
    treelet bounds — rebuild the scene to refit after large moves.

    ``shade_normals="flat"`` re-derives geometric normals from the traced
    vertices so lighting follows the surface; "fixed" keeps the baked
    shading normals.

    ``replay`` selects the phase-2 renderer: ``"wavefront"`` (default) =
    the general integrator; ``"planar"`` = the component-planar path body
    (ops/diff_intersect.make_planar_recorded_replay).  The planar form
    avoids the (8,128) tile-padding tax on loop state, but measured
    STRICTLY WORSE end-to-end (933 vs 727 ms/step at the bench config,
    no compile-time win — r5 probe 10): the step is dominated by the
    phase-1 record (~80%), and the planar body re-runs the baked analytic
    intersect per bounce where the wavefront replay reuses recorded hits.
    It remains selectable for experiments; ``"auto"`` = wavefront.
    """
    import dataclasses

    from fspt_tpu.ops.diff_intersect import (flat_normals,
                                             make_diff_mesh_intersector,
                                             make_planar_recorded_replay,
                                             make_recorded_replay,
                                             tris_from_scene)
    from fspt_tpu.render import integrator
    from fspt_tpu.render.queue import DEFAULT_QUEUE, render_queued

    diff = make_diff_mesh_intersector(scene, **fast_kwargs)
    if diff is None:
        raise ValueError("scene has no BVH; use make_vertex_recovery_step")
    baked = tris_from_scene(scene)
    replay_bind = make_recorded_replay(scene)
    # Both sample buffers in one pass: samples [0, spp) are buffer A,
    # [spp, 2·spp) buffer B — distinct RNG counters, so independent.
    cfg2 = dataclasses.replace(cfg, spp=2 * cfg.spp)
    q = queue or DEFAULT_QUEUE
    planar = None
    if replay == "planar":
        # z_far is baked into the planar body; every Camera.create in this
        # codebase uses the reference default 10000 (camera.py).
        planar = make_planar_recorded_replay(scene, cfg2, z_far=10000.0)
        if planar is None:
            raise ValueError("scene can't use the planar replay "
                             "(textured or too many analytic prims)")

    def bind_tris(params):
        tr = dict(baked)
        tr.update({k: params[k] for k in ("v0", "v1", "v2")})
        if shade_normals == "flat":
            n = flat_normals(tr["v0"], tr["v1"], tr["v2"])
            tr["n0"] = tr["n1"] = tr["n2"] = n
        return tr

    def pair_render(params, scene_in, camera, seed, frame_idx, y0, rows):
        tr = bind_tris(params)
        sg = jax.lax.stop_gradient
        tr_sg = jax.tree.map(sg, tr)

        # Phase 1: fast render under stop_gradient, winner ids recorded.
        # The unrolled wavefront beats the queue at recovery depths (2-4):
        # primary blocks stay coherent instead of mixing with regenerated
        # bounces (584 vs 847 ms at the r4 bench config); the queue path
        # (render_queued record_hits=True) remains available via
        # ``use_queue`` for deep-bounce configs.
        if use_queue:
            _, (ids, hitm) = render_queued(
                scene_in, camera, cfg2, seed, frame_idx * cfg2.spp, y0=y0,
                rows=rows, intersector=diff.bind(tr_sg), queue=q, aovs=False,
                record_hits=True)
        else:
            rec = []
            inner = diff.bind(tr_sg)

            def recorder(start, seg, alive=None):
                h = inner(start, seg, alive)
                rec.append((h.prim_id, h.hit))
                return h

            recorder.accepts_alive = True
            integrator.render_wavefront(
                scene_in, camera, cfg2, sg(seed), frame_idx * cfg2.spp,
                y0=y0, rows=rows, intersector=recorder)
            ids = jnp.stack([sg(i) for i, _ in rec], axis=1)
            hitm = jnp.stack([sg(h) for _, h in rec], axis=1)

        # Phase 2: differentiable replay of the recorded paths — one
        # Möller–Trumbore of the recorded winner per segment; the
        # sort/cull/sweep machinery never enters the AD graph.  Planar
        # body when available (no (8,128) tile-padding tax), general
        # integrator otherwise.
        if planar is not None:
            rad, _ = planar(tr, ids, hitm, camera, seed,
                            frame_idx * cfg2.spp, y0=y0, rows=rows)
        else:
            out = integrator.render_wavefront(
                scene_in, camera, cfg2, seed, frame_idx * cfg2.spp, y0=y0,
                rows=rows, intersector=replay_bind(tr, ids, hitm))
            rad = out.radiance
        rad = rad.reshape(rows, cfg.width, 2, cfg.spp, 3)
        return rad[:, :, 0].mean(axis=2), rad[:, :, 1].mean(axis=2)

    return make_recovery_step(mesh, cfg, lr=lr, optimizer=optimizer,
                              constraints={}, apply_fn=lambda s, p: s,
                              pool=pool, pair_render_fn=pair_render)
