"""Device mesh construction.

One logical axis ``"rays"`` data-parallels the pixel/ray batch — the
embarrassingly parallel dimension of path tracing (SURVEY.md §2.3).  Scene
tensors and camera are replicated (small); the framebuffer is band-sharded.
Multi-host runs extend the same mesh across processes
(``jax.distributed.initialize`` in parallel/multihost.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

RAY_AXIS = "rays"


def mesh_devices(n_devices: int | None = None):
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return devs


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = mesh_devices(n_devices)
    return Mesh(np.asarray(devs), (RAY_AXIS,))
