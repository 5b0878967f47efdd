"""Counter-based RNG streams.

Replaces the reference's thread-local xorshift64* generator seeded with wall
clock time (reference math/random.cpp:6-27, engine.cpp:179) with stateless
counter-based streams keyed on ``(seed, pixel, sample, counter)``.  This makes
every Monte-Carlo draw a pure function of its coordinates, so

* the renderer is deterministic and reproducible,
* results are invariant to device-mesh layout (a lane draws the same numbers
  no matter which chip it lands on),
* the NumPy oracle renderer and the jitted wavefront renderer can consume
  bit-identical streams, enabling exact-match testing (SURVEY.md §4.2).

The hash is the PCG-family integer hash (O'Neill; popularized for GPU MC
rendering by Jarzynski & Olano, "Hash Functions for GPU Rendering", JCGT
2020).  All arithmetic is uint32 with wraparound, implementable identically
in NumPy and jnp (and in Pallas via pltpu bit ops).

Stream layout contract (shared with render/oracle.py):

* camera draws for a sample use counters ``CTR_CAMERA + slot`` (4 slots:
  jitter_x, jitter_y, lens_angle, lens_radius),
* bounce ``d`` draws use counters ``CTR_BOUNCE + d * bounce_slots + slot``
  with slots ``(choice, dir_a, dir_b, aux)`` where ``aux`` is the refraction
  solid-angle delta or the fog absorption decision.
"""

from __future__ import annotations

import numpy as np

U32 = np.uint32

# Counter-space layout; keep camera and bounce streams disjoint.
CTR_CAMERA = 0
CTR_BOUNCE = 16
# Edge-reparameterization draws live far from the bounce range so enabling
# them never shifts the material-sampling streams (oracle parity holds).
CTR_EDGE = 4096

SLOT_CHOICE = 0
SLOT_DIR_A = 1
SLOT_DIR_B = 2
SLOT_AUX = 3


def _u32(x):
    """Cast an int / NumPy / jnp value to uint32 without importing jax here."""
    if isinstance(x, (int, np.integer)):
        return U32(x & 0xFFFFFFFF)
    return x.astype("uint32")


def pcg_hash(x):
    """One round of the PCG-RXS-M-XS output permutation over uint32."""
    with np.errstate(over="ignore"):  # uint32 wraparound is intentional
        x = x * U32(747796405) + U32(2891336453)
        word = ((x >> ((x >> U32(28)) + U32(4))) ^ x) * U32(277803737)
        return (word >> U32(22)) ^ word


def stream_bits(seed, pixel, sample, ctr):
    """uint32 hash of the stream coordinates; broadcasts over array inputs."""
    h = pcg_hash(_u32(seed) ^ U32(0x9E3779B9))
    h = pcg_hash(h + _u32(pixel))
    h = pcg_hash(h + _u32(sample))
    h = pcg_hash(h + _u32(ctr))
    return h


def bits_to_uniform(bits):
    """Map uint32 bits to float32 in [0, 1) with 24 bits of precision."""
    return (bits >> U32(8)).astype("float32") * np.float32(1.0 / (1 << 24))


def stream_uniform(seed, pixel, sample, ctr):
    """float32 uniform in [0,1) for the given stream coordinates."""
    return bits_to_uniform(stream_bits(seed, pixel, sample, ctr))


def camera_uniforms(seed, pixel, sample):
    """The 4 camera-sampling uniforms, stacked on a new trailing axis."""
    us = [stream_uniform(seed, pixel, sample, CTR_CAMERA + s) for s in range(4)]
    return _stack_last(us)


def bounce_uniforms(seed, pixel, sample, depth, bounce_slots=4):
    """The per-bounce uniforms (choice, dir_a, dir_b, aux)."""
    base = CTR_BOUNCE + depth * bounce_slots
    us = [stream_uniform(seed, pixel, sample, base + s) for s in range(4)]
    return _stack_last(us)


def edge_uniform(seed, pixel, sample, depth):
    """The per-bounce edge-reparameterization uniform (its own counter
    namespace — drawing it never perturbs material-sampling streams)."""
    return stream_uniform(seed, pixel, sample, CTR_EDGE + depth)


def _stack_last(arrays):
    first = arrays[0]
    if isinstance(first, np.ndarray) or np.isscalar(first):
        return np.stack(arrays, axis=-1)
    import jax.numpy as jnp  # deferred so NumPy-only users avoid the import

    return jnp.stack(arrays, axis=-1)
