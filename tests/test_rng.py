"""RNG stream tests: NumPy/jnp bit-parity, determinism, distribution."""

import jax.numpy as jnp
import numpy as np

from fspt_tpu.ops import rng


def test_numpy_jnp_bit_parity():
    pix = np.arange(4096, dtype=np.uint32)
    for ctr in [0, 1, 17, 255]:
        a = rng.stream_bits(42, pix, 7, ctr)
        b = np.asarray(rng.stream_bits(42, jnp.asarray(pix), 7, ctr))
        np.testing.assert_array_equal(a, b)


def test_uniform_range_and_determinism():
    pix = np.arange(100_000, dtype=np.uint32)
    u = rng.stream_uniform(9, pix, 3, 5)
    assert u.min() >= 0.0 and u.max() < 1.0
    u2 = rng.stream_uniform(9, pix, 3, 5)
    np.testing.assert_array_equal(u, u2)


def test_streams_decorrelated():
    pix = np.arange(200_000, dtype=np.uint32)
    u1 = rng.stream_uniform(9, pix, 0, 0)
    u2 = rng.stream_uniform(9, pix, 0, 1)
    u3 = rng.stream_uniform(9, pix, 1, 0)
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.01
    assert abs(np.corrcoef(u1, u3)[0, 1]) < 0.01
    assert abs(u1.mean() - 0.5) < 0.005
    assert abs(u1.var() - 1.0 / 12.0) < 0.005
