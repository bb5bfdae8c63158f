"""Morton code tests (reference Morton kernels:
src/cuda/force_barnes_hut.cu:23-38)."""

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.ops.morton import (
    morton_codes_for_positions,
    morton_decode,
    morton_encode,
)


def test_encode_decode_roundtrip(key):
    coords = jax.random.randint(key, (1000, 3), 0, 1024, jnp.int32)
    codes = morton_encode(coords)
    back = morton_decode(codes)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))


def test_known_values():
    # (1,0,0) → bit 2; (0,1,0) → bit 1; (0,0,1) → bit 0
    coords = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                        [1, 1, 1]], jnp.int32)
    codes = np.asarray(morton_encode(coords))
    assert list(codes) == [0, 4, 2, 1, 7]


def test_ordering_locality():
    """Adjacent cells differ by small code deltas more often than random."""
    coords = jnp.array([[i, i, i] for i in range(64)], jnp.int32)
    codes = np.asarray(morton_encode(coords)).astype(np.int64)
    assert (np.diff(codes) > 0).all()  # diagonal is monotone in Z-order


def test_positions_mapping(key):
    pos = jax.random.uniform(key, (500, 3), jnp.float32, -5.0, 5.0)
    lo = jnp.min(pos, axis=0)
    extent = jnp.max(jnp.max(pos, axis=0) - lo)
    codes = morton_codes_for_positions(pos, lo, extent)
    assert codes.shape == (500,)
    assert int(codes.max()) < (1 << 30)
