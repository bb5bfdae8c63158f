"""Pallas bitonic sort tests (interpret mode on CPU).

The kernel itself is exercised compiled on TPU by the benchmarks; these
gate the network's correctness: full sort, valid permutation, padding
behavior, and the multi-block cross-pass path (via a shrunken block size).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nbody_tpu.ops.pallas_sort as ps


def _check(n, keys, interpret=True):
    ks, perm = ps.bitonic_argsort(jnp.asarray(keys), interpret=interpret)
    ks, perm = np.asarray(ks), np.asarray(perm)
    assert (ks == np.sort(keys)).all()
    assert (keys[perm] == ks).all()
    assert np.array_equal(np.sort(perm), np.arange(n))


@pytest.mark.parametrize("n", [1000, 1024, 2048])
def test_single_block_sorts(n):
    rng = np.random.default_rng(0)
    _check(n, rng.integers(0, 5000, size=n).astype(np.int32))


def test_duplicate_keys_grouped():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 7, size=1500).astype(np.int32)
    _check(1500, keys)


def test_multi_block_cross_passes(monkeypatch):
    """Exercise cross-block + merge kernels with a shrunken block size."""
    monkeypatch.setattr(ps, "_BLOCK_LOG2", 10)
    rng = np.random.default_rng(2)
    for n in (2048, 5000):
        _check(n, rng.integers(0, 3000, size=n).astype(np.int32))


def test_sort_pairs_carries_values():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 100, size=1024).astype(np.int32)
    vals = rng.integers(0, 1 << 30, size=1024).astype(np.int32)
    ks, vs = ps.bitonic_sort_pairs(
        jnp.asarray(keys), jnp.asarray(vals), interpret=True
    )
    ks, vs = np.asarray(ks), np.asarray(vs)
    assert (ks == np.sort(keys)).all()
    # every (key, val) pair must survive the exchanges intact
    got = sorted(zip(ks.tolist(), vs.tolist()))
    want = sorted(zip(keys.tolist(), vals.tolist()))
    assert got == want
