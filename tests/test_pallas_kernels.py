"""Interpret-mode correctness for the Pallas TPU kernels (run on CPU; the
same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas


def reference_sweep(tiles_t, ws, eps):
    """NumPy re-computation of the tile sweep."""
    k, _, d, _, _ = tiles_t.shape
    t = np.asarray(tiles_t, np.float64)
    pad = np.zeros((k, 4, d + 2 * ws, d + 2 * ws, d + 2 * ws))
    pad[:, :, ws:ws + d, ws:ws + d, ws:ws + d] = t
    acc = np.zeros((k, 3, d, d, d))
    r = range(2 * ws + 1)
    for xo in r:
        for yo in r:
            for zo in r:
                s = pad[:, :, xo:xo + d, yo:yo + d, zo:zo + d]
                for kt in range(k):
                    dx = s[:, 0] - t[kt, 0]
                    dy = s[:, 1] - t[kt, 1]
                    dz = s[:, 2] - t[kt, 2]
                    r2 = dx * dx + dy * dy + dz * dz
                    w = s[:, 3] * (r2 + eps * eps) ** -1.5
                    w = np.where(r2 == 0.0, 0.0, w)
                    acc[kt, 0] += (w * dx).sum(0)
                    acc[kt, 1] += (w * dy).sum(0)
                    acc[kt, 2] += (w * dz).sum(0)
    return acc


@pytest.mark.parametrize("ws", [1, 2])
def test_tile_sweep_pallas_interpret(ws):
    k, d = 4, 8
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (k, 3, d, d, d), jnp.float32, 0.0, 8.0)
    mass = jax.random.uniform(
        jax.random.PRNGKey(1), (k, 1, d, d, d), jnp.float32, 0.0, 1.0
    )
    # some empty slots (mass 0)
    mass = mass.at[2:].set(0.0)
    tiles_t = jnp.concatenate([pos, mass], axis=1)  # (k, 4, d, d, d)

    got = tile_sweep_pallas(
        tiles_t, k=k, d=d, ws=ws, eps=0.1, interpret=True
    )
    ref = reference_sweep(tiles_t, ws, 0.1)
    np.testing.assert_allclose(
        np.asarray(got), ref, rtol=2e-4, atol=2e-4
    )
