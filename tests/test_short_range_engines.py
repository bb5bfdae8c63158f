"""Cross-engine equivalence: the two gather-free short-range engines
(sorted-window sweep and dense cell tiles) must agree with each other and
with brute force, including overflow accounting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.models import init_spherical, init_disk
from nbody_tpu.ops.sorted_window import (
    build_sorted_grid,
    window_sweep,
    xy_ball,
)
from nbody_tpu.ops.tile_sweep import tile_near_field
from nbody_tpu.types import DiskDistParams, SphericalDistParams


def brute_near(pos, mass, coords, ws, eps):
    """All pairs whose cells are within Chebyshev distance ws."""
    pos = np.asarray(pos, np.float64)
    mass = np.asarray(mass, np.float64)
    coords = np.asarray(coords)
    cheb = np.abs(coords[None, :, :] - coords[:, None, :]).max(-1)
    d = pos[None, :, :] - pos[:, None, :]
    r2 = (d * d).sum(-1)
    keep = (cheb <= ws) & (r2 > 0)
    w = np.where(keep, mass[None, :] * (r2 + eps * eps) ** -1.5, 0.0)
    return np.einsum("ij,ijd->id", w, d)


def setup(key, n, d, radius=4.0):
    s = init_spherical(key, n, SphericalDistParams(radius=radius))
    lo = jnp.min(s.pos, axis=0)
    hi = jnp.max(s.pos, axis=0)
    cube = jnp.maximum(jnp.max(hi - lo), 1e-6) * 1.00001
    cell = cube / d
    coords = jnp.clip(((s.pos - lo) / cell).astype(jnp.int32), 0, d - 1)
    return s, lo, cell, coords


@pytest.mark.parametrize("ws", [1, 2])
def test_window_engine_matches_brute(key, ws):
    d = 8
    s, lo, cell, coords = setup(key, 300, d)
    grid = build_sorted_grid(s.pos, s.mass, coords, d)

    def pw(r2_raw, mj):
        inv = jax.lax.rsqrt(r2_raw + 0.01)
        return mj * inv * inv * inv

    acc, over = window_sweep(
        grid, d=d, xy_offsets=xy_ball(ws), z_halfwidth=ws,
        pair_weight=pw, window=512, block_size=64,
    )
    assert int(over) == 0
    ref = brute_near(s.pos, s.mass, coords, ws, 0.1)
    np.testing.assert_allclose(np.asarray(acc), ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("ws", [1, 2])
def test_tile_engine_matches_brute(key, ws):
    d = 8
    s, lo, cell, coords = setup(key, 300, d)
    acc, over = tile_near_field(
        s.pos, s.mass, coords, lo, cell,
        d=d, ws=ws, k=32, G=1.0, eps=0.1,
    )
    assert int(over) == 0
    ref = brute_near(s.pos, s.mass, coords, ws, 0.1)
    np.testing.assert_allclose(np.asarray(acc), ref, rtol=1e-3, atol=1e-4)


def test_engines_match_each_other(key):
    d = 16
    s, lo, cell, coords = setup(key, 1000, d)
    grid = build_sorted_grid(s.pos, s.mass, coords, d)

    def pw(r2_raw, mj):
        inv = jax.lax.rsqrt(r2_raw + 0.01)
        return mj * inv * inv * inv

    acc_w, over_w = window_sweep(
        grid, d=d, xy_offsets=xy_ball(1), z_halfwidth=1,
        pair_weight=pw, window=1024, block_size=128,
    )
    acc_t, over_t = tile_near_field(
        s.pos, s.mass, coords, lo, cell, d=d, ws=1, k=32, G=1.0, eps=0.1,
    )
    assert int(over_w) == 0 and int(over_t) == 0
    np.testing.assert_allclose(
        np.asarray(acc_w), np.asarray(acc_t), rtol=1e-4, atol=1e-5
    )


def test_tile_overflow_counted(key):
    """Cells over the slot cap report overflow, never fail silently."""
    pos = jnp.zeros((50, 3), jnp.float32) + jnp.linspace(
        0, 0.001, 50
    )[:, None]
    mass = jnp.ones((50,), jnp.float32)
    coords = jnp.zeros((50, 3), jnp.int32)
    acc, over = tile_near_field(
        pos, mass, coords,
        jnp.zeros(3), jnp.float32(1.0),
        d=4, ws=1, k=8, G=1.0, eps=0.1,
    )
    assert int(over) == 50 - 8
    assert np.isfinite(np.asarray(acc)).all()


def test_window_overflow_counted(key):
    """Too-small window reports misses."""
    d = 8
    s, lo, cell, coords = setup(key, 2000, d, radius=1.0)
    grid = build_sorted_grid(s.pos, s.mass, coords, d)

    def pw(r2_raw, mj):
        return mj * 0.0 + 1.0

    _, over = window_sweep(
        grid, d=d, xy_offsets=xy_ball(1), z_halfwidth=1,
        pair_weight=pw, window=64, block_size=64,
    )
    assert int(over) > 0
