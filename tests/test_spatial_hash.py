"""Spatial hash tests (reference: tests/test_spatial_hash.cpp).

Cell index math, cell-assignment audit (every particle in exactly one cell,
all N covered), nonzero forces within cutoff, zero outside, and equivalence
with a brute-force cutoff reference.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.models import init_spherical
from nbody_tpu.ops.spatial_hash import (
    build_spatial_grid,
    cell_index,
    spatial_hash_forces,
    verify_cell_assignment,
)
from nbody_tpu.types import SphericalDistParams


def brute_force_cutoff(pos, mass, G, eps, cutoff):
    """Golden reference: all-pairs with the same raw-distance cutoff rule."""
    pos = np.asarray(pos, np.float64)
    mass = np.asarray(mass, np.float64)
    d = pos[None, :, :] - pos[:, None, :]
    r2 = (d * d).sum(-1)
    keep = (r2 <= cutoff * cutoff) & (r2 > 0)
    w = np.where(keep, mass[None, :] * (r2 + eps * eps) ** -1.5, 0.0)
    return G * np.einsum("ij,ijd->id", w, d)


def test_cell_index_math():
    """reference: test_spatial_hash.cpp:15-60 cell index tests."""
    cap = 8
    coords = jnp.array([[0, 0, 0], [1, 2, 3], [7, 7, 7]], jnp.int32)
    ids = np.asarray(cell_index(coords, cap))
    assert ids[0] == 0
    assert ids[1] == (1 * 8 + 2) * 8 + 3
    assert ids[2] == 8 * 8 * 8 - 1


def test_cell_assignment_audit(key):
    """Set-based audit of cell_start/cell_count/order
    (reference: test_spatial_hash.cpp:62-182)."""
    s = init_spherical(key, 500, SphericalDistParams(radius=5.0))
    grid = build_spatial_grid(s.pos, cell_size=1.0, cap=16, max_per_cell=64)
    assert verify_cell_assignment(s.pos, grid, cap=16)
    assert int(grid.overflow) == 0


def test_nonzero_within_cutoff():
    """Two particles inside the cutoff attract (reference:
    test_spatial_hash.cpp force tests)."""
    pos = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]], jnp.float32)
    mass = jnp.ones((2,), jnp.float32)
    acc = np.asarray(
        spatial_hash_forces(pos, mass, 1.0, 0.1, cutoff=2.0, cell_size=1.0)
    )
    assert np.linalg.norm(acc[0]) > 0
    assert acc[0, 0] > 0  # toward the neighbor
    assert acc[1, 0] < 0


def test_zero_outside_cutoff():
    pos = jnp.array([[0.0, 0.0, 0.0], [1.9, 0.0, 0.0]], jnp.float32)
    mass = jnp.ones((2,), jnp.float32)
    # cell_size 2.0 → both in neighboring cells; cutoff 1.0 < separation
    acc = np.asarray(
        spatial_hash_forces(pos, mass, 1.0, 0.1, cutoff=1.0, cell_size=2.0)
    )
    np.testing.assert_allclose(acc, 0.0)


def test_matches_bruteforce_cutoff(key):
    """Hash forces == brute-force cutoff forces when cell_size ≥ cutoff."""
    s = init_spherical(key, 400, SphericalDistParams(radius=4.0))
    G, eps, cutoff = 1.0, 0.1, 1.5
    got = np.asarray(
        spatial_hash_forces(
            s.pos, s.mass, G, eps,
            cutoff=cutoff, cell_size=1.5, cap=16, window=1024,
        )
    )
    ref = brute_force_cutoff(s.pos, s.mass, G, eps, cutoff)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_momentum_conservation(key):
    s = init_spherical(key, 300, SphericalDistParams(radius=3.0))
    acc = spatial_hash_forces(
        s.pos, s.mass, 1.0, 0.1, cutoff=1.0, cell_size=1.0, window=1024
    )
    net = np.asarray(jnp.sum(s.mass[:, None] * acc, axis=0))
    assert np.abs(net).max() < 1e-3


def test_overflow_counted(key):
    """Cells over the K cap report overflow instead of failing silently."""
    pos = jnp.zeros((100, 3), jnp.float32) + jnp.linspace(0, 0.01, 100)[:, None]
    grid = build_spatial_grid(pos, cell_size=1.0, cap=8, max_per_cell=16)
    assert int(grid.overflow) > 0


def test_finite_on_dense_cluster(key):
    s = init_spherical(key, 1000, SphericalDistParams(radius=0.5))
    acc = spatial_hash_forces(s.pos, s.mass, 1.0, 0.1)
    assert bool(jnp.all(jnp.isfinite(acc)))
