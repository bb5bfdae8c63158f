"""Direct-force tests (reference: tests/test_force_calculation.cpp).

Analytic two-body magnitude/direction, softening boundedness, blocked-vs-
reference equivalence, and Pallas-kernel (interpret-mode) equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.models import init_spherical
from nbody_tpu.ops.direct import (
    direct_forces,
    direct_forces_pallas,
    direct_forces_reference,
)


def test_two_body_analytic_magnitude():
    """|a| = G·m/(r² + ε²) within 1%
    (reference: test_force_calculation.cpp:13-60)."""
    G, eps, r, m = 1.0, 0.1, 2.0, 3.0
    pos = jnp.array([[0.0, 0.0, 0.0], [r, 0.0, 0.0]], jnp.float32)
    mass = jnp.array([m, m], jnp.float32)
    acc = direct_forces_reference(pos, mass, G, eps)
    expected = G * m * r / (r * r + eps * eps) ** 1.5
    got = float(jnp.linalg.norm(acc[0]))
    assert abs(got - expected) / expected < 0.01


def test_two_body_direction():
    """Force points from each particle toward the other (dot > 0.999)."""
    pos = jnp.array([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]], jnp.float32)
    mass = jnp.array([1.0, 1.0], jnp.float32)
    acc = np.asarray(direct_forces_reference(pos, mass))
    d = np.array(pos[1] - pos[0])
    d /= np.linalg.norm(d)
    a0 = acc[0] / np.linalg.norm(acc[0])
    a1 = acc[1] / np.linalg.norm(acc[1])
    assert np.dot(a0, d) > 0.999
    assert np.dot(a1, -d) > 0.999


@pytest.mark.parametrize("eps", [0.01, 0.1, 1.0])
def test_softening_bounds_force(eps):
    """Near-coincident particles produce finite, bounded force
    (reference: test_force_calculation.cpp:101-180)."""
    pos = jnp.array([[0.0, 0.0, 0.0], [1e-7, 0.0, 0.0]], jnp.float32)
    mass = jnp.array([1.0, 1.0], jnp.float32)
    acc = np.asarray(direct_forces_reference(pos, mass, 1.0, eps))
    assert np.isfinite(acc).all()
    assert np.linalg.norm(acc, axis=-1).max() <= 1.0 / (eps * eps) + 1e-3


def test_exactly_coincident_is_zero():
    pos = jnp.zeros((4, 3), jnp.float32)
    mass = jnp.ones((4,), jnp.float32)
    acc = np.asarray(direct_forces_reference(pos, mass, 1.0, 0.0))
    assert np.isfinite(acc).all()
    np.testing.assert_allclose(acc, 0.0)


def test_momentum_conservation(key):
    """Σ m·a = 0 for pairwise-symmetric forces."""
    s = init_spherical(key, 300)
    acc = direct_forces_reference(s.pos, s.mass, 1.0, 0.1)
    net = np.asarray(jnp.sum(s.mass[:, None] * acc, axis=0))
    assert np.abs(net).max() < 1e-3


def test_blocked_matches_reference(key):
    s = init_spherical(key, 1000)
    ref = direct_forces_reference(s.pos, s.mass, 2.0, 0.05)
    got = direct_forces(s.pos, s.mass, 2.0, 0.05, block_size=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_blocked_matches_f64_golden(key):
    """Float32 blocked path vs float64 golden within loose tolerance."""
    s = init_spherical(key, 500)
    gold = direct_forces_reference(s.pos, s.mass, 1.0, 0.1, dtype=jnp.float64)
    got = direct_forces(s.pos, s.mass, 1.0, 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(gold), rtol=1e-3, atol=1e-4)


def test_pallas_interpret_matches_reference(key):
    s = init_spherical(key, 700)  # deliberately not a multiple of the tile
    ref = direct_forces_reference(s.pos, s.mass, 1.0, 0.1)
    got = direct_forces_pallas(
        s.pos, s.mass, 1.0, 0.1, block_i=256, block_j=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_finite_on_spherical_init(key):
    """100-particle spherical init → finite accelerations
    (reference: test_force_calculation.cpp:62-96)."""
    s = init_spherical(key, 100)
    acc = direct_forces(s.pos, s.mass, 1.0, 0.1)
    assert bool(jnp.all(jnp.isfinite(acc)))
