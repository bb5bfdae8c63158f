"""Barnes-Hut tests (reference: tests/test_barnes_hut.cpp).

Pyramid build + mass conservation, θ-convergence against the direct
reference, small-θ equivalence with Direct N² (reference:
test_spatial_hash.cpp:186-249 runs the same property), and momentum
conservation of the combined near+far field.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.models import init_spherical, init_disk
from nbody_tpu.ops.barnes_hut import (
    barnes_hut_forces,
    build_pyramid,
    theta_to_ws,
    verify_mass_conservation,
    verify_pyramid_structure,
)
from nbody_tpu.ops.direct import direct_forces_reference
from nbody_tpu.types import DiskDistParams, SphericalDistParams


def rel_error(got, ref):
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    num = np.linalg.norm(got - ref, axis=-1)
    den = np.linalg.norm(ref, axis=-1) + 1e-12
    return float(np.median(num / den))


def test_theta_to_ws():
    assert theta_to_ws(1.0) == 1
    assert theta_to_ws(0.5) == 2
    assert theta_to_ws(0.3) == 4
    assert theta_to_ws(0.1) == 10
    assert theta_to_ws(0.0) == 16  # exact fallback clamps at max


def test_pyramid_mass_conservation(key):
    """reference: test_barnes_hut.cpp:15-94 (verifyMassConservation)."""
    s = init_spherical(key, 1000, SphericalDistParams(radius=5.0))
    pyr = build_pyramid(s.pos, s.mass, levels=5)
    assert verify_mass_conservation(pyr, float(s.mass.sum()))
    assert verify_pyramid_structure(pyr)
    # root cell holds everything
    assert pyr.masses[0].shape == (1, 1, 1)
    np.testing.assert_allclose(
        float(pyr.masses[0].sum()), float(s.mass.sum()), rtol=1e-4
    )


def test_pyramid_com(key):
    """Root COM equals the global center of mass."""
    s = init_spherical(key, 500, SphericalDistParams(radius=3.0))
    pyr = build_pyramid(s.pos, s.mass, levels=4)
    root_com = np.asarray(pyr.msums[0]).reshape(3) / float(pyr.masses[0].sum())
    expected = np.average(
        np.asarray(s.pos), axis=0, weights=np.asarray(s.mass)
    )
    np.testing.assert_allclose(root_com, expected, atol=1e-3)


def test_accuracy_vs_direct(key):
    """BH (θ=0.5) median relative force error well under 5%."""
    s = init_spherical(key, 800, SphericalDistParams(radius=5.0))
    ref = direct_forces_reference(s.pos, s.mass, 1.0, 0.1)
    got = barnes_hut_forces(s.pos, s.mass, 1.0, 0.1, 0.5, levels=4)
    assert rel_error(got, ref) < 0.05


def test_theta_convergence(key):
    """error(θ=0.3) ≤ error(θ=0.8)·1.1 (reference: test_barnes_hut.cpp:99-201)."""
    s = init_spherical(key, 600, SphericalDistParams(radius=5.0))
    ref = direct_forces_reference(s.pos, s.mass, 1.0, 0.1)
    e_tight = rel_error(
        barnes_hut_forces(s.pos, s.mass, 1.0, 0.1, 0.3, levels=4), ref
    )
    e_loose = rel_error(
        barnes_hut_forces(s.pos, s.mass, 1.0, 0.1, 0.8, levels=4), ref
    )
    assert e_tight <= e_loose * 1.1


def test_small_theta_matches_direct(key):
    """BH(θ=0.1) within 10% of Direct N² per-particle
    (reference: test_spatial_hash.cpp:186-249)."""
    s = init_spherical(key, 300, SphericalDistParams(radius=4.0))
    ref = direct_forces_reference(s.pos, s.mass, 1.0, 0.1)
    # levels=3: θ=0.1 → ws=5, and the (2ws+1)³ sweep + far taps scale
    # with d³ — L4 measured 124 s of CPU work for the same 10% gate
    # (coarser grids only push MORE pairs into the exact near field).
    got = barnes_hut_forces(
        s.pos, s.mass, 1.0, 0.1, 0.1, levels=3, window=1024
    )
    got_m = np.linalg.norm(np.asarray(got), axis=-1)
    ref_m = np.linalg.norm(np.asarray(ref), axis=-1)
    ratio = got_m / (ref_m + 1e-12)
    assert np.median(np.abs(ratio - 1.0)) < 0.10


def test_momentum_conservation(key):
    s = init_disk(key, 500, DiskDistParams(radius=5.0))
    acc = barnes_hut_forces(s.pos, s.mass, 1.0, 0.1, 0.5, levels=4)
    net = np.asarray(jnp.sum(s.mass[:, None] * acc, axis=0))
    total = np.abs(np.asarray(s.mass[:, None] * acc)).sum(axis=0)
    # near field is exactly antisymmetric; far field approximately
    assert (np.abs(net) / (total + 1e-9)).max() < 0.05


def test_finite_and_shapes(key):
    s = init_spherical(key, 257, SphericalDistParams(radius=2.0))
    acc = barnes_hut_forces(s.pos, s.mass, 1.0, 0.1, 0.5, levels=4)
    assert acc.shape == (257, 3)
    assert bool(jnp.all(jnp.isfinite(acc)))


def test_two_clusters_attract(key):
    """Two separated clusters: net force on each points at the other —
    the far field (cluster-cluster) path is exercised."""
    k1, k2 = jax.random.split(key)
    a = init_spherical(k1, 200, SphericalDistParams(center=(-8.0, 0, 0), radius=1.0))
    b = init_spherical(k2, 200, SphericalDistParams(center=(8.0, 0, 0), radius=1.0))
    pos = jnp.concatenate([a.pos, b.pos])
    mass = jnp.concatenate([a.mass, b.mass])
    acc = np.asarray(barnes_hut_forces(pos, mass, 1.0, 0.1, 0.5, levels=4))
    assert acc[:200, 0].mean() > 0  # left cluster pulled right
    assert acc[200:, 0].mean() < 0
    # magnitude ≈ G·M/(d²) within 20%
    expected = 200.0 / (16.0**2)
    np.testing.assert_allclose(
        abs(acc[:200, 0].mean()), expected, rtol=0.2
    )
