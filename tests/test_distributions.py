"""Initializer tests (reference: tests/test_particle_data.cpp:40-207).

Bounds containment for every distribution under randomized parameters,
determinism by seed, zero velocities/accelerations where specified.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.models import (
    galaxy_collision,
    init_disk,
    init_plummer,
    init_spherical,
    init_uniform,
    spiral_galaxy,
    two_body_orbit,
)
from nbody_tpu.types import (
    DiskDistParams,
    PlummerDistParams,
    SphericalDistParams,
    UniformDistParams,
)

N = 2048


def test_uniform_bounds(key):
    params = UniformDistParams(
        min_bounds=(-3.0, -2.0, -1.0), max_bounds=(1.0, 2.0, 5.0),
        min_mass=0.5, max_mass=2.0,
    )
    s = init_uniform(key, N, params)
    pos = np.asarray(s.pos)
    lo, hi = np.array(params.min_bounds), np.array(params.max_bounds)
    assert (pos >= lo - 1e-6).all() and (pos <= hi + 1e-6).all()
    assert np.allclose(np.asarray(s.vel), 0.0)
    assert np.allclose(np.asarray(s.acc), 0.0)
    m = np.asarray(s.mass)
    assert (m >= 0.5).all() and (m <= 2.0).all()


@pytest.mark.parametrize("radius", [0.5, 1.0, 10.0])
def test_spherical_bounds(key, radius):
    params = SphericalDistParams(center=(1.0, -2.0, 3.0), radius=radius)
    s = init_spherical(key, N, params)
    r = np.linalg.norm(np.asarray(s.pos) - np.array(params.center), axis=-1)
    assert (r <= radius + 1e-5).all()
    assert np.allclose(np.asarray(s.vel), 0.0)
    # Volume uniformity: median radius ≈ cbrt(0.5)·R
    assert abs(np.median(r) - 0.5 ** (1 / 3) * radius) < 0.05 * radius


def test_disk_bounds_and_rotation(key):
    params = DiskDistParams(radius=5.0, thickness=0.6, rotation_speed=2.0)
    s = init_disk(key, N, params)
    pos = np.asarray(s.pos)
    r_xy = np.linalg.norm(pos[:, :2], axis=-1)
    assert (r_xy <= params.radius + 1e-5).all()
    assert (np.abs(pos[:, 2]) <= params.thickness / 2 + 1e-5).all()
    # Velocity tangential with magnitude rotation_speed·sqrt(r)
    vel = np.asarray(s.vel)
    v_mag = np.linalg.norm(vel, axis=-1)
    np.testing.assert_allclose(
        v_mag, params.rotation_speed * np.sqrt(r_xy), rtol=1e-4, atol=1e-4
    )
    radial_dot = np.sum(vel[:, :2] * pos[:, :2], axis=-1)
    assert np.abs(radial_dot).max() < 1e-3


def test_plummer_properties(key):
    params = PlummerDistParams(scale_radius=1.0, total_mass=1.0)
    s = init_plummer(key, 8192, params)
    pos = np.asarray(s.pos)
    r = np.linalg.norm(pos, axis=-1)
    assert (r <= params.scale_radius * params.max_radius_factor + 1e-4).all()
    # Half-mass radius of a Plummer sphere ≈ 1.3048·a
    half_mass_r = np.median(r)
    assert 1.0 < half_mass_r < 1.7
    # Bound: speeds below local escape velocity
    v = np.linalg.norm(np.asarray(s.vel), axis=-1)
    v_esc = np.sqrt(2.0) * (r * r + 1.0) ** -0.25
    assert (v <= v_esc + 1e-5).all()
    np.testing.assert_allclose(np.asarray(s.mass).sum(), 1.0, rtol=1e-5)


def test_determinism_by_seed():
    a = init_spherical(jax.random.PRNGKey(7), 512)
    b = init_spherical(jax.random.PRNGKey(7), 512)
    c = init_spherical(jax.random.PRNGKey(8), 512)
    assert jnp.array_equal(a.pos, b.pos)
    assert not jnp.array_equal(a.pos, c.pos)


def test_two_body_orbit_symmetry():
    s = two_body_orbit(separation=2.0, softening=0.1)
    pos = np.asarray(s.pos)
    vel = np.asarray(s.vel)
    np.testing.assert_allclose(pos[0], -pos[1])
    np.testing.assert_allclose(vel[0], -vel[1])


def test_scenes_shapes(key):
    g = spiral_galaxy(key, 1000)
    assert g.pos.shape == (1000, 3) and g.mass.shape == (1000,)
    assert bool(jnp.all(jnp.isfinite(g.pos))) and bool(jnp.all(jnp.isfinite(g.vel)))
    c = galaxy_collision(key, 999)
    assert c.pos.shape == (999, 3)
    assert bool(jnp.all(jnp.isfinite(c.vel)))
