"""Composite initial-condition scenes.

TPU-native counterparts of the reference's example scenes:
  * spiral_galaxy — bulge + logarithmic arms + orbital velocities
    (reference: examples/example_custom_distribution.cpp:21-50)
  * two_body_orbit — analytic circular two-body orbit used as the
    energy-conservation fidelity gate
    (reference: examples/example_energy_conservation.cpp:91-213,
    tests/test_integrator.cpp:90-162)
  * galaxy_collision — two disk galaxies on an approach trajectory
    (BASELINE.json config #5: 4M particles sharded over v5e-8)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nbody_tpu.models.distributions import _finish, init_disk
from nbody_tpu.state import ParticleState
from nbody_tpu.types import DiskDistParams


def two_body_orbit(
    separation: float = 2.0,
    mass: float = 1.0,
    G: float = 1.0,
    softening: float = 0.0,
) -> ParticleState:
    """Two equal masses on a circular orbit about their barycenter.

    Velocity is chosen consistently with the engine's softened force law
    a_i = G·Σ m_j·(x_j − x_i)/(r² + ε²)^{3/2}, so the orbit is exactly
    circular under the discrete dynamics being tested:
    v² = G·m·d² / (2·(d² + ε²)^{3/2}).
    """
    d = separation
    v = jnp.sqrt(G * mass * d * d / (2.0 * (d * d + softening * softening) ** 1.5))
    pos = jnp.array([[-d / 2, 0.0, 0.0], [d / 2, 0.0, 0.0]], jnp.float32)
    vel = jnp.array([[0.0, -v, 0.0], [0.0, v, 0.0]], jnp.float32)
    m = jnp.array([mass, mass], jnp.float32)
    return _finish(pos, vel, m)


def spiral_galaxy(
    key: jax.Array,
    n: int,
    radius: float = 10.0,
    arms: int = 2,
    arm_tightness: float = 0.5,
    bulge_fraction: float = 0.2,
    thickness: float = 0.5,
    rotation_speed: float = 1.0,
    center=(0.0, 0.0, 0.0),
    bulk_velocity=(0.0, 0.0, 0.0),
) -> ParticleState:
    """Spiral galaxy: central bulge + logarithmic spiral arms with
    Keplerian-like orbital velocities (reference:
    examples/example_custom_distribution.cpp:21-50, re-designed as a single
    vectorized jax.random draw)."""
    kb, kr, ka, ks, kz, km = jax.random.split(key, 6)
    n_bulge = int(n * bulge_fraction)
    n_arms = n - n_bulge

    # Bulge: dense uniform ball at 15% radius.
    u = jax.random.uniform(kb, (n_bulge, 3), jnp.float32, -1.0, 1.0)
    norm = jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-9
    rad = jnp.cbrt(jax.random.uniform(km, (n_bulge, 1), jnp.float32))
    bulge_pos = u / norm * rad * (0.15 * radius)

    # Arms: r ~ sqrt(u)·R, theta = arm phase + log-spiral wind + scatter.
    r = jnp.sqrt(jax.random.uniform(kr, (n_arms,), jnp.float32)) * radius
    arm_id = jax.random.randint(ka, (n_arms,), 0, arms)
    base = arm_id.astype(jnp.float32) * (2.0 * jnp.pi / arms)
    wind = jnp.log1p(r / (arm_tightness * radius)) / arm_tightness
    scatter = jax.random.normal(ks, (n_arms,), jnp.float32) * 0.15
    theta = base + wind + scatter
    z = jax.random.normal(kz, (n_arms,), jnp.float32) * (thickness * 0.5)
    arm_pos = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1)

    pos = jnp.concatenate([bulge_pos, arm_pos], axis=0)
    # Orbital velocity for every particle: v = rotation_speed·sqrt(r_xy),
    # tangential (same law as the reference disk, particle_init.cu:350-353).
    r_xy = jnp.linalg.norm(pos[:, :2], axis=-1) + 1e-6
    v = rotation_speed * jnp.sqrt(r_xy)
    tang = jnp.stack(
        [-pos[:, 1] / r_xy, pos[:, 0] / r_xy, jnp.zeros_like(r_xy)], axis=-1
    )
    vel = v[:, None] * tang + jnp.asarray(bulk_velocity, jnp.float32)
    mass = jnp.ones((n,), jnp.float32)
    return _finish(pos + jnp.asarray(center, jnp.float32), vel, mass)


def galaxy_collision(
    key: jax.Array,
    n: int,
    separation: float = 30.0,
    approach_speed: float = 0.5,
    radius: float = 10.0,
) -> ParticleState:
    """Two rotating disks on a collision course (BASELINE.json config #5)."""
    k1, k2 = jax.random.split(key)
    n1 = n // 2
    n2 = n - n1
    g1 = init_disk(
        k1, n1, DiskDistParams(center=(-separation / 2, 0.0, 0.0), radius=radius)
    )
    g2 = init_disk(
        k2, n2, DiskDistParams(center=(separation / 2, 0.0, 2.0), radius=radius)
    )
    vel1 = g1.vel + jnp.array([approach_speed, 0.0, 0.0], jnp.float32)
    vel2 = g2.vel + jnp.array([-approach_speed, 0.0, 0.0], jnp.float32)
    return _finish(
        jnp.concatenate([g1.pos, g2.pos]),
        jnp.concatenate([vel1, vel2]),
        jnp.concatenate([g1.mass, g2.mass]),
    )
