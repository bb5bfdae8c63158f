"""Particle initializers.

TPU-native counterpart of the reference's dual CPU/GPU initializer component
(reference: src/cuda/particle_init.cu:9-102 GPU/cuRAND path,
285-357 CPU/mt19937 path). On TPU there is no dual path: `jax.random` is a
counter-based, order-independent PRNG, so ONE jit-compiled implementation is
deterministic by seed on every backend (the reference's determinism-by-seed
property, without its CPU/GPU divergence).

All initializers return a fully-formed `ParticleState` with zero
accelerations (matching zeroAccelerations semantics,
reference: particle_init.cu:369-377).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nbody_tpu.state import ParticleState
from nbody_tpu.types import (
    DiskDistParams,
    InitDistribution,
    PlummerDistParams,
    SimulationConfig,
    SphericalDistParams,
    UniformDistParams,
)


def _mass(key: jax.Array, n: int, min_mass: float, max_mass: float) -> jax.Array:
    if min_mass == max_mass:
        return jnp.full((n,), min_mass, jnp.float32)
    return jax.random.uniform(key, (n,), jnp.float32, min_mass, max_mass)


def _finish(pos, vel, mass, time=0.0) -> ParticleState:
    return ParticleState(
        pos=pos.astype(jnp.float32),
        vel=vel.astype(jnp.float32),
        acc=jnp.zeros_like(pos, jnp.float32),
        mass=mass.astype(jnp.float32),
        time=jnp.asarray(time, jnp.float32),
    )


@functools.partial(jax.jit, static_argnums=(1, 2))
def init_uniform(
    key: jax.Array, n: int, params: UniformDistParams = UniformDistParams()
) -> ParticleState:
    """Uniform box: positions ~ U[min_bounds, max_bounds], v = 0
    (reference: particle_init.cu:290-308)."""
    kp, km = jax.random.split(key)
    lo = jnp.asarray(params.min_bounds, jnp.float32)
    hi = jnp.asarray(params.max_bounds, jnp.float32)
    pos = jax.random.uniform(kp, (n, 3), jnp.float32) * (hi - lo) + lo
    vel = jnp.zeros((n, 3), jnp.float32)
    return _finish(pos, vel, _mass(km, n, params.min_mass, params.max_mass))


@functools.partial(jax.jit, static_argnums=(1, 2))
def init_spherical(
    key: jax.Array, n: int, params: SphericalDistParams = SphericalDistParams()
) -> ParticleState:
    """Uniform-in-volume sphere: r = cbrt(u)·R, isotropic angles, v = 0
    (reference: particle_init.cu:311-332)."""
    kr, kt, kp, km = jax.random.split(key, 4)
    u = jax.random.uniform(kr, (n,), jnp.float32)
    r = jnp.cbrt(u) * params.radius
    theta = jax.random.uniform(kt, (n,), jnp.float32) * (2.0 * jnp.pi)
    cos_phi = jax.random.uniform(kp, (n,), jnp.float32) * 2.0 - 1.0
    sin_phi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_phi * cos_phi))
    center = jnp.asarray(params.center, jnp.float32)
    pos = center + r[:, None] * jnp.stack(
        [sin_phi * jnp.cos(theta), sin_phi * jnp.sin(theta), cos_phi], axis=-1
    )
    vel = jnp.zeros((n, 3), jnp.float32)
    return _finish(pos, vel, _mass(km, n, params.min_mass, params.max_mass))


@functools.partial(jax.jit, static_argnums=(1, 2))
def init_disk(
    key: jax.Array, n: int, params: DiskDistParams = DiskDistParams()
) -> ParticleState:
    """Rotating disk: r = sqrt(u)·R (uniform surface density), tangential
    velocity v = rotation_speed·sqrt(r) (reference: particle_init.cu:334-358)."""
    kr, kt, kz, km = jax.random.split(key, 4)
    r = jnp.sqrt(jax.random.uniform(kr, (n,), jnp.float32)) * params.radius
    theta = jax.random.uniform(kt, (n,), jnp.float32) * (2.0 * jnp.pi)
    z = (jax.random.uniform(kz, (n,), jnp.float32) - 0.5) * params.thickness
    center = jnp.asarray(params.center, jnp.float32)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    pos = center + jnp.stack([r * ct, r * st, z], axis=-1)
    v = params.rotation_speed * jnp.sqrt(r)
    vel = jnp.stack([-v * st, v * ct, jnp.zeros_like(v)], axis=-1)
    return _finish(pos, vel, _mass(km, n, params.min_mass, params.max_mass))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def init_plummer(
    key: jax.Array,
    n: int,
    params: PlummerDistParams = PlummerDistParams(),
    G: float = 1.0,
) -> ParticleState:
    """Plummer sphere with self-consistent isotropic velocities.

    TPU-build extension (BASELINE.json configs; no reference counterpart).
    Radius from inverse-CDF r = a·(u^{-2/3} − 1)^{-1/2}; speeds from the
    Aarseth-Henon-Wielen distribution, implemented rejection-free via a
    fixed 32-candidate vectorized draw per particle (XLA-friendly: static
    shapes, no data-dependent loop).
    """
    kr, ka, kv, kva, km, kq = jax.random.split(key, 6)
    a = params.scale_radius
    u = jax.random.uniform(kr, (n,), jnp.float32, 1e-6, 1.0)
    r = a / jnp.sqrt(u ** (-2.0 / 3.0) - 1.0)
    r = jnp.minimum(r, a * params.max_radius_factor)

    def iso_dirs(key, n):
        kt, kp = jax.random.split(key)
        cos_phi = jax.random.uniform(kt, (n,), jnp.float32) * 2.0 - 1.0
        sin_phi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_phi**2))
        th = jax.random.uniform(kp, (n,), jnp.float32) * (2 * jnp.pi)
        return jnp.stack(
            [sin_phi * jnp.cos(th), sin_phi * jnp.sin(th), cos_phi], axis=-1
        )

    center = jnp.asarray(params.center, jnp.float32)
    pos = center + r[:, None] * iso_dirs(ka, n)

    # Escape velocity at r; speed fraction q ∈ [0,1] with pdf ∝ q²(1-q²)^3.5.
    # Vectorized rejection: draw K candidates per particle, take the first
    # accepted (acceptance rate ≈ 0.1/0.0927 bound → K=32 fails < 1e-15).
    v_esc = jnp.sqrt(2.0 * G * params.total_mass) * (r * r + a * a) ** (-0.25)
    K = 32
    q = jax.random.uniform(kq, (n, K), jnp.float32)
    y = jax.random.uniform(kv, (n, K), jnp.float32) * 0.1
    accept = y < q * q * (1.0 - q * q) ** 3.5
    # index of first acceptance (falls back to candidate 0 if none)
    first = jnp.argmax(accept, axis=1)
    q_sel = jnp.where(
        jnp.any(accept, axis=1), q[jnp.arange(n), first], 0.5
    )
    vel = (q_sel * v_esc)[:, None] * iso_dirs(kva, n)

    mass = jnp.full((n,), params.total_mass / n, jnp.float32)
    del km
    return _finish(pos, vel, mass)


def zero_velocities(state: ParticleState) -> ParticleState:
    """reference: particle_init.cu:361-367."""
    import dataclasses

    return dataclasses.replace(state, vel=jnp.zeros_like(state.vel))


def zero_accelerations(state: ParticleState) -> ParticleState:
    """reference: particle_init.cu:369-377."""
    import dataclasses

    return dataclasses.replace(state, acc=jnp.zeros_like(state.acc))


_PARAM_TYPES = {
    InitDistribution.UNIFORM: UniformDistParams,
    InitDistribution.SPHERICAL: SphericalDistParams,
    InitDistribution.DISK: DiskDistParams,
    InitDistribution.PLUMMER: PlummerDistParams,
}


def init_from_config(config: SimulationConfig) -> ParticleState:
    """Dispatch on config.init_distribution, honoring config.dist_params
    (reference: src/core/particle_system.cpp:55-82 dispatch;
    include/nbody/types.hpp:343-382 param structs)."""
    from nbody_tpu.errors import ValidationError

    key = jax.random.PRNGKey(config.seed)
    n = config.particle_count
    dist = config.init_distribution
    if dist not in _PARAM_TYPES:
        raise ValidationError(f"Unknown init distribution: {dist}")
    want = _PARAM_TYPES[dist]
    params = config.dist_params if config.dist_params is not None else want()
    if not isinstance(params, want):
        raise ValidationError(
            f"dist_params type {type(params).__name__} does not match "
            f"init distribution {dist.name} (expected {want.__name__})"
        )
    if dist == InitDistribution.UNIFORM:
        return init_uniform(key, n, params)
    if dist == InitDistribution.SPHERICAL:
        return init_spherical(key, n, params)
    if dist == InitDistribution.DISK:
        return init_disk(key, n, params)
    return init_plummer(key, n, params, G=config.G)
