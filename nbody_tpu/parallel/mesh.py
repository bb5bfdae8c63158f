"""Mesh construction and state sharding helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbody_tpu.state import ParticleState

PARTICLE_AXIS = "p"


def sharded_device_count(requested: Optional[int] = None) -> int:
    avail = len(jax.devices())
    if requested is None or requested <= 0:
        return avail
    if requested > avail:
        from nbody_tpu.errors import ValidationError

        raise ValidationError(
            f"Requested {requested} devices but only {avail} available"
        )
    return requested


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the particle axis (ICI ring on real TPU topologies)."""
    n = sharded_device_count(n_devices)
    return Mesh(np.asarray(jax.devices()[:n]), (PARTICLE_AXIS,))


def shard_state(state: ParticleState, mesh: Mesh) -> ParticleState:
    """Place the state pytree with the particle axis sharded.

    N must divide evenly by the device count (pad upstream with zero-mass
    particles if needed — zero mass exerts and receives nothing).
    """
    n_dev = mesh.devices.size
    if state.n % n_dev != 0:
        from nbody_tpu.errors import ValidationError

        raise ValidationError(
            f"Particle count {state.n} not divisible by {n_dev} devices; "
            "pad with zero-mass particles"
        )
    sharded = NamedSharding(mesh, P(PARTICLE_AXIS))
    replicated = NamedSharding(mesh, P())
    return ParticleState(
        pos=jax.device_put(state.pos, sharded),
        vel=jax.device_put(state.vel, sharded),
        acc=jax.device_put(state.acc, sharded),
        mass=jax.device_put(state.mass, sharded),
        time=jax.device_put(state.time, replicated),
    )


def pad_to_devices(state: ParticleState, n_devices: int) -> ParticleState:
    """Pad with zero-mass particles so N divides the device count."""
    import jax.numpy as jnp

    rem = state.n % n_devices
    if rem == 0:
        return state
    pad = n_devices - rem
    return ParticleState(
        pos=jnp.pad(state.pos, ((0, pad), (0, 0))),
        vel=jnp.pad(state.vel, ((0, pad), (0, 0))),
        acc=jnp.pad(state.acc, ((0, pad), (0, 0))),
        mass=jnp.pad(state.mass, (0, pad)),
        time=state.time,
    )
