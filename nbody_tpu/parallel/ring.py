"""Ring-rotated all-pairs forces over the device mesh.

The O(N²) interaction under particle sharding is a ring computation: each
device owns an i-block and rotates the j-block (positions + masses) around
the ICI ring with ``lax.ppermute``, accumulating partial accelerations —
the same schedule ring attention uses for the sequence axis (SURVEY.md
§5.7). After P−1 hops every (i, j) pair has been evaluated exactly once;
communication is P−1 block transfers fully overlapped with compute by XLA.

Single-device semantics are identical to nbody_tpu.ops.direct.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nbody_tpu.ops.direct import _pairwise_acc_block
from nbody_tpu.parallel.mesh import PARTICLE_AXIS


def ring_direct_forces(
    pos: jax.Array,
    mass: jax.Array,
    mesh: Mesh,
    G: float = 1.0,
    softening: float = 0.1,
) -> jax.Array:
    """All-pairs gravity with the particle axis sharded over ``mesh``."""
    axis = PARTICLE_AXIS
    n_dev = mesh.devices.size

    def local(pos_l, mass_l):
        # pos_l: (n/P, 3) local block
        def body(step, carry):
            acc, pj, mj = carry
            acc = acc + _pairwise_acc_block(pos_l, pj, mj, softening)
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            pj = jax.lax.ppermute(pj, axis, perm)
            mj = jax.lax.ppermute(mj, axis, perm)
            return acc, pj, mj

        acc0 = jnp.zeros_like(pos_l)
        acc, _, _ = jax.lax.fori_loop(
            0, n_dev, body, (acc0, pos_l, mass_l)
        )
        return G * acc

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )(pos, mass)
