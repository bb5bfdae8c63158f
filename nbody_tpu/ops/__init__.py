"""Compute ops: force kernels, integrator, energy."""

from nbody_tpu.ops.forces import make_force_fn
from nbody_tpu.ops.integrator import (
    kinetic_energy,
    make_verlet_step,
    potential_energy,
    total_energy,
    verlet_step,
)

__all__ = [
    "make_force_fn",
    "make_verlet_step",
    "verlet_step",
    "kinetic_energy",
    "potential_energy",
    "total_energy",
]
