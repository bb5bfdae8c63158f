"""Initial-condition models: particle distributions and composite scenes."""

from nbody_tpu.models.distributions import (
    init_disk,
    init_from_config,
    init_plummer,
    init_spherical,
    init_uniform,
    zero_accelerations,
    zero_velocities,
)
from nbody_tpu.models.scenes import spiral_galaxy, galaxy_collision, two_body_orbit

__all__ = [
    "init_disk",
    "init_from_config",
    "init_plummer",
    "init_spherical",
    "init_uniform",
    "zero_accelerations",
    "zero_velocities",
    "spiral_galaxy",
    "galaxy_collision",
    "two_body_orbit",
]
