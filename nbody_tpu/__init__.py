"""nbody_tpu — a TPU-native million-particle N-body physics engine.

Built from scratch in JAX / XLA / Pallas with the capabilities of the
LessUp/n-body CUDA reference (see SURVEY.md): three interchangeable force
algorithms (direct O(N²) pairwise, Barnes-Hut-style hierarchical multipole,
spatial-hash short range), a fused jit-compiled Velocity Verlet integrator,
particle initializers, energy observability, versioned binary checkpointing +
HDF5 interchange, phase profiling + JSON benchmark records, a CLI with
headless benchmark mode, a host-side point-cloud renderer, and multi-chip
particle sharding over a `jax.sharding.Mesh`.

The design is TPU-first, not a port:
  * state is an immutable pytree; a simulation step is a pure function
    ``state -> state`` compiled into ONE XLA program (the reference needs
    4+ kernel launches per step, reference: src/cuda/integrator.cu:224-238);
  * force algorithms are step-function factories (strategy via closure,
    not vtable — reference: include/nbody/force_calculator.hpp:36-89);
  * hot kernels are Pallas VMEM-tiled programs;
  * multi-chip scaling uses shard_map + XLA collectives over ICI.
"""

from nbody_tpu.types import (
    ColorMode,
    DiskDistParams,
    ForceMethod,
    InitDistribution,
    PlummerDistParams,
    RenderConfig,
    SimulationConfig,
    SphericalDistParams,
    UniformDistParams,
)
from nbody_tpu.errors import (
    NBodyError,
    ResourceError,
    ValidationError,
    validate_config,
    validate_particle_count,
    validate_softening,
    validate_theta,
    validate_time_step,
)
from nbody_tpu.state import ParticleState, SimulationState
from nbody_tpu.system import ParticleSystem

__version__ = "0.1.0"

__all__ = [
    "ColorMode",
    "DiskDistParams",
    "ForceMethod",
    "InitDistribution",
    "NBodyError",
    "ParticleState",
    "ParticleSystem",
    "PlummerDistParams",
    "RenderConfig",
    "ResourceError",
    "SimulationConfig",
    "SimulationState",
    "SphericalDistParams",
    "UniformDistParams",
    "ValidationError",
    "validate_config",
    "validate_particle_count",
    "validate_softening",
    "validate_theta",
    "validate_time_step",
    "__version__",
]
