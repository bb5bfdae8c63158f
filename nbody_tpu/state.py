"""Simulation state containers.

``ParticleState`` is the device-side state: an immutable JAX pytree of
(N, 3)/(N,) arrays. It replaces the reference's 13-array SoA ``ParticleData``
(reference: include/nbody/types.hpp:234-276) — on TPU the natural layout is
(N, 3) arrays (last dim padded/tiled by XLA) and there is no acc_old array:
the Verlet step is a pure function that threads the current acceleration
through, so persistent state is pos/vel/acc/mass only (40 B/particle vs the
reference's 52).

``SimulationState`` is the host-side snapshot used for checkpointing and
interchange (reference: include/nbody/simulation_state.hpp:10-27), with the
same tolerant equality semantics used by the round-trip property tests
(reference: src/utils/simulation_state.cpp:7-39).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.types import ForceMethod


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParticleState:
    """Device-side particle state pytree.

    Attributes:
      pos:  (N, 3) float32 positions
      vel:  (N, 3) float32 velocities
      acc:  (N, 3) float32 accelerations at the current time (a(t) is a pure
            function of x(t); kept in state so each Verlet step does exactly
            one force evaluation)
      mass: (N,)   float32 masses
      time: ()     float32 simulation time
    """

    pos: jax.Array
    vel: jax.Array
    acc: jax.Array
    mass: jax.Array
    time: jax.Array

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @staticmethod
    def zeros(n: int, dtype=jnp.float32) -> "ParticleState":
        return ParticleState(
            pos=jnp.zeros((n, 3), dtype),
            vel=jnp.zeros((n, 3), dtype),
            acc=jnp.zeros((n, 3), dtype),
            mass=jnp.ones((n,), dtype),
            time=jnp.zeros((), dtype),
        )

    def block_until_ready(self) -> "ParticleState":
        jax.block_until_ready((self.pos, self.vel, self.acc, self.mass, self.time))
        return self


@dataclasses.dataclass
class SimulationState:
    """Host-side snapshot for checkpoint/interchange.

    reference: include/nbody/simulation_state.hpp:10-27. Holds numpy arrays
    (pos/vel as (N, 3) float32, mass as (N,) float32) plus scalars. The
    checkpoint format does NOT store accelerations — resume recomputes
    forces, which is exact for Velocity Verlet (SURVEY.md §5.4).
    """

    pos: np.ndarray
    vel: np.ndarray
    mass: np.ndarray
    particle_count: int = 0
    simulation_time: float = 0.0
    dt: float = 1e-3
    G: float = 1.0
    softening: float = 0.1
    force_method: ForceMethod = ForceMethod.DIRECT_N2

    def __post_init__(self):
        self.pos = np.asarray(self.pos, dtype=np.float32).reshape(-1, 3)
        self.vel = np.asarray(self.vel, dtype=np.float32).reshape(-1, 3)
        self.mass = np.asarray(self.mass, dtype=np.float32).reshape(-1)
        if self.particle_count == 0:
            self.particle_count = self.pos.shape[0]

    # Tolerances mirror reference: src/utils/simulation_state.cpp:7-39.
    _SCALAR_TOL = 1e-6
    _ARRAY_TOL = 1e-6

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, SimulationState):
            return NotImplemented
        if self.particle_count != other.particle_count:
            return False
        if self.force_method != other.force_method:
            return False
        for a, b in (
            (self.simulation_time, other.simulation_time),
            (self.dt, other.dt),
            (self.G, other.G),
            (self.softening, other.softening),
        ):
            if abs(a - b) > self._SCALAR_TOL:
                return False
        for a, b in ((self.pos, other.pos), (self.vel, other.vel),
                     (self.mass, other.mass)):
            if a.shape != b.shape:
                return False
            if a.size and not np.allclose(a, b, atol=self._ARRAY_TOL, rtol=0):
                return False
        return True

    def __hash__(self):  # dataclass with __eq__ override
        return id(self)

    # ---- conversions ----

    def to_particle_state(
        self, acc: Optional[np.ndarray] = None
    ) -> ParticleState:
        n = self.particle_count
        acc_arr = (
            jnp.asarray(acc, jnp.float32).reshape(n, 3)
            if acc is not None
            else jnp.zeros((n, 3), jnp.float32)
        )
        return ParticleState(
            pos=jnp.asarray(self.pos, jnp.float32),
            vel=jnp.asarray(self.vel, jnp.float32),
            acc=acc_arr,
            mass=jnp.asarray(self.mass, jnp.float32),
            time=jnp.asarray(self.simulation_time, jnp.float32),
        )

    @staticmethod
    def from_particle_state(
        state: ParticleState,
        dt: float,
        G: float,
        softening: float,
        force_method: ForceMethod,
    ) -> "SimulationState":
        return SimulationState(
            pos=np.asarray(state.pos),
            vel=np.asarray(state.vel),
            mass=np.asarray(state.mass),
            particle_count=state.n,
            simulation_time=float(state.time),
            dt=dt,
            G=G,
            softening=softening,
            force_method=force_method,
        )
