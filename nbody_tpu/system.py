"""ParticleSystem facade — the orchestrator.

TPU-native counterpart of the reference facade
(reference: include/nbody/particle_system.hpp:93-422,
src/core/particle_system.cpp:40-342). Same lifecycle and API surface:
validate → initialize → compute initial forces; ``update()`` = one Verlet
step; pause/resume/reset; runtime setters that re-route into the live
strategy (here: rebuilding the jitted step closure instead of dynamic_cast
into a vtable object, particle_system.cpp:173-207); state get/set/save/load;
energy queries.

Like the reference, instances are not thread-safe
(particle_system.hpp:37-53). Unlike the reference there is no GL interop to
refresh per step — the renderer pulls snapshots through
``nbody_tpu.render.stream`` instead.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from nbody_tpu.errors import ValidationError, validate_config
from nbody_tpu.models.distributions import init_from_config
from nbody_tpu.ops.forces import make_force_fn
from nbody_tpu.ops.integrator import (
    initialize_forces,
    kinetic_energy,
    make_verlet_step,
    potential_energy,
)
from nbody_tpu.state import ParticleState, SimulationState
from nbody_tpu.types import ForceMethod, SimulationConfig
from nbody_tpu.utils.profiling import profile_phase
from nbody_tpu.utils.serialization import Serializer


class ParticleSystem:
    """Simulation facade (reference: particle_system.hpp:93-422)."""

    def __init__(self):
        self._config: Optional[SimulationConfig] = None
        self._state: Optional[ParticleState] = None
        self._force_fn = None
        self._step = None
        # jitted multi-step programs keyed by n_steps (bounded; alternating
        # chunk sizes — e.g. render cadence vs benchmark cadence — must not
        # recompile every call)
        self._multi_cache: dict = {}
        self._paused = False
        self._initialized = False
        # Multi-device execution (config.shard_devices > 1): the mesh the
        # particle axis is sharded over, and the LOGICAL particle count
        # (the state may carry zero-mass padding rows so N divides the
        # device count — every public accessor reports/slices logical N).
        self._mesh = None
        self._n_logical: Optional[int] = None

    # ---- lifecycle -------------------------------------------------------

    def initialize(self, config: SimulationConfig) -> None:
        """Validate config, build state + strategy, compute initial forces
        (reference: particle_system.cpp:40-100). When
        ``config.shard_devices > 1`` the state is padded to the device
        count with zero-mass particles (inert: they exert nothing and
        carry no energy), sharded over a 1-D mesh, and every step/energy
        path runs SPMD (parallel/step.py) — the multi-chip seam the
        single-GPU reference never had (its strategy construction,
        particle_system.cpp:85, is the analogous build point)."""
        validate_config(config)
        from nbody_tpu.errors import validate_resource_requirements

        validate_resource_requirements(config.particle_count)
        self._config = config
        state = init_from_config(config)
        self._install_state(state)
        self._paused = False
        self._initialized = True

    def _install_state(self, state: ParticleState) -> None:
        """Shard (if configured) + build strategy + compute a(t)."""
        self._n_logical = state.n
        if self._config.shard_devices > 1:
            from nbody_tpu.parallel.mesh import (
                make_mesh,
                pad_to_devices,
                shard_state,
            )

            self._mesh = make_mesh(self._config.shard_devices)
            state = pad_to_devices(state, self._config.shard_devices)
            state = shard_state(state, self._mesh)
        else:
            self._mesh = None
        self._rebuild_strategy(pos_hint=state.pos)
        self._state = jax.jit(
            lambda s: initialize_forces(s, self._force_fn)
        )(state)

    @property
    def mesh(self):
        """The device mesh when running sharded, else None."""
        return self._mesh

    @property
    def is_sharded(self) -> bool:
        return self._mesh is not None

    def _require_init(self):
        if not self._initialized:
            raise ValidationError("ParticleSystem is not initialized")

    def _rebuild_strategy(self, pos_hint=None):
        """Rebuild force closure + jitted step for the current config.

        ``pos_hint`` (concrete positions) feeds data-dependent engine
        auto-selection (hash window-vs-tiles); live setters pass the
        current state so ``hash_engine=auto`` re-resolves on rebuild.
        Sharded systems rebuild the SPMD force/step instead.
        """
        if pos_hint is None and self._state is not None:
            pos_hint = self._state.pos
        if self._mesh is not None:
            from nbody_tpu.parallel.step import make_sharded_force_fn

            self._force_fn = make_sharded_force_fn(
                self._config, self._mesh, pos_hint=pos_hint
            )
        else:
            self._force_fn = make_force_fn(self._config, pos_hint=pos_hint)
        self._step = jax.jit(make_verlet_step(self._force_fn, self._config.dt))
        self._multi_cache = {}

    # ---- stepping --------------------------------------------------------

    def update(self, dt: Optional[float] = None) -> None:
        """One Velocity Verlet step; no-op while paused
        (reference: particle_system.cpp:115-127)."""
        self._require_init()
        if self._paused:
            return
        with profile_phase("simulation.update"):
            if dt is not None and dt != self._config.dt:
                self.set_time_step(dt)
            self._state = self._step(self._state)

    def run_steps(self, n_steps: int) -> None:
        """``n_steps`` Verlet steps fused into ONE device program — the
        scale path for benchmark/headless runs (one dispatch instead of
        n; through the TPU tunnel a dispatch costs ~250 ms, so per-step
        ``update()`` loops are dispatch-bound). Uses sorted-state
        stepping when the live engine has the contract
        (ops/integrator.make_sorted_multi_step — the same path bench.py
        measures); physics is gated equivalent to repeated ``update()``
        by tests. No-op while paused. The jitted program is cached per
        (strategy, n_steps) — prefer one chunk size across calls.
        """
        self._require_init()
        if self._paused or n_steps <= 0:
            return
        with profile_phase("simulation.run_steps"):
            if n_steps not in self._multi_cache:
                if self._mesh is not None:
                    from nbody_tpu.parallel.step import (
                        make_sharded_multi_step,
                    )

                    multi = make_sharded_multi_step(
                        self._config, self._mesh, n_steps,
                        pos_hint=self._state.pos,
                    )
                else:
                    from nbody_tpu.ops.forces import make_sorted_force_fn
                    from nbody_tpu.ops.integrator import (
                        make_multi_step,
                        make_resort_multi_step,
                        make_sorted_multi_step,
                    )

                    sorted_force = make_sorted_force_fn(
                        self._config, pos_hint=self._state.pos
                    )
                    cadence = self._config.resort_every
                    stale_frac = self._config.resort_stale_frac
                    repair = self._config.resort_repair
                    table_p = None
                    if repair or stale_frac > 0.0 or cadence > 1:
                        # Table-resident stepping: frozen steps never
                        # leave the sweep kernel's slot layout (no sort,
                        # no placement, no pickup — ops/table_step.py).
                        # Strictly dominates the row-space cadence
                        # machinery where it applies; same audit and
                        # cadence semantics.
                        from nbody_tpu.ops.forces import (
                            make_table_step_params,
                        )

                        table_p = make_table_step_params(
                            self._config, pos_hint=self._state.pos
                        )
                    if sorted_force is None and table_p is None:
                        multi = make_multi_step(
                            self._force_fn, self._config.dt, n_steps
                        )
                    elif table_p is not None and repair:
                        from nbody_tpu.ops.table_step import (
                            make_table_repair_multi_step,
                        )

                        multi = make_table_repair_multi_step(
                            table_p, self._config.dt, n_steps,
                            max_cadence=cadence if cadence > 1 else 64,
                        )
                    elif table_p is not None and stale_frac > 0.0:
                        from nbody_tpu.ops.table_step import (
                            make_table_adaptive_multi_step,
                        )

                        multi = make_table_adaptive_multi_step(
                            table_p, self._config.dt, n_steps,
                            max_stale_frac=stale_frac,
                            max_cadence=cadence if cadence > 1 else 16,
                        )
                    elif table_p is not None:
                        from nbody_tpu.ops.table_step import (
                            make_table_multi_step,
                        )

                        multi = make_table_multi_step(
                            table_p, self._config.dt, n_steps, cadence
                        )
                    elif sorted_force is None:
                        multi = make_multi_step(
                            self._force_fn, self._config.dt, n_steps
                        )
                    elif (
                        stale_frac > 0.0
                        and hasattr(sorted_force, "frozen")
                        and self._state.n < (1 << 24)
                    ):
                        # Audit-driven adaptive re-sort: frozen steps
                        # while the measured stale fraction allows, the
                        # fixed cadence as the cap (16 when unset).
                        from nbody_tpu.ops.integrator import (
                            make_adaptive_multi_step,
                        )

                        multi = make_adaptive_multi_step(
                            sorted_force, self._config.dt, n_steps,
                            max_stale_frac=stale_frac,
                            max_cadence=cadence if cadence > 1 else 16,
                        )
                    elif (
                        cadence > 1
                        and hasattr(sorted_force, "frozen")
                        and self._state.n < (1 << 24)
                    ):
                        # Amortized re-sort: frozen-grid steps between
                        # re-sorts (ops/integrator.make_resort_multi_step;
                        # falls back to every-step sorting when the engine
                        # has no frozen contract or N overflows the exact
                        # float row tag).
                        multi = make_resort_multi_step(
                            sorted_force, self._config.dt, n_steps, cadence
                        )
                    else:
                        multi = make_sorted_multi_step(
                            sorted_force, self._config.dt, n_steps
                        )
                    multi = jax.jit(multi)
                if len(self._multi_cache) >= 8:  # bounded: evict oldest
                    self._multi_cache.pop(next(iter(self._multi_cache)))
                self._multi_cache[n_steps] = multi
            self._state = self._multi_cache[n_steps](self._state)

    def pause(self) -> None:
        self._require_init()
        self._paused = True

    def resume(self) -> None:
        self._require_init()
        self._paused = False

    @property
    def is_paused(self) -> bool:
        return self._paused

    def reset(self) -> None:
        """Re-initialize particles from the stored config
        (reference: particle_system.cpp reset path)."""
        self._require_init()
        self.initialize(self._config)

    # ---- runtime setters (reference: particle_system.cpp:137-207) --------

    def set_force_method(self, method: ForceMethod) -> None:
        self._require_init()
        self._config = self._config.replace(force_method=method)
        validate_config(self._config)
        self._rebuild_strategy()
        # Recompute forces so the next step uses the new strategy's a(t).
        self._state = initialize_forces(self._state, self._force_fn)

    def set_time_step(self, dt: float) -> None:
        self._require_init()
        cfg = self._config.replace(dt=float(dt))
        validate_config(cfg)
        self._config = cfg
        self._step = jax.jit(make_verlet_step(self._force_fn, dt))
        self._multi_cache = {}

    def _set_param(self, **kw) -> None:
        self._require_init()
        cfg = self._config.replace(**kw)
        validate_config(cfg)
        self._config = cfg
        self._rebuild_strategy()

    def set_gravitational_constant(self, G: float) -> None:
        from nbody_tpu.errors import validate_gravitational_constant

        validate_gravitational_constant(G)
        self._set_param(G=float(G))

    def set_softening(self, eps: float) -> None:
        from nbody_tpu.errors import validate_softening

        validate_softening(eps)
        self._set_param(softening=float(eps))

    def set_theta(self, theta: float) -> None:
        from nbody_tpu.errors import validate_theta

        # Validated regardless of the active method, matching the
        # reference's setter (particle_system.cpp:173-207).
        validate_theta(theta)
        self._set_param(barnes_hut_theta=float(theta))

    def set_cell_size(self, cell_size: float) -> None:
        if not (cell_size > 0):
            raise ValidationError("Spatial hash cell size must be positive")
        self._set_param(spatial_hash_cell_size=float(cell_size))

    def set_cutoff(self, cutoff: float) -> None:
        if not (cutoff > 0):
            raise ValidationError("Spatial hash cutoff must be positive")
        self._set_param(spatial_hash_cutoff=float(cutoff))

    # ---- accessors -------------------------------------------------------

    @property
    def config(self) -> SimulationConfig:
        self._require_init()
        return self._config

    @property
    def particle_count(self) -> int:
        """LOGICAL particle count (excludes zero-mass sharding padding)."""
        self._require_init()
        return self._n_logical if self._n_logical is not None else self._state.n

    def _logical_state(self) -> ParticleState:
        """State trimmed to the logical particle rows (drops zero-mass
        sharding padding; a no-op view when running single-device)."""
        s = self._state
        n = self.particle_count
        if s.n == n:
            return s
        return ParticleState(
            pos=s.pos[:n], vel=s.vel[:n], acc=s.acc[:n], mass=s.mass[:n],
            time=s.time,
        )

    @property
    def simulation_time(self) -> float:
        self._require_init()
        return float(self._state.time)

    @property
    def state(self) -> ParticleState:
        """Device-side state pytree (read-only by convention)."""
        self._require_init()
        return self._state

    def positions(self) -> np.ndarray:
        self._require_init()
        return np.asarray(self._logical_state().pos)

    def velocities(self) -> np.ndarray:
        self._require_init()
        return np.asarray(self._logical_state().vel)

    # ---- state snapshot / checkpoint (reference: cpp:213-302) -------------

    def get_state(self) -> SimulationState:
        self._require_init()
        return SimulationState.from_particle_state(
            self._logical_state(),
            dt=self._config.dt,
            G=self._config.G,
            softening=self._config.softening,
            force_method=self._config.force_method,
        )

    def set_state(self, snapshot: SimulationState) -> None:
        """Full re-init semantics: validate → rebuild strategy for the
        snapshot's parameters → recompute forces
        (reference: particle_system.cpp:240-292)."""
        from nbody_tpu.errors import validate_particle_count

        validate_particle_count(snapshot.particle_count)
        base = self._config if self._config is not None else SimulationConfig()
        self._config = base.replace(
            particle_count=snapshot.particle_count,
            dt=snapshot.dt,
            G=snapshot.G,
            softening=snapshot.softening,
            force_method=snapshot.force_method,
        )
        validate_config(self._config)
        self._install_state(snapshot.to_particle_state())
        self._initialized = True

    def save_state(self, filename: str) -> None:
        """reference: particle_system.cpp:294-297."""
        Serializer.save(filename, self.get_state())

    def load_state(self, filename: str) -> None:
        """reference: particle_system.cpp:299-302."""
        self.set_state(Serializer.load(filename))

    # ---- energy observability (reference: cpp:304-318) --------------------

    def compute_kinetic_energy(self) -> float:
        self._require_init()
        if self._mesh is not None:
            ke, _ = self._sharded_energy()
            return ke
        return float(kinetic_energy(self._state))

    def compute_potential_energy(self) -> float:
        self._require_init()
        if self._mesh is not None:
            _, pe = self._sharded_energy()
            return pe
        return float(
            potential_energy(
                self._state.pos,
                self._state.mass,
                self._config.G,
                self._config.softening,
            )
        )

    def _sharded_energy(self) -> tuple:
        """(KE, PE) via the SPMD ring reduction (parallel/step.py) —
        zero-mass padding rows carry no energy by construction."""
        from nbody_tpu.parallel.step import sharded_energy

        ke, pe = sharded_energy(
            self._state,
            self._mesh,
            self._config.G,
            self._config.softening,
        )
        return float(ke), float(pe)

    def compute_total_energy(self) -> float:
        if self._mesh is not None:
            ke, pe = self._sharded_energy()
            return ke + pe
        return self.compute_kinetic_energy() + self.compute_potential_energy()

    def block_until_ready(self) -> None:
        """Synchronize outstanding device work (bench/timing helper)."""
        self._require_init()
        self._state.block_until_ready()

    def audit_short_range(self) -> dict:
        """Audit the active short-range acceleration structure.

        Returns capacity-overflow counters (pairs/slots the static-shape
        engines could not hold). Non-zero overflow means forces are being
        dropped — raise ``hash_window`` / ``hash_max_per_cell`` (hash) or
        lower ``bh_max_level`` / raise the near K (Barnes-Hut). Plays the
        role of the reference's verifyCellAssignment/verifyMassConservation
        audits (force_spatial_hash.cu:336-362, barnes_hut_tree.hpp:50-54).
        """
        self._require_init()
        cfg = self._config
        # Audit the LOGICAL rows with the single-device engines. On a
        # sharded system the state is pulled to host arrays first: the
        # sorted engines are NOT GSPMD-safe (the bitcast+gather hazard,
        # parallel/step.make_sharded_force_fn) — feeding them sharded
        # arrays would produce a wrong count.
        state = self._logical_state()
        if self._mesh is not None:
            state = jax.device_get(state)
        out = {"method": cfg.force_method.cli_name, "overflow": 0}
        if cfg.force_method == ForceMethod.SPATIAL_HASH:
            from nbody_tpu.ops.spatial_hash import (
                hash_engine_params,
                spatial_hash_forces,
                spatial_hash_forces_tiles,
            )

            # Audit the configuration production actually runs: the
            # factory attached its RESOLVED params to the live closure
            # (auto-resolution is data-dependent, so re-resolving here
            # could disagree after the distribution evolved).
            p = getattr(self._force_fn, "engine_params", None)
            if p is None:
                p = hash_engine_params(cfg, state.pos)
            if p["engine"] == "tiles":
                _, overflow = spatial_hash_forces_tiles(
                    state.pos,
                    state.mass,
                    cfg.G,
                    cfg.softening,
                    cutoff=cfg.spatial_hash_cutoff,
                    cell_size=cfg.spatial_hash_cell_size,
                    d=p["tile_d"],
                    k=p["tile_k"],
                    build_window=p.get("build_window"),
                    return_overflow=True,
                )
                out["tile_d"] = p["tile_d"]
                out["tile_k"] = p["tile_k"]
            else:
                _, overflow = spatial_hash_forces(
                    state.pos,
                    state.mass,
                    cfg.G,
                    cfg.softening,
                    cutoff=cfg.spatial_hash_cutoff,
                    cell_size=cfg.spatial_hash_cell_size,
                    cap=cfg.hash_max_grid_dim,
                    window=p["window"],
                    block_size=p["block"],
                    return_overflow=True,
                )
                out["window"] = p["window"]
            out["overflow"] = int(overflow)
            out["engine"] = p["engine"]
        elif cfg.force_method == ForceMethod.BARNES_HUT:
            import jax.numpy as jnp

            from nbody_tpu.ops.barnes_hut import (
                _near_field,
                bh_engine_params,
                build_pyramid,
            )
            from nbody_tpu.ops.tile_sweep import tile_near_field

            # The SAME engine-selection helper the force factory uses —
            # the audit measures the configuration production runs, never
            # an independently-recomputed one (see bh_engine_params).
            p = bh_engine_params(cfg)
            levels, ws = p["levels"], p["ws"]
            d = 1 << levels
            pyr = build_pyramid(state.pos, state.mass, levels)
            if p["near_engine"] == "tiles":
                coords = jnp.clip(
                    ((state.pos - pyr.lo) / pyr.cell).astype(jnp.int32),
                    0,
                    d - 1,
                )
                _, overflow = tile_near_field(
                    state.pos,
                    state.mass,
                    coords,
                    pyr.lo,
                    pyr.cell,
                    d=d,
                    ws=ws,
                    k=p["near_k"],
                    G=cfg.G,
                    eps=cfg.softening,
                )
                out["near_k"] = p["near_k"]
            else:
                _, overflow, _ = _near_field(
                    state.pos,
                    state.mass,
                    pyr.lo,
                    pyr.cell,
                    cfg.G,
                    cfg.softening,
                    ws,
                    levels,
                    p["window"],
                )
                out["window"] = p["window"]
            out["overflow"] = int(overflow)
            out["near_engine"] = p["near_engine"]
        return out

    def diagnostics(self) -> dict:
        """Runtime diagnostics (reference: --diagnostics surface,
        src/main.cpp + the memory estimates of error_handling.cpp:25-44)."""
        self._require_init()
        from nbody_tpu.errors import STATE_BYTES_PER_PARTICLE

        n = self.particle_count
        return {
            "particle_count": n,
            "shard_devices": (
                self._mesh.devices.size if self._mesh is not None else 1
            ),
            # Which distributed strategy the sharded force selected
            # ("ring"/"tree-slabs"/"hash-slabs"/"replicated-fallback";
            # parallel/step.make_sharded_force_fn) — "replicated-fallback"
            # means exact but O(N·devices) redundant compute, no scaling.
            "force_distribution": getattr(
                self._force_fn, "distribution",
                "single-device" if self._mesh is None else "unknown",
            ),
            "force_method": self._config.force_method.cli_name,
            "simulation_time": float(self._state.time),
            "paused": self._paused,
            "dt": self._config.dt,
            "G": self._config.G,
            "softening": self._config.softening,
            "state_bytes": n * STATE_BYTES_PER_PARTICLE,
            "backend": jax.default_backend(),
            "devices": len(jax.devices()),
        }
