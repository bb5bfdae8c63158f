"""Core enums and configuration types.

TPU-native counterpart of the reference's core type layer
(reference: include/nbody/types.hpp:60-384). Enum integer values MUST match
the reference: they are serialized as uint32 in the `.nbody` checkpoint
header (reference: include/nbody/serialization.hpp:55-65) and the two
formats are interchange-compatible.

There is no Vec3 here — on TPU, positions/velocities are (N, 3) arrays and
all vector math is batched array arithmetic.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple


class ForceMethod(enum.IntEnum):
    """Force-calculation algorithm (reference: include/nbody/types.hpp:66-70)."""

    DIRECT_N2 = 0     # exact O(N²) all-pairs
    BARNES_HUT = 1    # O(N log N) hierarchical multipole approximation
    SPATIAL_HASH = 2  # O(N) short-range with cutoff

    @classmethod
    def parse(cls, name: str) -> "ForceMethod":
        """Parse a CLI-style method name (reference: src/core/app_cli.cpp)."""
        key = name.strip().lower().replace("_", "-")
        table = {
            "direct-n2": cls.DIRECT_N2,
            "direct": cls.DIRECT_N2,
            "n2": cls.DIRECT_N2,
            "barnes-hut": cls.BARNES_HUT,
            "bh": cls.BARNES_HUT,
            "spatial-hash": cls.SPATIAL_HASH,
            "hash": cls.SPATIAL_HASH,
        }
        if key not in table:
            from nbody_tpu.errors import ValidationError

            raise ValidationError(
                f"Unknown force method: {name!r} "
                "(expected direct-n2 | barnes-hut | spatial-hash)"
            )
        return table[key]

    @property
    def cli_name(self) -> str:
        return {
            ForceMethod.DIRECT_N2: "direct-n2",
            ForceMethod.BARNES_HUT: "barnes-hut",
            ForceMethod.SPATIAL_HASH: "spatial-hash",
        }[self]


class InitDistribution(enum.IntEnum):
    """Initial particle distribution (reference: include/nbody/types.hpp:83-87)."""

    UNIFORM = 0
    SPHERICAL = 1
    DISK = 2
    # TPU-build extension (BASELINE.json configs): Plummer sphere.
    PLUMMER = 3

    @classmethod
    def parse(cls, name: str) -> "InitDistribution":
        key = name.strip().lower().replace("_", "-")
        table = {
            "uniform": cls.UNIFORM,
            "spherical": cls.SPHERICAL,
            "sphere": cls.SPHERICAL,
            "disk": cls.DISK,
            "plummer": cls.PLUMMER,
        }
        if key not in table:
            from nbody_tpu.errors import ValidationError

            raise ValidationError(f"Unknown init distribution: {name!r}")
        return table[key]


class ColorMode(enum.IntEnum):
    """Particle coloring mode (reference: include/nbody/types.hpp:97-101)."""

    DEPTH = 0
    VELOCITY = 1
    DENSITY = 2


# Hard validation cap shared with the serializer
# (reference: src/utils/error_handling.cpp:76-84, serialization.hpp:46-48).
MAX_PARTICLE_COUNT = 100_000_000


@dataclasses.dataclass(frozen=True)
class SimulationConfig:
    """Simulation configuration (reference: include/nbody/types.hpp:301-313).

    Defaults match the reference exactly. TPU-specific knobs are grouped at
    the bottom; they replace the reference's ``cuda_block_size`` concept with
    Pallas/XLA tiling and acceleration-structure capacity hints (everything
    under jit needs static shapes).
    """

    particle_count: int = 10_000
    init_distribution: InitDistribution = InitDistribution.SPHERICAL
    force_method: ForceMethod = ForceMethod.DIRECT_N2
    dt: float = 1e-3
    G: float = 1.0
    softening: float = 0.1
    barnes_hut_theta: float = 0.5
    spatial_hash_cell_size: float = 1.0
    spatial_hash_cutoff: float = 2.0
    # Kernel tile hint (i-block rows per Pallas program); analogous role to
    # the reference's cuda_block_size (validated to [1, 1024] the same way).
    block_size: int = 256

    # ---- TPU-native knobs (no reference counterpart) ----
    # RNG seed for initializers (reference uses mt19937 seed 42,
    # src/cuda/particle_init.cu:286-288; we use jax.random — same
    # determinism-by-seed property, different bitstream).
    seed: int = 42
    # Spatial hash: static max particles per cell (XLA needs static shapes;
    # overflow particles beyond this cap are dropped from neighbor lists and
    # counted in diagnostics).
    hash_max_per_cell: int = 64
    # Spatial hash: static grid resolution cap per axis.
    hash_max_grid_dim: int = 64
    # Sorted-window sweep width (0 = auto from N). Density-sensitive: audit
    # with ParticleSystem.audit_short_range() — overflow must read 0.
    hash_window: int = 0
    # Spatial hash short-range engine: "window" (sorted z-run sweeps, the
    # dense-scene engine), "tiles" (dense per-cell slot tiles on a
    # static covering grid — the sparse-scene engine; the sorted-window sweep
    # is block-span-bound at ~1 particle/cell), or "auto" (resolved from
    # the concrete particle distribution where one is available — the
    # facade resolves at initialize(); bare factories fall back to
    # "window", the density-safe default).
    hash_engine: str = "auto"
    # Tile-engine slot capacity per cell (k). Sweep cost scales with the
    # LIVE k (per-row occupancy skip), build with total k; particles
    # beyond k in a cell lose their short-range term and are audited.
    hash_tile_k: int = 8
    # Barnes-Hut multipole grid: finest level (2^level cells per axis).
    bh_max_level: int = 6
    # Multi-chip: number of devices to shard the particle axis over
    # (1 = single chip).
    shard_devices: int = 1
    # Amortized re-sort cadence for the cell-sorted engines: re-derive the
    # cell assignment every N steps inside fused multi-step runs and take
    # FROZEN-GRID steps between (ops/integrator.make_resort_multi_step).
    # 1 (the default) = re-sort every step, the reference's
    # Thrust-per-step semantics (force_barnes_hut.cu:276-280) — always
    # exact. Cadence > 1 evaluates boundary-crossing rows with a stale
    # cell assignment between re-sorts (positions/masses stay exact;
    # only the near-window center and expansion cell lag), so accuracy
    # is SCENE-DEPENDENT: fine when per-step motion ≪ one cell, and
    # measurably divergent on violent scenes (the 1M cold-collapse
    # bench crosses ~1.8% of cells per dt=1e-3 step —
    # scripts/profile_r4d.py s0). Bound it with the engines'
    # ``frozen(..., with_audit=True)`` staleness count before trusting
    # a cadence on a new scene.
    resort_every: int = 1
    # Audit-driven ADAPTIVE re-sort (ops/integrator.
    # make_adaptive_multi_step): when > 0, fused runs take frozen steps
    # until the audited stale fraction exceeds this bound (or
    # ``resort_every`` frozen steps have run, when resort_every > 1 —
    # else a 16-step cap), then re-sort. Degrades to re-sort-every-step
    # on violent scenes with zero configuration; the trigger lags the
    # audit by one step. 0 (default) = fixed-cadence behavior above.
    resort_stale_frac: float = 0.0
    # EXACT incremental re-sort (ops/table_step.
    # make_table_repair_multi_step): every step re-homes exactly the
    # rows whose cell binning changed (no staleness approximation — the
    # physics matches re-sort-every-step up to slot summation order and
    # an audited denial set), with a full rebuild only when the mover
    # count exceeds the repair capacity or ``resort_every`` (cadence
    # cap, 64 when unset) expires. Fused-tiles engines on TPU only;
    # elsewhere the flag silently falls back to the row-space paths.
    resort_repair: bool = False
    # Distribution parameters (reference: include/nbody/types.hpp:343-382
    # plumbs Uniform/Spherical/DiskDistribution structs through config).
    # One of the *DistParams dataclasses matching init_distribution, or
    # None for that distribution's defaults.
    dist_params: "object" = None

    def replace(self, **kw) -> "SimulationConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Rendering configuration (reference: include/nbody/types.hpp:323-329)."""

    window_width: int = 1280
    window_height: int = 720
    point_size: float = 2.0
    color_mode: ColorMode = ColorMode.DEPTH
    show_stats: bool = True


Vec3Like = Tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class UniformDistParams:
    """Uniform box distribution (reference: include/nbody/types.hpp:343-349)."""

    min_bounds: Vec3Like = (-10.0, -10.0, -10.0)
    max_bounds: Vec3Like = (10.0, 10.0, 10.0)
    min_mass: float = 1.0
    max_mass: float = 1.0


@dataclasses.dataclass(frozen=True)
class SphericalDistParams:
    """Uniform-in-volume sphere (reference: include/nbody/types.hpp:358-363)."""

    center: Vec3Like = (0.0, 0.0, 0.0)
    radius: float = 10.0
    min_mass: float = 1.0
    max_mass: float = 1.0


@dataclasses.dataclass(frozen=True)
class DiskDistParams:
    """Rotating disk (reference: include/nbody/types.hpp:372-382)."""

    center: Vec3Like = (0.0, 0.0, 0.0)
    radius: float = 10.0
    thickness: float = 1.0
    min_mass: float = 1.0
    max_mass: float = 1.0
    rotation_speed: float = 1.0


@dataclasses.dataclass(frozen=True)
class PlummerDistParams:
    """Plummer-sphere model (TPU-build extension, per BASELINE.json configs).

    Classic stable cluster model: density rho(r) ∝ (1 + r²/a²)^(-5/2) with
    isotropic velocity dispersion drawn from the Aarseth-Henon-Wielen
    rejection scheme.
    """

    center: Vec3Like = (0.0, 0.0, 0.0)
    scale_radius: float = 1.0
    total_mass: float = 1.0
    max_radius_factor: float = 10.0  # truncate at this many scale radii
