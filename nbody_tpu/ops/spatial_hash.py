"""Spatial-hash short-range forces — O(N) with cutoff.

TPU-native counterpart of the reference's spatial hash pipeline
(reference: src/cuda/force_spatial_hash.cu:28-152, 235-303,
include/nbody/spatial_hash_grid.hpp:9-59). The reference builds per-cell
particle lists with atomicAdd histogram + Thrust exclusive_scan + counting-
sort scatter, then each thread sweeps its 3×3×3 neighbor cells.

The TPU redesign keeps the same physics but is static-shape, sort-based and
fully on-device (the reference syncs the bbox to the host every step,
force_spatial_hash.cu:244-255 — here bbox stays on device):

  1. bbox via min/max reductions (no host sync);
  2. grid dims from cell_size, clamped to a static per-axis cap
     (``hash_max_grid_dim``; plays the role of the reference's 100M-cell
     cap, force_spatial_hash.cu:244-255);
  3. cell ids with STATIC strides (cap-based) so shapes are static;
  4. one ``argsort`` by cell id = the counting sort (replaces histogram +
     scan + scatter: a sort is the canonical XLA-friendly form);
  5. segment boundaries via vectorized ``searchsorted`` over all cell ids
     (replaces cell_start/cell_end kernels);
  6. force pass: blocked per-particle sweep of the 27 neighbor cells, each
     contributing up to K=``hash_max_per_cell`` sorted-adjacent candidates
     (static shapes; overflow beyond K is counted, see ``GridData``).

Physics matches the reference kernel (force_spatial_hash.cu:83-152):
cutoff² test on the RAW squared distance BEFORE softening is added, same
softened force law, self-pair skipped. Like the reference, the sweep covers
exactly the 3×3×3 neighbor cells — pairs within the cutoff but farther than
one cell are not found (short-range approximation by design; choose
cell_size ≥ cutoff for exactness).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from nbody_tpu.types import SimulationConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridData:
    """On-device acceleration structure (reference: spatial_hash_grid.hpp:9-59).

    Attributes:
      order:       (N,) permutation sorting particles by cell id
      cell_ids:    (N,) cell id per ORIGINAL particle index
      sorted_ids:  (N,) cell id per sorted slot
      cell_start:  (C,) first sorted slot of each cell (C = cap³ static)
      cell_count:  (C,) particles in each cell
      dims:        (3,) dynamic grid dims (values ≤ cap)
      lo:          (3,) bbox lower corner
      overflow:    ()   number of neighbor-list slots lost to the K cap
                   (0 ⇒ the force pass saw every in-cell candidate)
    """

    order: jax.Array
    cell_ids: jax.Array
    sorted_ids: jax.Array
    cell_start: jax.Array
    cell_count: jax.Array
    dims: jax.Array
    lo: jax.Array
    overflow: jax.Array


def cell_index(coords: jax.Array, cap: int) -> jax.Array:
    """Row-major cell id with STATIC strides (static shapes under jit).
    reference analogue: getCellIndex (force_spatial_hash.cu:14-19)."""
    return (coords[..., 0] * cap + coords[..., 1]) * cap + coords[..., 2]


@functools.partial(jax.jit, static_argnames=("cell_size", "cap", "max_per_cell"))
def build_spatial_grid(
    pos: jax.Array,
    *,
    cell_size: float,
    cap: int = 64,
    max_per_cell: int = 64,
) -> GridData:
    """Build the sorted-grid structure (reference: force_spatial_hash.cu:235-303)."""
    n = pos.shape[0]
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    dims = jnp.clip(
        jnp.ceil((hi - lo) / cell_size).astype(jnp.int32), 1, cap
    )
    coords = jnp.clip(
        jnp.floor((pos - lo) / cell_size).astype(jnp.int32), 0, dims - 1
    )
    ids = cell_index(coords, cap)

    order = jnp.argsort(ids)
    sorted_ids = ids[order]

    num_cells = cap * cap * cap
    queries = jnp.arange(num_cells, dtype=sorted_ids.dtype)
    cell_start = jnp.searchsorted(sorted_ids, queries, side="left").astype(
        jnp.int32
    )
    cell_end = jnp.searchsorted(sorted_ids, queries, side="right").astype(
        jnp.int32
    )
    cell_count = cell_end - cell_start
    overflow = jnp.sum(jnp.maximum(cell_count - max_per_cell, 0))

    return GridData(
        order=order.astype(jnp.int32),
        cell_ids=ids.astype(jnp.int32),
        sorted_ids=sorted_ids.astype(jnp.int32),
        cell_start=cell_start,
        cell_count=cell_count,
        dims=dims,
        lo=lo,
        overflow=overflow,
    )


def spatial_hash_forces(
    pos: jax.Array,
    mass: jax.Array,
    G: float = 1.0,
    softening: float = 0.1,
    *,
    cutoff: float = 2.0,
    cell_size: float = 1.0,
    cap: int = 64,
    window: int = 2048,
    block_size: int = 256,
    return_overflow: bool = False,
    impl: str | None = None,
) -> jax.Array:
    """Short-range forces with cutoff (reference: force_spatial_hash.cu:83-152).

    Hot path is the gather-free sorted-window sweep (see
    nbody_tpu/ops/sorted_window.py): 9 xy-offsets × contiguous z-run
    windows, cutoff tested on the raw squared distance BEFORE softening is
    added, self pairs skipped — the same pair predicate as the reference
    kernel (force_spatial_hash.cu:120-139). ``impl`` is the kernel switch
    ("pallas"/"pallas_interpret"/"xla"); None resolves NBODY_PALLAS_WINDOW
    + backend here, outside jit.
    """
    if impl is None:
        from nbody_tpu.ops.barnes_hut import resolve_impl

        impl = resolve_impl("NBODY_PALLAS_WINDOW")
    return _spatial_hash_forces(
        pos, mass, G, softening,
        cutoff=cutoff, cell_size=cell_size, cap=cap, window=window,
        block_size=block_size, return_overflow=return_overflow, impl=impl,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "G",
        "softening",
        "cutoff",
        "cell_size",
        "cap",
        "window",
        "block_size",
        "return_overflow",
        "impl",
    ),
)
def _spatial_hash_forces(
    pos: jax.Array,
    mass: jax.Array,
    G: float,
    softening: float,
    *,
    cutoff: float,
    cell_size: float,
    cap: int,
    window: int,
    block_size: int,
    return_overflow: bool,
    impl: str,
) -> jax.Array:
    from nbody_tpu.ops.sorted_window import (
        build_sorted_grid,
        window_sweep,
        xy_ball,
    )

    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    dims = jnp.clip(jnp.ceil((hi - lo) / cell_size).astype(jnp.int32), 1, cap)
    coords = jnp.clip(
        jnp.floor((pos - lo) / cell_size).astype(jnp.int32), 0, dims - 1
    )
    grid = build_sorted_grid(pos, mass, coords, cap)

    acc, overflow = window_sweep(
        grid,
        d=cap,
        xy_offsets=xy_ball(1),
        z_halfwidth=1,
        window=window,
        block_size=block_size,
        eps=softening,
        cutoff2=cutoff * cutoff,
        impl=impl,
    )
    if return_overflow:
        return G * acc, overflow
    return G * acc


def make_spatial_hash_forces(config: SimulationConfig):
    """Strategy factory (reference: SpatialHashCalculator,
    force_spatial_hash.cu:364-377)."""
    G = config.G
    eps = config.softening
    cutoff = config.spatial_hash_cutoff
    cell = config.spatial_hash_cell_size
    cap = config.hash_max_grid_dim
    window, block = hash_window_defaults(config)

    def force_fn(pos, mass):
        return spatial_hash_forces(
            pos,
            mass,
            G,
            eps,
            cutoff=cutoff,
            cell_size=cell,
            cap=cap,
            window=window,
            block_size=block,
        )

    return force_fn


def hash_window_defaults(config: SimulationConfig):
    """(window, block) for the sorted-window sweep.

    The window must cover a target block plus the neighbor z-runs — a
    DENSITY-dependent quantity. The auto defaults are correctness-first
    (measured overflow 0 for the reference's default scene at each scale)
    and r2-retuned for the Pallas sweep: at ≤100K, (window 1024, block
    128) audits 0 and is 1.5× faster than (2048, 256); at 1M the dense
    core needs the full 2048 (1024/1280 drop 150-290K pair-windows).
    Tighter windows MUST be validated with
    ``ParticleSystem.audit_short_range()``.
    """
    if config.hash_window > 0:
        window = config.hash_window
        block = 512 if window >= 1536 else 256
        return window, block
    n = config.particle_count
    return (1024, 128) if n <= 150_000 else (2048, 256)


# ---------------------------------------------------------------------------
# Verification helpers (reference: verifyCellAssignment,
# force_spatial_hash.cu:336-362 — host-side audit used by tests)
# ---------------------------------------------------------------------------


def verify_cell_assignment(pos, grid: GridData, cap: int) -> bool:
    """Every particle appears in exactly one cell and all N are covered."""
    import numpy as np

    n = pos.shape[0]
    order = np.asarray(grid.order)
    start = np.asarray(grid.cell_start)
    count = np.asarray(grid.cell_count)
    ids = np.asarray(grid.cell_ids)

    if sorted(order.tolist()) != list(range(n)):
        return False
    covered = np.zeros(n, dtype=bool)
    for c in np.unique(ids):
        s, cnt = start[c], count[c]
        members = order[s : s + cnt]
        if covered[members].any():
            return False
        covered[members] = True
        if not (ids[members] == c).all():
            return False
    return bool(covered.all())
