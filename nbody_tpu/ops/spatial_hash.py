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


def spatial_hash_forces_tiles(
    pos: jax.Array,
    mass: jax.Array,
    G: float = 1.0,
    softening: float = 0.1,
    *,
    cutoff: float = 2.0,
    cell_size: float = 1.0,
    d: int = 64,
    k: int = 8,
    build_window: int | None = None,
    return_overflow: bool = False,
    impl: str | None = None,
    sorted_output: bool = False,
):
    """Sparse-regime short-range engine: dense per-cell slot tiles.

    Same pair predicate as the window engine (cutoff² on the RAW r²
    before softening, 3×3×3 neighbor cells — reference
    force_spatial_hash.cu:83-152) but a different acceleration structure:
    a (d³, k) slot tensor on a STATIC d-per-axis grid, swept by the
    Barnes-Hut tile kernel (ops/pallas_tile_near.py) with its per-row
    occupancy skip. At ~1 particle/cell the sorted-window engine is
    block-span-bound (~2700 tests per target against ~27 real
    neighbors); here the sweep cost tracks the LIVE occupancy instead.

    Particles beyond ``k`` in a cell (including bbox-clamp pile-ups when
    the box outgrows d·cell_size) lose their short-range term and are
    counted in the overflow audit — the same graceful-degradation
    contract as the window engine's capacity caps.
    """
    if impl is None:
        from nbody_tpu.ops.barnes_hut import resolve_impl

        impl = resolve_impl("NBODY_PALLAS_NEAR")
    return _spatial_hash_forces_tiles(
        pos, mass, G, softening,
        cutoff=cutoff, cell_size=cell_size, d=d, k=k,
        build_window=build_window,
        return_overflow=return_overflow, impl=impl,
        sorted_output=sorted_output,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "G", "softening", "cutoff", "cell_size", "d", "k", "build_window",
        "return_overflow", "impl", "sorted_output",
    ),
)
def _spatial_hash_forces_tiles(
    pos, mass, G, softening, *, cutoff, cell_size, d, k, build_window,
    return_overflow, impl, sorted_output,
):
    from nbody_tpu.ops.tile_sweep import tile_near_field

    lo = jnp.min(pos, axis=0)
    coords = jnp.clip(
        jnp.floor((pos - lo) / cell_size).astype(jnp.int32), 0, d - 1
    )
    acc, overflow = tile_near_field(
        pos, mass, coords, lo, jnp.asarray(cell_size, pos.dtype),
        d=d, ws=1, k=k, G=G, eps=softening, impl=impl,
        cutoff2=float(cutoff) * float(cutoff),
        sorted_output=sorted_output, build_window=build_window,
    )
    if return_overflow:
        return acc, overflow
    return acc


def spatial_hash_forces_tiles_sorted(
    pos, mass, G=1.0, softening=0.1, *,
    cutoff=2.0, cell_size=1.0, d=64, k=8, build_window=None, impl=None,
    extra=None, with_grid_meta=False,
):
    """Sorted-pipeline hash-tiles forces → ``(acc_sorted, psort, order)``,
    or ``(acc_sorted, psort, order, extra_sorted)`` when ``extra`` (N, E)
    f32 payload rides the engine's sort gather (free: width-insensitive
    row gathers); ``with_grid_meta=True`` appends a ``FrozenGridMeta``
    so callers can take FROZEN-GRID steps between re-sorts
    (``spatial_hash_forces_tiles_frozen``).

    The same physics as ``spatial_hash_forces_tiles`` but outputs stay in
    the engine's internal CELL-SORTED row order (the contract of
    ops/integrator.make_sorted_multi_step — see
    ops/barnes_hut.barnes_hut_forces_sorted): steps in sorted order skip
    the per-step unsort gather.
    """
    if impl is None:
        from nbody_tpu.ops.barnes_hut import resolve_impl

        impl = resolve_impl("NBODY_PALLAS_NEAR")
    if impl == "xla" and with_grid_meta:
        impl = "pallas_interpret"
    return _spatial_hash_tiles_sorted(
        pos, mass, G, softening, cutoff=cutoff, cell_size=cell_size,
        d=d, k=k, build_window=build_window, impl=impl, extra=extra,
        with_grid_meta=with_grid_meta,
    )


@functools.partial(
    jax.jit,
    static_argnames=("G", "softening", "cutoff", "cell_size", "d", "k",
                     "build_window", "impl", "with_grid_meta"),
)
def _spatial_hash_tiles_sorted(
    pos, mass, G, softening, *, cutoff, cell_size, d, k, build_window, impl,
    extra=None, with_grid_meta=False,
):
    from nbody_tpu.ops.sorted_window import FrozenGridMeta, build_sorted_grid
    from nbody_tpu.ops.tile_sweep import (
        tile_build_pallas,
        tile_engine_fused,
        tile_near_field,
        tile_sweep_pick,
    )

    lo = jnp.min(pos, axis=0)
    coords = jnp.clip(
        jnp.floor((pos - lo) / cell_size).astype(jnp.int32), 0, d - 1
    )

    def ids_sorted_fn(psort, lo=lo):
        # same binning as `coords`, on the same bits (8-col payload rule,
        # build_sorted_grid.ids_sorted_fn)
        cs = jnp.clip(
            jnp.floor((psort[:, :3] - lo) / cell_size).astype(jnp.int32),
            0, d - 1,
        )
        return (cs[:, 0] * d + cs[:, 1]) * d + cs[:, 2]

    # Light build: the tiles engine needs no per-cell segment index
    # (scripts/profile_r3p.py — the full d³ index + rank gather cost
    # ~15 ms at 1M vs ~2.5 ms for sorted_ranks + searchsorted starts)
    # and no per-row cell coords.
    wide = extra is not None and extra.shape[-1] + 5 > 8
    grid = build_sorted_grid(
        pos, mass, coords, d, with_cell_start=False, extra=extra,
        with_csort=False,
        ids_sorted_fn=ids_sorted_fn if wide and not with_grid_meta else None,
        # Meta producers must not carry ids as an f32 bitcast column —
        # TPU denormal-flush hazard, see build_sorted_grid's docstring
        # and ops/barnes_hut._barnes_hut_forces (scripts/profile_r4c.py).
        ids_via_gather=with_grid_meta,
    )
    if with_grid_meta:
        # Frozen-grid contract needs the build's rank — run the two fused
        # phases directly (the same calls tile_near_field makes on the
        # Pallas fast path, which this contract requires).
        if not tile_engine_fused(d, k, impl):
            raise ValueError(
                "with_grid_meta (frozen-grid stepping) requires the fused "
                f"tiles path (d={d}, k={k}, impl={impl!r})"
            )
        cell = jnp.asarray(cell_size, pos.dtype)
        tb = tile_build_pallas(
            grid, lo, cell, d=d, k=k, impl=impl, build_window=build_window,
        )
        acc = tile_sweep_pick(
            tb, grid, lo, cell, d=d, ws=1, k=k, G=G, eps=softening,
            impl=impl, sorted_output=True,
            cutoff2=float(cutoff) * float(cutoff),
        )
        # grid.ids is int32-native here (ids_via_gather above): the meta
        # shares the engine's own ids/rank — frozen(fresh meta) is the
        # same pipeline bit for bit.
        meta = FrozenGridMeta(
            ids=grid.ids, rank=tb.rank_sorted, lo=lo, cell=cell,
        )
        out = [acc, grid.psort, grid.order]
        if extra is not None:
            out.append(grid.extra)
        out.append(meta)
        return tuple(out)
    acc, _over = tile_near_field(
        pos, mass, coords, lo, jnp.asarray(cell_size, pos.dtype),
        d=d, ws=1, k=k, G=G, eps=softening, grid=grid, impl=impl,
        cutoff2=float(cutoff) * float(cutoff), sorted_output=True,
        build_window=build_window,
    )
    if extra is not None:
        return acc, grid.psort, grid.order, grid.extra
    return acc, grid.psort, grid.order


def spatial_hash_forces_tiles_frozen(
    psort, meta, G=1.0, softening=0.1, *,
    cutoff=2.0, cell_size=1.0, d=64, k=8, build_window=None, impl=None,
    with_audit=False,
):
    """Hash-tiles forces on a FROZEN cell assignment — the stale-sort
    step of the amortized re-sort cadence (see
    ops/barnes_hut.barnes_hut_forces_frozen for the contract and error
    class; ops/integrator.make_resort_multi_step for the stepping loop).
    ``psort`` (N, 4) rows in the last re-sort's order, ``meta`` from
    ``spatial_hash_forces_tiles_sorted(..., with_grid_meta=True)``.
    Returns ``acc_sorted`` or ``(acc_sorted, n_stale)``.
    """
    if impl is None:
        from nbody_tpu.ops.barnes_hut import resolve_impl

        impl = resolve_impl("NBODY_PALLAS_NEAR")
    if impl == "xla":
        impl = "pallas_interpret"
    return _spatial_hash_tiles_frozen(
        psort, meta, G, softening, cutoff=cutoff, cell_size=cell_size,
        d=d, k=k, build_window=build_window, impl=impl,
        with_audit=with_audit,
    )


@functools.partial(
    jax.jit,
    static_argnames=("G", "softening", "cutoff", "cell_size", "d", "k",
                     "build_window", "impl", "with_audit"),
)
def _spatial_hash_tiles_frozen(
    psort, meta, G, softening, *, cutoff, cell_size, d, k, build_window,
    impl, with_audit,
):
    from nbody_tpu.ops.sorted_window import SortedGrid
    from nbody_tpu.ops.tile_sweep import (
        tile_build_pallas,
        tile_engine_fused,
        tile_sweep_pick,
    )

    if not tile_engine_fused(d, k, impl):
        raise ValueError(
            "frozen-grid stepping requires the fused tiles path "
            f"(d={d}, k={k}, impl={impl!r})"
        )
    grid = SortedGrid(
        order=meta.ids,  # unused under sorted_output=True (placeholder)
        psort=psort, csort=None, ids=meta.ids, cell_start=None,
    )
    tb = tile_build_pallas(
        grid, meta.lo, meta.cell, d=d, k=k, impl=impl,
        build_window=build_window, rank_sorted=meta.rank,
    )
    acc = tile_sweep_pick(
        tb, grid, meta.lo, meta.cell, d=d, ws=1, k=k, G=G, eps=softening,
        impl=impl, sorted_output=True,
        cutoff2=float(cutoff) * float(cutoff),
    )
    if not with_audit:
        return acc
    cs = jnp.clip(
        jnp.floor((psort[:, :3] - meta.lo) / cell_size).astype(jnp.int32),
        0, d - 1,
    )
    ids_now = (cs[:, 0] * d + cs[:, 1]) * d + cs[:, 2]
    return acc, jnp.sum((ids_now != meta.ids).astype(jnp.int32))


def spatial_hash_forces_window_sorted(
    pos, mass, G=1.0, softening=0.1, *,
    cutoff=2.0, cell_size=1.0, cap=64, window=2048, block_size=256,
    impl=None, extra=None,
):
    """Sorted-pipeline WINDOW-engine forces → ``(acc_sorted, psort,
    order[, extra_sorted])`` — the dense-regime counterpart of
    ``spatial_hash_forces_tiles_sorted`` (same physics as
    ``spatial_hash_forces``, outputs in the engine's CELL-SORTED row
    order per the ops/integrator.make_sorted_multi_step contract)."""
    if impl is None:
        from nbody_tpu.ops.barnes_hut import resolve_impl

        impl = resolve_impl("NBODY_PALLAS_WINDOW")
    return _spatial_hash_window_sorted(
        pos, mass, G, softening, cutoff=cutoff, cell_size=cell_size,
        cap=cap, window=window, block_size=block_size, impl=impl,
        extra=extra,
    )


@functools.partial(
    jax.jit,
    static_argnames=("G", "softening", "cutoff", "cell_size", "cap",
                     "window", "block_size", "impl"),
)
def _spatial_hash_window_sorted(
    pos, mass, G, softening, *, cutoff, cell_size, cap, window,
    block_size, impl, extra=None,
):
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

    def ids_sorted_fn(psort, lo=lo, dims=dims):
        # same binning as `coords`, on the same bits (8-col payload rule,
        # build_sorted_grid.ids_sorted_fn)
        cs = jnp.clip(
            jnp.floor((psort[:, :3] - lo) / cell_size).astype(jnp.int32),
            0, dims - 1,
        )
        return (cs[:, 0] * cap + cs[:, 1]) * cap + cs[:, 2]

    wide = extra is not None and extra.shape[-1] + 5 > 8
    grid = build_sorted_grid(
        pos, mass, coords, cap, extra=extra,
        ids_sorted_fn=ids_sorted_fn if wide else None,
    )
    acc, _over = window_sweep(
        grid, d=cap, xy_offsets=xy_ball(1), z_halfwidth=1,
        window=window, block_size=block_size,
        eps=softening, cutoff2=cutoff * cutoff, impl=impl,
        sorted_output=True,
    )
    if extra is not None:
        return G * acc, grid.psort, grid.order, grid.extra
    return G * acc, grid.psort, grid.order


def make_spatial_hash_forces_sorted(
    config: SimulationConfig, pos_hint=None
):
    """Sorted-pipeline strategy factory — both engines step in sorted
    order (tiles natively; the window engine via
    ``spatial_hash_forces_window_sorted``)."""
    p = hash_engine_params(config, pos_hint)
    G = config.G
    eps = config.softening
    cutoff = config.spatial_hash_cutoff
    cell = config.spatial_hash_cell_size
    if p["engine"] == "tiles":
        tile_d, tile_k, bw = p["tile_d"], p["tile_k"], p["build_window"]

        def sorted_force_fn(pos, mass, extra=None):
            return spatial_hash_forces_tiles_sorted(
                pos, mass, G, eps, cutoff=cutoff, cell_size=cell,
                d=tile_d, k=tile_k, build_window=bw, extra=extra,
            )

        # Frozen-grid contract (ops/integrator.make_resort_multi_step)
        # — only on the fused tiles path.
        from nbody_tpu.ops.barnes_hut import resolve_impl
        from nbody_tpu.ops.tile_sweep import tile_engine_fused

        impl = resolve_impl("NBODY_PALLAS_NEAR")
        if impl == "xla":
            impl = "pallas_interpret"
        if tile_engine_fused(tile_d, tile_k, impl):

            def with_meta(pos, mass):
                return spatial_hash_forces_tiles_sorted(
                    pos, mass, G, eps, cutoff=cutoff, cell_size=cell,
                    d=tile_d, k=tile_k, build_window=bw,
                    with_grid_meta=True, impl=impl,
                )

            def frozen(psort, meta, with_audit=False):
                return _spatial_hash_tiles_frozen(
                    psort, meta, G, eps, cutoff=cutoff, cell_size=cell,
                    d=tile_d, k=tile_k, build_window=bw, impl=impl,
                    with_audit=with_audit,
                )

            sorted_force_fn.with_meta = with_meta
            sorted_force_fn.frozen = frozen

    else:
        cap = config.hash_max_grid_dim
        window, block = p["window"], p["block"]

        def sorted_force_fn(pos, mass, extra=None):
            return spatial_hash_forces_window_sorted(
                pos, mass, G, eps, cutoff=cutoff, cell_size=cell,
                cap=cap, window=window, block_size=block, extra=extra,
            )

    sorted_force_fn.engine_params = p
    # Integrator payload uses the separate (N, 4) gather here too: the
    # routed form's −2.3 ms (scripts/profile_r3w2.py) was measured on a
    # d=64/k=8 toy config; on the REAL probe-selected engine (d=56,
    # k=16, 1M sparse) routing REGRESSES 4.4 ms/step
    # (scripts/profile_r3y.py y0 35.05 vs y1 39.44 ms). Same verdict as
    # Barnes-Hut. The routed path stays available (route_extra=True)
    # and equivalence-tested for configs where it measures faster.
    sorted_force_fn.route_extra = False
    return sorted_force_fn


def hash_engine_params(config: SimulationConfig, pos=None) -> dict:
    """Engine selection for a config — the SINGLE source of truth shared
    by ``make_spatial_hash_forces`` and ``ParticleSystem.audit_short_range``
    (same contract as ops/barnes_hut.bh_engine_params).

    Hash grid dims are bbox-dependent, so — unlike Barnes-Hut, whose
    occupancy is static in the level count — "auto" needs concrete
    particle positions to resolve. Pass ``pos`` (any array-like; pulled
    to host once, outside jit) to enable the density probe; without it
    "auto" falls back to the window engine, the density-safe default.

    Returns a dict with engine ("window"/"tiles"), window, block,
    tile_d, tile_k.
    """
    import math

    import numpy as np

    engine = config.hash_engine
    window, block = hash_window_defaults(config)
    k = config.hash_tile_k
    tile_d = config.hash_max_grid_dim  # fallback when no probe ran
    build_window = None  # tile-build source window (None = engine default)
    occupancy = None
    if pos is not None:
        p = np.asarray(pos)
        lo = p.min(axis=0)
        ext = float((p.max(axis=0) - lo).max())
        cell = config.spatial_hash_cell_size
        need_d = max(4, int(math.ceil(ext / cell + 1e-6)) + 1)
        # Smallest multiple-of-8 grid covering the box (multiples of 8
        # keep d³·k chunk-divisible by 1024; non-pow2 d is fine — the
        # scatter kernel decodes cells with constant div/mod). Feasible
        # while one-hot dest ids stay f32-exact (d³·k ≤ 2²⁴,
        # pallas_scatter SENTINEL contract).
        d = -(-need_d // 8) * 8
        while d > 8 and d * d * d * max(k, 8) >= (1 << 24):
            d -= 8
        tile_d = d
        covers = d >= need_d
        coords = np.clip(
            np.floor((p - lo) / cell).astype(np.int64), 0, d - 1
        )
        ids = (coords[:, 0] * d + coords[:, 1]) * d + coords[:, 2]
        occupied = len(np.unique(ids))
        occupancy = p.shape[0] / max(occupied, 1)
        # Slot capacity from the measured occupancy (k ≈ 2·occ, multiple
        # of 8): the sweep's per-row group skip makes unused tail groups
        # cheap outside dense pockets, and the overflow audit counts any
        # residual Poisson-tail drops (the same graceful-degradation
        # contract as the Barnes-Hut near k).
        k = int(min(32, max(k, -(-int(2.0 * occupancy) // 8) * 8)))
        if d * d * d * k >= (1 << 24):
            k = max(8, ((1 << 24) - 1) // (d * d * d) // 8 * 8)
        # Tile-build window from the measured density: a scatter chunk
        # spans g·d cells (tile_near_field's z-column chunk rule) whose
        # sorted rows span ~cells·occ; 1.25× headroom + the 128-align
        # slack (the Barnes-Hut engine's measured-safe margin at occ
        # 7.3). MXU pass count scales with w; chunks denser than w take
        # the kernel's second-window pass (exact to 2w) and anything
        # beyond 2w is counted into the overflow audit (never silent).
        g = 128 // math.gcd(d * k, 128)
        q_cells = g * d
        need = q_cells * occupancy * 1.25 + 128
        build_window = int(min(1024, max(256, -(-need // 128) * 128)))
        if engine == "auto":
            # Tiles win while the k ≈ 2·occ slot cap is affordable
            # (k ≤ 32 ⇔ occ ≲ 16); beyond that the slot grid both
            # overflows and loses its padding advantage — and the grid
            # must actually cover the box (a clamped grid piles the
            # boundary into overflowing edge cells).
            engine = (
                "tiles" if covers and occupancy <= 16.0 else "window"
            )
    if engine == "auto":
        engine = "window"
    return {
        "engine": engine,
        "window": window,
        "block": block,
        "tile_d": tile_d,
        "tile_k": k,
        "build_window": build_window,
        "occupancy": occupancy,
    }


def make_spatial_hash_forces(config: SimulationConfig, pos_hint=None):
    """Strategy factory (reference: SpatialHashCalculator,
    force_spatial_hash.cu:364-377). ``pos_hint`` (optional concrete
    positions) lets ``hash_engine=auto`` resolve from the measured
    density — the facade passes its live state here."""
    G = config.G
    eps = config.softening
    cutoff = config.spatial_hash_cutoff
    cell = config.spatial_hash_cell_size
    cap = config.hash_max_grid_dim
    p = hash_engine_params(config, pos_hint)

    if p["engine"] == "tiles":
        tile_d, tile_k, bw = p["tile_d"], p["tile_k"], p["build_window"]

        def force_fn(pos, mass):
            return spatial_hash_forces_tiles(
                pos,
                mass,
                G,
                eps,
                cutoff=cutoff,
                cell_size=cell,
                d=tile_d,
                k=tile_k,
                build_window=bw,
            )

    else:
        window, block = p["window"], p["block"]

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

    # Audit contract: ParticleSystem.audit_short_range reads the RESOLVED
    # engine params off the live closure, so the audit always measures
    # the configuration this force_fn actually runs.
    force_fn.engine_params = p
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
