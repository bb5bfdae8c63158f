"""Sorted-window sweep engine for short-range pair interactions.

Shared machinery for the spatial-hash force and the Barnes-Hut near field.

Motivation (measured on TPU v5e): XLA random gathers run at ~1e8
elements/s, so a gather-per-candidate neighbor sweep at 1M particles costs
tens of seconds. This engine is gather-free on the hot path:

  1. Sort particles by row-major cell id (x major, z fastest). All
     particles of any contiguous z-run of cells are then CONTIGUOUS in the
     sorted arrays.
  2. For a block of B consecutive sorted targets and a fixed (dx, dy)
     xy-offset, every source the block needs lives in one contiguous window
     of the sorted array (the neighbor column's z-run). The window is a
     ``dynamic_slice`` — a linear DMA, not a gather.
  3. Pair validity is decided by exact cell-coordinate equality against the
     sliced coordinate window (sx == tx+dx ∧ sy == ty+dy ∧ |sz − tz| ≤ hw),
     so a misplaced window can only MISS pairs, never double count; misses
     are counted in ``overflow`` (raise ``window`` until it reads 0).

This replaces the reference's per-cell lists + 27-cell SIMT sweep
(reference: src/cuda/force_spatial_hash.cu:52-152) with dense VPU tiles,
and is the XLA staging form of the eventual Pallas kernel (dynamic_slice →
double-buffered DMA with scalar prefetch).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SortedGrid:
    """Cell-sorted particle arrays + segment index.

    order:      (N,) sort permutation (original → sorted is order[i])
    psort:      (N, 4) x, y, z, mass in sorted order
    csort:      (N, 3) int32 cell coords in sorted order, or None when
                built with ``with_csort=False`` (the fused tile engines
                never read per-row cell coords — skipping the div/mod
                derivation saves ~1 ms of 1M-row int passes per step)
    ids:        (N,) int32 linear cell ids in sorted order (non-decreasing;
                the sort key — carried so consumers skip re-deriving it
                from csort, ~2 ms of 1M-row int passes per step)
    cell_start: (C + 1,) first sorted index of each linear cell id
                (monotone; empty cells point at the next occupied one;
                sentinel n at the end)
    extra:      (N, E) caller payload rows riding the SAME sort gather
                (row gathers are width-insensitive — extra columns are
                free), or None. The sorted-state integrator ships its
                half-kicked velocity + row tag here, deleting its own
                per-step 1M-row gather.
    """

    order: jax.Array
    psort: jax.Array
    csort: jax.Array | None
    ids: jax.Array
    cell_start: jax.Array | None
    extra: jax.Array | None = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrozenGridMeta:
    """Everything a cell-sorted engine derives from its sort, cached so
    FROZEN-GRID steps (ops/integrator.make_resort_multi_step) can skip
    the per-step argsort + payload gather entirely.

    When per-step motion is ≪ one cell, the cell sort is near-identity
    across consecutive steps and re-deriving it (argsort 8.8 ms at 1M +
    payload gather) is wasted work. A frozen step reuses the LAST
    re-sort's cell assignment: positions/masses are exact, only the
    cell MEMBERSHIP of boundary-crossing rows is stale, so the error is
    scene-dependent — audit it per scene (the violent 1M cold-collapse
    bench crosses ~1.8% of cells per dt=1e-3 step and wants cadence 1;
    scripts/profile_r4d.py s0). The reference re-sorts every step
    (Thrust, force_barnes_hut.cu:276-280); the amortized cadence is a
    TPU-build extension.

    Registered as a pytree so it can ride ``lax.scan`` carries.

    PRODUCERS BEWARE: the producing program must not carry sorted ids as
    an f32-bitcast payload column AT ALL — build its grid with
    ``build_sorted_grid(..., ids_via_gather=True)``. Small int bit
    patterns are f32 DENORMALS under the bitcast and the TPU backend
    flushes them to zero, both when that column is output from a jit
    (fetched all-zero, scripts/profile_r4b.py v0 pre-fix) and when an
    int32 gather with the same index operand merely coexists in the
    program (the gathers unify and even IN-PROGRAM consumers read zeros:
    rank collapsed to arange at 1M, scripts/profile_r4c.py a1/a4; the
    related GSPMD reshard flush is pinned in tests/test_parallel.py).

    ids:        (N,) i32 non-decreasing linear cell ids (sorted order)
    rank:       (N,) i32 rank within the cell run (frozen with ids)
    lo:         (3,) grid origin AT THE LAST RE-SORT (frozen binning)
    cell:       (3,) or scalar cell size
    cell_start: (C+1,) i32 per-cell segment index, or None (only the
                window engine consumes it; derived from ids — frozen)
    csort:      (N, 3) i32 per-row cell coords, or None (window engine)
    """

    ids: jax.Array
    rank: jax.Array
    lo: jax.Array
    cell: jax.Array
    cell_start: jax.Array | None = None
    csort: jax.Array | None = None


def unsort_rows(rows_sorted: jax.Array, order: jax.Array) -> jax.Array:
    """Undo a sort permutation on row data — as a GATHER, not a scatter.

    ``zeros.at[order].set(rows)`` and ``rows[argsort(order)]`` are the same
    permutation, but on TPU a 1M-row scatter costs ~50 ms while argsort +
    row gather costs ~13 ms (scripts/profile_build.py): XLA scatters are
    descriptor-serialized far harder than gathers.
    """
    return rows_sorted[jnp.argsort(order)]


def build_sorted_grid(
    pos: jax.Array,
    mass: jax.Array,
    coords: jax.Array,
    d: int,
    with_cell_start: bool = True,
    extra: jax.Array | None = None,
    with_csort: bool = True,
    ids_sorted_fn=None,
    ids_via_gather: bool = True,
) -> SortedGrid:
    """Counting sort by cell id (the XLA form of the reference's histogram +
    exclusive_scan + scatter pipeline, force_spatial_hash.cu:52-80).

    MEASURED DEAD END (r3, recorded so it stays dead): replacing the
    argsort + packed-payload-gather below with ONE multi-operand
    ``lax.sort`` carrying every payload column microbenches FASTER in
    isolation (5.7 vs 9.5 ms at 1M, profile_r3v v1/v1b) but regresses
    EVERY integrated cell (1M BH 27.0 → 21.2 steps/s, 1M dense hash
    9.5 → 3.5, 100K hash 132 → 92 — /tmp batch3 vs batch2): six
    operands ride the full sorting network's data movement and the
    per-column outputs force downstream relayouts that the isolated
    checksum consumer hid. The argsort + ONE wide row gather stays.

    ``with_cell_start=False`` skips the full per-cell segment index (a
    1M-row scatter-min + d³ cummin): worthwhile only for LARGE grids
    (see ``use_full_cell_start`` — at d ≤ 64 the full build is measured
    FASTER than the ``sorted_ranks`` cummax + ``cell_starts_at``
    searchsorted that replace it). The WINDOW engine indexes cell_start
    per cell and always needs the eager build.

    ``ids_sorted_fn(psort) -> (N,) i32`` — when given, the cell-id
    column is DROPPED from the sort payload and the sorted ids are
    recomputed from the sorted positions instead. This keeps the payload
    at ≤ 8 columns when a 4-column ``extra`` rides along: TPU row
    gathers are width-insensitive only up to 8 columns — a 9-wide
    payload drags every downstream slice through retiling copies,
    measured +6.8 ms at 1M (scripts/profile_r3w.py w1 vs w1c; the
    +15.7 ms r3t finding was this cliff, not the extra itself).

    The recomputation is the same binning formula on the same position
    bits, but XLA may fuse the two sites differently (FMA/reciprocal
    selection), so a row balancing EXACTLY on an f32 rounding edge can
    re-bin to a neighbor cell (measured: max |acc diff| 1e-2 on a
    handful of 1M rows, scripts/profile_r3w2.py). A raw disagreement
    would break the engines' monotone-dest contract and serve that row
    a filler slot, so the recomputed ids are CLAMPED MONOTONE with a
    running max: a divergent row degrades to a one-cell-late assignment
    (it still interacts with real neighbors through its real position —
    the same error class as the binning's own boundary ties), never a
    dropped or phantom row. Use only where the integrated win is
    measured: the d64/k8 toy hash config gained ~2.3 ms/step at 1M
    (r3w2 w2/w3), but BOTH production engines measure FASTER with the
    bitcast id column + separate payload gather (Barnes-Hut +7.7
    ms/step through this route, r3w2 w0/w1; the real d56/k16 hash
    engine +4.4 ms/step, profile_r3y y0/y1) — so no production factory
    currently routes through it.

    ``ids_via_gather=True`` (the DEFAULT since round 5) — no bitcast
    column; the sorted ids come from an INDEPENDENT int32 gather
    ``ids[order]`` (bit-exact, no monotone clamp needed, ~3 ms at 1M).
    The legacy bitcast column (``ids_via_gather=False``, kept for A/B
    archaeology only) is UNSAFE on TPU: small int bit patterns are f32
    DENORMALS under the bitcast, and the TPU backend flushes them —
    measured when the bitcast column is output from a jit (fetched
    all-zero, scripts/profile_r4b.py v0), when an int32 gather with the
    same index operand merely COEXISTS in the program (the compiler
    unifies the gathers and the in-program bitcast ids read back zero:
    rank collapsed to arange at 1M, scripts/profile_r4c.py a1/a4), and —
    the round-5 discovery that forced this default — in the PRODUCTION
    fused Barnes-Hut program itself, standalone or scanned, where the
    flushed ids zeroed the moments/placement and the returned
    accelerations failed direct-N² ground truth on every sampled row
    (max err = |a|max; scripts/profile_r5e.py p0/p1 vs p2). The int
    gather as the single source of truth makes the hazard structurally
    absent. Flushed builds are also degenerately FAST (every scatter
    chunk empty) — perf comparisons against bitcast-era numbers are
    invalid (r5e: correct sort step 72 ms vs flushed 37 ms at 1M).
    """
    n = pos.shape[0]
    num_cells = d * d * d
    ids = (
        (coords[:, 0] * d + coords[:, 1]) * d + coords[:, 2]
    ).astype(jnp.int32)  # explicit: x64 mode would promote to int64
    order = jnp.argsort(ids).astype(jnp.int32)
    # ONE payload gather for everything sorted (row gathers are
    # width-insensitive on TPU up to 8 columns). Without ids_sorted_fn
    # the cell id rides bit-exactly as a float bitcast of the SAME width
    # as the payload dtype (a dtype promotion would convert the value
    # and destroy the bits).
    fdt = jnp.result_type(pos.dtype, mass.dtype)
    idt = jnp.int64 if fdt == jnp.float64 else jnp.int32
    # ids as an f32 VALUE column: num_cells = d³ < 2²⁴ makes every id
    # exactly representable, so the cast round-trips bit-exactly AND the
    # values are normal floats — structurally immune to the bitcast
    # denormal-flush hazard. One 5-column gather measures 4.8 ms/step
    # cheaper at 1M than the separate int32 ids gather it replaces
    # (scripts/profile_r5h.py g0/g1). Falls back to the separate gather
    # for grids too large for exact f32 ids.
    ids_value_col = ids_via_gather and num_cells < (1 << 24)
    parts = [pos, mass[:, None]]
    if ids_value_col:
        parts.append(ids.astype(fdt)[:, None])
    elif ids_sorted_fn is None and not ids_via_gather:
        parts.append(
            jax.lax.bitcast_convert_type(ids.astype(idt), fdt)[:, None]
        )
    if extra is not None:
        parts.append(extra.astype(fdt))
    payload = jnp.concatenate(parts, axis=-1)[order]
    psort = payload[:, :4]
    if ids_value_col:
        sorted_ids = payload[:, 4].astype(jnp.int32)
        extra_sorted = payload[:, 5:] if extra is not None else None
    elif ids_via_gather:
        # Single int32-native source of truth — see the docstring's
        # denormal-flush hazard note.
        sorted_ids = ids[order]
        extra_sorted = payload[:, 4:] if extra is not None else None
    elif ids_sorted_fn is not None:
        # Monotone clamp — see the docstring: recomputed ids can diverge
        # from the sort key on f32 rounding-edge rows; the running max
        # keeps the monotone-dest contract intact for every consumer.
        sorted_ids = jax.lax.cummax(ids_sorted_fn(psort).astype(jnp.int32))
        extra_sorted = payload[:, 4:] if extra is not None else None
    else:
        sorted_ids = jax.lax.bitcast_convert_type(
            payload[:, 4], idt
        ).astype(jnp.int32)
        extra_sorted = payload[:, 5:] if extra is not None else None
    if with_csort:
        cz = sorted_ids % d
        cyx = sorted_ids // d
        csort = jnp.stack([cyx // d, cyx % d, cz], axis=-1)
    else:
        csort = None
    if with_cell_start:
        arange = jnp.arange(n, dtype=jnp.int32)
        first = (
            jnp.full((num_cells + 1,), n, jnp.int32)
            .at[sorted_ids]
            .min(arange)
        )
        # empty cells inherit the next occupied cell's start (reverse
        # cummin)
        cell_start = jnp.flip(jax.lax.cummin(jnp.flip(first)))
    else:
        cell_start = None
    return SortedGrid(
        order=order,
        psort=psort,
        csort=csort,
        ids=sorted_ids,
        cell_start=cell_start,
        extra=extra_sorted,
    )


# NOTE (r3p re-measurement): the full cell_start build costs ~8.8 ms at
# 1M rows (the scatter-min dominates, not the d³ cummin) and indexing it
# per row costs another ~6.4 ms — an earlier harness mis-attributed both
# to the sort. The TILE engines therefore always build light and use
# sorted_ranks (+~1.5 ms) / cell_starts_at; only the WINDOW engine,
# which looks up per-cell starts, builds the full index (its default).
FULL_CELL_START_MAX_CELLS = 1 << 19


def use_full_cell_start(num_cells: int) -> bool:
    """Whether the full d³ segment index is affordable for callers that
    genuinely index per cell (the window engine). The tile engines never
    need it — see the note above."""
    return num_cells <= FULL_CELL_START_MAX_CELLS


def sorted_ranks(sorted_ids: jax.Array) -> jax.Array:
    """Per-row rank within its cell run, from SORTED cell ids — O(N)
    vector work, no segment index: run starts are the positions where the
    id changes, and a cummax of (boundary ? index : 0) broadcasts each
    run's start forward (indices are increasing, so the max IS the most
    recent boundary)."""
    n = sorted_ids.shape[0]
    arange = jnp.arange(n, dtype=jnp.int32)
    boundary = jnp.concatenate(
        [
            jnp.ones((1,), jnp.bool_),
            sorted_ids[1:] != sorted_ids[:-1],
        ]
    )
    run_start = jax.lax.cummax(jnp.where(boundary, arange, 0))
    return arange - run_start


def cell_starts_at(sorted_ids: jax.Array, cells: jax.Array) -> jax.Array:
    """cell_start values at the given cell ids only — identical to
    ``SortedGrid.cell_start[cells]`` (first sorted index with id ≥ cell)
    but via a searchsorted over len(cells) queries instead of building
    the full d³ index (the tile engines query a few thousand chunk
    boundaries, not every cell)."""
    return jnp.searchsorted(
        sorted_ids, cells.astype(sorted_ids.dtype), side="left"
    ).astype(jnp.int32)


def window_sweep(
    grid: SortedGrid,
    *,
    d: int,
    xy_offsets: Tuple[Tuple[int, int], ...],
    z_halfwidth: int,
    pair_weight: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    window: int = 1024,
    block_size: int = 256,
    eps: float | None = None,
    cutoff2: float | None = None,
    impl: str | None = None,
    sorted_output: bool = False,
):
    """Σ_j w(r²_raw, m_j)·(x_j − x_i) over the neighbor windows.

    Returns (acc (N, 3) in ORIGINAL particle order — un-scaled by G,
    overflow count); ``sorted_output=True`` keeps acc in the grid's
    CELL-SORTED row order instead (the sorted-state integrator contract —
    skips the ~13 ms/1M unsort gather). Two mutually exclusive kernel
    specs:

      * ``eps`` (+ optional ``cutoff2``) — the softened-gravity weight
        m_j·(r²+ε²)^{-3/2}, with the hash cutoff predicate on the RAW r²
        when ``cutoff2`` is given. Eligible for the VMEM-resident Pallas
        kernel (ops/pallas_window_sweep.py — measured 207 vs 318 ms for
        the 1M hash step).
      * ``pair_weight(r2_raw, m_j)`` — arbitrary weight closure on (B, W)
        tiles; XLA path only.

    Passing both raises: the Pallas kernel hardcodes the gravity law, so a
    custom closure alongside ``eps`` would be silently ignored.
    Self/coincident pairs (r2_raw == 0) are masked by the engine either way.

    ``impl`` ("pallas"/"pallas_interpret"/"xla"): None resolves
    NBODY_PALLAS_WINDOW + backend at call time — callers that trace this
    inside jit must resolve it OUTSIDE the trace and pass it explicitly.

    Not jitted itself — callers trace it inside their own jitted force
    function (all arguments after ``grid`` must be Python constants there).
    """
    if (eps is None) == (pair_weight is None):
        raise ValueError(
            "window_sweep: pass exactly one of eps= (gravity kernel, "
            "Pallas-eligible) or pair_weight= (custom closure, XLA only)"
        )
    if impl is None:
        from nbody_tpu.ops.barnes_hut import resolve_impl

        impl = resolve_impl("NBODY_PALLAS_WINDOW")

    if eps is not None and impl in ("pallas", "pallas_interpret"):
        from nbody_tpu.ops.pallas_window_sweep import window_sweep_pallas

        win_starts, win_chunks, overflow = _window_starts(
            grid, d=d, xy_offsets=xy_offsets, z_halfwidth=z_halfwidth,
            window=window, block_size=block_size,
        )
        acc_sorted = window_sweep_pallas(
            grid.psort, grid.csort, win_starts, win_chunks,
            offsets=tuple(xy_offsets), block_size=block_size,
            window=window, z_hw=z_halfwidth, eps=eps, cut2=cutoff2,
            interpret=impl == "pallas_interpret",
        )
        n = grid.psort.shape[0]
        if sorted_output:
            return acc_sorted[:n], overflow
        return unsort_rows(acc_sorted[:n], grid.order), overflow

    if pair_weight is None:
        eps2 = eps * eps
        cut2 = cutoff2

        def pair_weight(r2_raw, mj):
            inv = jax.lax.rsqrt(r2_raw + eps2)
            w = mj * inv * inv * inv
            if cut2 is not None:
                w = jnp.where(r2_raw <= cut2, w, 0.0)
            return w

    n = grid.psort.shape[0]
    num_cells = d * d * d
    b = min(block_size, max(n, 1))
    w = window
    n_pad = -(-n // b) * b

    # Source arrays padded at the tail so windows never run off the end;
    # sentinel coords never match a real cell.
    psrc = jnp.pad(grid.psort, ((0, w), (0, 0)))
    csrc = jnp.pad(grid.csort, ((0, w), (0, 0)), constant_values=-(10 * d))

    # Target blocks (padded with non-matching sentinel coords).
    tpos = jnp.pad(grid.psort[:, :3], ((0, n_pad - n), (0, 0)))
    tcrd = jnp.pad(
        grid.csort, ((0, n_pad - n), (0, 0)), constant_values=-(20 * d)
    )
    tpos_b = tpos.reshape(n_pad // b, b, 3)
    tcrd_b = tcrd.reshape(n_pad // b, b, 3)

    cell_start = grid.cell_start
    hw = z_halfwidth

    def one_block(args):
        tp, tc = args  # (b, 3) float, (b, 3) int
        acc = jnp.zeros((b, 3), tp.dtype)
        over = jnp.zeros((), jnp.int32)
        # anchor/extent cells from the first/last REAL target in the block
        first = tc[0]
        last_idx = jnp.argmax(
            jnp.where(tc[:, 0] > -(15 * d), jnp.arange(b), -1)
        )
        last = tc[last_idx]
        for dx, dy in xy_offsets:
            nx0, ny0 = first[0] + dx, first[1] + dy
            nx1, ny1 = last[0] + dx, last[1] + dy
            base0 = jnp.clip(
                (nx0 * d + ny0) * d + jnp.maximum(first[2] - hw, 0),
                0,
                num_cells,
            )
            base1 = jnp.clip(
                (nx1 * d + ny1) * d + jnp.minimum(last[2] + hw, d - 1) + 1,
                0,
                num_cells,
            )
            win_start = cell_start[base0]
            needed_end = cell_start[base1]
            over = over + jnp.maximum(needed_end - win_start - w, 0)

            zero = jnp.zeros((), win_start.dtype)
            sp = jax.lax.dynamic_slice(psrc, (win_start, zero), (w, 4))
            sc = jax.lax.dynamic_slice(csrc, (win_start, zero), (w, 3))

            match = (
                (sc[None, :, 0] == tc[:, 0:1] + dx)
                & (sc[None, :, 1] == tc[:, 1:2] + dy)
                & (jnp.abs(sc[None, :, 2] - tc[:, 2:3]) <= hw)
            )  # (b, w)
            dvec = sp[None, :, :3] - tp[:, None, :]  # (b, w, 3)
            r2_raw = jnp.sum(dvec * dvec, axis=-1)
            wgt = pair_weight(r2_raw, sp[None, :, 3])
            wgt = jnp.where(match & (r2_raw > 0.0), wgt, 0.0)
            acc = acc + jnp.einsum("bw,bwd->bd", wgt, dvec)
        return acc, over

    acc_blocks, over_blocks = jax.lax.map(one_block, (tpos_b, tcrd_b))
    acc_sorted = acc_blocks.reshape(n_pad, 3)[:n]
    if sorted_output:
        return acc_sorted, jnp.sum(over_blocks)
    return unsort_rows(acc_sorted, grid.order), jnp.sum(over_blocks)


def _window_starts(
    grid: SortedGrid,
    *,
    d: int,
    xy_offsets: Sequence[Tuple[int, int]],
    z_halfwidth: int,
    window: int,
    block_size: int,
):
    """Vectorized per-(block, offset) window starts + live chunk counts
    for the Pallas sweep.

    Same cell_start lookups as the XLA path's ``one_block``, but computed
    for all blocks at once, with each start aligned DOWN to a 128-lane
    boundary (the kernel DMAs ``window + 128`` rows, so alignment never
    loses coverage). Overflow counts rows a window could NOT cover —
    identical never-double-count semantics.

    Returns ``(starts (nb, n_off) i32, nchunks (nb, n_off) i32,
    overflow ())``: ``nchunks`` is each window's LIVE 128-lane span,
    ``ceil((needed_end − aligned)/128)`` — rows past needed_end cannot
    match the exact cell predicate (sorted ids), so the kernel loops only
    the live chunks and skips empty windows' DMAs outright.
    """
    n = grid.psort.shape[0]
    num_cells = d * d * d
    b = min(block_size, max(n, 1))
    n_pad = -(-n // b) * b
    hw = z_halfwidth
    wbuf = window + 128

    tcrd = jnp.pad(
        grid.csort, ((0, n_pad - n), (0, 0)), constant_values=-(20 * d)
    ).reshape(n_pad // b, b, 3)
    nb = n_pad // b
    first = tcrd[:, 0]  # (nb, 3)
    valid = tcrd[:, :, 0] > -(15 * d)
    last_idx = jnp.argmax(
        jnp.where(valid, jnp.arange(b)[None, :], -1), axis=1
    )
    last = tcrd[jnp.arange(nb), last_idx]  # (nb, 3)

    starts = []
    chunks = []
    over = jnp.zeros((), jnp.int32)
    for dx, dy in xy_offsets:
        base0 = jnp.clip(
            ((first[:, 0] + dx) * d + first[:, 1] + dy) * d
            + jnp.maximum(first[:, 2] - hw, 0),
            0,
            num_cells,
        )
        base1 = jnp.clip(
            ((last[:, 0] + dx) * d + last[:, 1] + dy) * d
            + jnp.minimum(last[:, 2] + hw, d - 1) + 1,
            0,
            num_cells,
        )
        win_start = grid.cell_start[base0]
        needed_end = grid.cell_start[base1]
        aligned = (win_start // 128) * 128
        over = over + jnp.sum(
            jnp.maximum(needed_end - aligned - wbuf, 0)
        ).astype(jnp.int32)
        starts.append(aligned)
        chunks.append(-(-jnp.maximum(needed_end - aligned, 0) // 128))
    return (
        jnp.stack(starts, axis=1).astype(jnp.int32),
        jnp.stack(chunks, axis=1).astype(jnp.int32),
        over,
    )


def xy_ball(ws: int) -> Tuple[Tuple[int, int], ...]:
    """All (2ws+1)² xy offsets of the Chebyshev ball."""
    r = range(-ws, ws + 1)
    return tuple((x, y) for x in r for y in r)
