"""Dense cell-tile near-field engine (low-occupancy grids).

Counterpart engine to nbody_tpu/ops/sorted_window.py, optimal in the other
density regime: when average cell occupancy is small (the Barnes-Hut finest
level is sized so it is ~4), each cell's particles fit a tiny static slot
array, and the whole (2ws+1)³ neighbor sweep becomes dense shifted-tensor
arithmetic with ZERO gathers and ZERO per-block DMAs:

  tiles:   (D, D, D, K, 4)  — at most K particles per cell
  sweep:   for each offset, source = dynamic_slice of the padded tiles;
           all K×K slot pairs evaluated densely (empty slots carry mass 0
           and sit at their cell center, so they are inert).

Padding waste is (K/occupancy)² per cell pair but the absolute cost stays
small precisely because occupancy is small. Particles beyond K in a cell
are dropped from the NEAR field only (they keep their far field) and
counted in ``overflow`` — the same graceful-degradation contract as the
reference's traversal stack cap (force_barnes_hut.cu:166-171).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

import jax
import jax.numpy as jnp

from nbody_tpu.ops.sorted_window import build_sorted_grid


def tile_engine_fused(d: int, k: int, impl: str | None) -> bool:
    """True iff ``tile_near_field`` will take the fused Pallas pipeline
    (MXU scatter build → plane sweep → raw pickup) for this (d, k, impl)
    — the SINGLE predicate callers use to decide whether far-field
    folding (``far_plane``) is available. All conditions are static:

      * Scatter chunks span whole z-columns: q = g·d cells per chunk
        with g the smallest factor making the output block lane count
        r = g·d·k a multiple of 128; g | d keeps chunks inside one
        x-plane (that is what lets the slot-major scatter output reach
        the sweep's plane-major layout in ONE contiguous-run transpose —
        the old halo-padded relayout cost ~22 ms/step at 1M), and r
        stays VMEM-block-sized.
      * The sweep kernel's slot GROUPS are 8-sublane blocks.
      * One-hot dest ids ride in f32: exact only up to 2²⁴
        (pallas_scatter.SENTINEL contract) — larger grids would DROP
        rows silently, so they take the XLA path instead.
    """
    if impl not in ("pallas", "pallas_interpret"):
        return False
    g = 128 // math.gcd(d * k, 128)
    return (
        d % g == 0
        and g * d * k <= 4096
        and (k <= 8 or k % 8 == 0)
        and d * d * d * k < (1 << 24)
    )


@dataclasses.dataclass(frozen=True)
class TileBuild:
    """Output of ``tile_build_pallas`` — the dense slot tiles plus the
    per-row bookkeeping the sweep/pickup phase needs. ``moments`` is the
    (11, d³) fused finest-level multipole block [m, m·xr(3), m·xr⊗xr(6),
    count] when requested, else None."""

    tiles_plane: jax.Array   # (d, 4, k, d²) plane-major slot tensor
    rank_sorted: jax.Array   # (N,) i32 rank within cell, sorted order
    overflow: jax.Array      # () i32 rows beyond the k-slot cap
    moments: jax.Array | None = None


def tile_build_pallas(
    grid,
    lo: jax.Array,
    cell: jax.Array,
    *,
    d: int,
    k: int,
    impl: str,
    build_window: int | None = None,
    with_moments: bool = False,
    rank_sorted: jax.Array | None = None,
) -> TileBuild:
    """Build the plane-major slot tiles from a cell-sorted grid via the
    MXU one-hot scatter — the build phase of the fused Pallas near-field
    pipeline (callers must have checked ``tile_engine_fused``).

    ``with_moments=True`` additionally returns the finest-level order-2
    multipole moments + exact per-cell counts, accumulated by the SAME
    kernel from the same source windows (pallas_scatter.py): the
    Barnes-Hut pipeline gets its pyramid base for ~1 ms of extra MXU
    work instead of a separate ~10 ms segment-sum pass, and the overflow
    audit comes from the exact counts instead of a 1M-row reduction.
    Split from the sweep phase because the far-field grid (computed FROM
    the moments) seeds the sweep kernel's accumulators.
    """
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.sorted_window import cell_starts_at

    n = grid.psort.shape[0]
    num_cells = d * d * d
    ids_sorted = grid.ids
    # rank_sorted may be passed in by FROZEN-GRID callers (it only
    # depends on the sorted ids, which are frozen between re-sorts —
    # ops/sorted_window.FrozenGridMeta): skips the 1M-row cummax.
    if rank_sorted is None:
        if grid.cell_start is not None:
            rank_sorted = (
                jnp.arange(n, dtype=jnp.int32) - grid.cell_start[ids_sorted]
            )
        else:
            from nbody_tpu.ops.sorted_window import sorted_ranks

            rank_sorted = sorted_ranks(ids_sorted)

    _interp = impl == "pallas_interpret"
    g = 128 // math.gcd(d * k, 128)
    r_chunk = g * d * k
    q_cells = r_chunk // k
    if build_window is not None:
        w_win = build_window
    else:
        # w=640 measured: kernel 22.6 -> 16.2 ms at 1M (one-hot compare
        # count scales with w); covers the dense core in ONE window on
        # the bench scenes; denser chunks loop further windows IN-KERNEL
        # (exact at any density — w is purely a perf tune). Chunks wider
        # than the tuned 64 cells scale the default proportionally.
        w_win = 640 if q_cells <= 64 else -(-(q_cells * 10) // 128) * 128
    dest = jnp.where(
        rank_sorted < k, ids_sorted * k + rank_sorted, 1 << 24
    )
    m = num_cells * k
    n_chunks = m // r_chunk
    chunk_ar = jnp.arange(n_chunks, dtype=jnp.int32)
    c0 = (chunk_ar * r_chunk) // k
    c1 = jnp.minimum(
        ((chunk_ar + 1) * r_chunk + k - 1) // k, num_cells
    )
    if grid.cell_start is not None:
        starts = grid.cell_start[c0]
        ends = grid.cell_start[c1]
    else:
        starts = cell_starts_at(ids_sorted, c0)
        ends = cell_starts_at(ids_sorted, c1)
    # The kernel aligns starts DOWN to 128 (DMA provability) and loops
    # as many w-wide windows as the chunk's span needs — exact at any
    # density, so `overflow` counts ONLY k-slot overflow. nonempty/nwin
    # are passed explicitly: the wrapper's fallback recomputes them from
    # a 1M-row cummax envelope (~3 ms/step at 1M, scripts/profile_r3p).
    span = ends - (starts // 128) * 128
    nwin = -(-span // w_win)
    nonempty = ends > starts

    out = monotone_scatter_tiles(
        grid.psort, dest, starts, lo, cell,
        k=k, d=d, r=r_chunk, w=w_win, q=q_cells,
        nonempty=nonempty, nwin=nwin, interpret=_interp,
        with_moments=with_moments,
        cell_ids=ids_sorted if with_moments else None,
    )
    if with_moments:
        tiles_cm, moments = out
        counts = moments[10]
        overflow = jnp.sum(
            jnp.maximum(counts - float(k), 0.0)
        ).astype(jnp.int32)
    else:
        tiles_cm = out
        moments = None
        overflow = jnp.sum((rank_sorted >= k).astype(jnp.int32))
    # The ONE relayout pass of the near chain: slot-major chunk blocks
    # (4, [x, y_blk], k, [y_in, z]) → plane-major (x, 4, k, y·z). Inner
    # z runs (d elements) stay contiguous on both sides. (An MXU
    # eye-einsum relayout measured SLOWER in r2; the old halo-padded
    # layout needed two strided transposes plus two pad passes here.)
    tiles_plane = (
        tiles_cm.reshape(4, d, d // g, k, g, d)
        .transpose(1, 0, 3, 2, 4, 5)
        .reshape(d, 4, k, d * d)
    )
    return TileBuild(
        tiles_plane=tiles_plane, rank_sorted=rank_sorted,
        overflow=overflow, moments=moments,
    )


def tile_sweep_pick(
    tb: TileBuild,
    grid,
    lo: jax.Array,
    cell: jax.Array,
    *,
    d: int,
    ws: int,
    k: int,
    G: float,
    eps: float,
    impl: str,
    sorted_output: bool = False,
    cutoff2: float | None = None,
    far_plane: jax.Array | None = None,
):
    """Sweep + pickup phase of the fused Pallas near-field pipeline:
    (2ws+1)³ VMEM slot sweep (pallas_tile_near.py), then the per-particle
    pickup gather. See ``tile_near_field`` for the far_plane / cutoff2 /
    sorted_output contracts."""
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas_plane

    n = grid.psort.shape[0]
    # row-major sweep output is a measured DEAD END on hardware (r3):
    # any pickup from the (d, nc·c, 128) layout needs a narrow reshape
    # or slice of the full 134 MB array, which XLA lowers as a retiling
    # copy (~26-32 ms at 1M — scripts/profile_r3q.py q6−q5) — worse
    # than the raw path's one transpose + row gather (~7.3 ms,
    # profile_r3o.py n5−n4). Kept as an option for narrower-lane
    # hardware generations.
    row_major = False
    acc_raw = tile_sweep_pallas_plane(
        tb.tiles_plane, k=k, d=d, ws=ws, eps=eps, cutoff2=cutoff2,
        far_plane=far_plane, lo=lo, cell=cell,
        interpret=impl == "pallas_interpret", row_major=row_major,
    )  # row-major (d, nc·c, 128) | raw (d, 3, k, nc·c) lanes
    if far_plane is not None:
        # Slot-overflow fallback: rows beyond the k-slot cap lose their
        # near contribution (audited) — give them the far expansion's A
        # term at their cell center (δ=0) via one 3-column row gather
        # instead of zero total force.
        far_a = far_plane[:, 0:3, :].transpose(0, 2, 1).reshape(
            d * d * d, 3
        )
    else:
        far_a = None
    if row_major:
        return _slot_pickup_rowmajor(
            acc_raw, grid, grid.ids, tb.rank_sorted, d, k, n, G,
            sorted_output=sorted_output, overflow_rows=far_a,
        )
    return _slot_pickup_raw(
        acc_raw, grid, grid.ids, tb.rank_sorted, d, k, n, G,
        sorted_output=sorted_output, overflow_rows=far_a,
    )


def tile_near_field(
    pos: jax.Array,
    mass: jax.Array,
    coords: jax.Array,
    lo: jax.Array,
    cell: jax.Array,
    *,
    d: int,
    ws: int,
    k: int,
    G: float,
    eps: float,
    grid=None,
    impl: str | None = None,
    sorted_output: bool = False,
    cutoff2: float | None = None,
    build_window: int | None = None,
    far_plane: jax.Array | None = None,
):
    """Exact near-field acceleration within the (2ws+1)³ cell ball.

    ``cutoff2`` adds the spatial-hash pair predicate (RAW r² ≤ cutoff²,
    tested BEFORE softening — reference force_spatial_hash.cu:120-139),
    turning this into the sparse-regime short-range engine.

    ``far_plane`` (D, n_far, D²) per-cell far-field local expansion
    [A3 | J6 (| H10)], UNSCALED by G: the Pallas sweep kernel seeds each
    slot with the expansion at the slot's own position and the pickup
    serves near+far in one gather (slot-overflow rows fall back to the
    expansion's A term at their cell center — consistent with losing
    their near contribution, and counted by the same audit). Only valid
    on the Pallas fast path — callers must check ``tile_engine_fused``
    and evaluate the far field separately otherwise.

    Returns (acc (N, 3) in original order, overflow count). Pass a
    prebuilt ``grid`` (build_sorted_grid output for the same coords) to
    share the sort with the pyramid build. ``impl`` selects the kernel
    implementation ("pallas" / "pallas_interpret" / "xla"); None resolves
    NBODY_PALLAS_NEAR + backend at call time — callers that trace this
    inside jit must resolve it themselves (ops/barnes_hut.resolve_impl)
    and pass it explicitly, or the env var binds silently at trace time.

    ``sorted_output=True`` returns acc in the grid's CELL-SORTED row
    order (rows aligned with ``grid.psort``), skipping the ~13 ms/1M
    unsort gather — the contract the sorted-state integrator pipeline
    (ops/integrator.make_sorted_multi_step) is built on.
    """
    if impl is None:
        from nbody_tpu.ops.barnes_hut import resolve_impl

        impl = resolve_impl("NBODY_PALLAS_NEAR")
    n = pos.shape[0]
    from nbody_tpu.ops.sorted_window import sorted_ranks

    num_cells = d * d * d
    if grid is None:
        # LIGHT build: the tile engines never index per-cell segments —
        # ranks come from sorted_ranks and chunk starts from a few
        # thousand searchsorted queries; the full d³ index costs ~8.8 ms
        # (1M-row scatter-min) plus a 6.4 ms rank gather at 1M
        # (scripts/profile_r3p.py p1/p3 vs p6) — and per-row cell coords
        # are never read either (with_csort=False).
        grid = build_sorted_grid(
            pos, mass, coords, d, with_cell_start=False, with_csort=False
        )

    pallas_ok = tile_engine_fused(d, k, impl)
    if far_plane is not None and not pallas_ok:
        raise ValueError(
            "far_plane folding requires the Pallas fast path "
            f"(tile_engine_fused({d}, {k}, {impl!r}) is False) — "
            "evaluate the far field separately on this engine"
        )
    if pallas_ok:
        # ("pallas_interpret" runs the same pipeline in interpret mode on
        # CPU so the suite can equivalence-test the TPU-only path
        # hermetically.)
        # Full-Pallas tile path — the TPU default (NBODY_PALLAS_NEAR=0
        # opts out for A/B profiling):
        #   build: MXU one-hot monotone scatter (pallas_scatter.py) —
        #          the XLA 1M-row scatter-set alone costs ~50 ms;
        #   sweep: VMEM-resident static-shift kernel (pallas_tile_near.py)
        #          — 24.9 ms at 1M/L6/k16 vs 210 ms for the fused-XLA
        #          sweep below (which streams every (K, cells)
        #          intermediate through HBM).
        tb = tile_build_pallas(
            grid, lo, cell, d=d, k=k, impl=impl,
            build_window=build_window,
        )
        acc = tile_sweep_pick(
            tb, grid, lo, cell, d=d, ws=ws, k=k, G=G, eps=eps,
            impl=impl, sorted_output=sorted_output, cutoff2=cutoff2,
            far_plane=far_plane,
        )
        return acc, tb.overflow

    ids_sorted = grid.ids
    # rank within cell, in sorted order — via the d³ segment index when
    # the grid carries one (faster at d ≤ 64, see use_full_cell_start),
    # else O(N) from the sorted ids alone (large grids)
    if grid.cell_start is not None:
        rank_sorted = (
            jnp.arange(n, dtype=jnp.int32) - grid.cell_start[ids_sorted]
        )
    else:
        rank_sorted = sorted_ranks(ids_sorted)
    overflow = jnp.sum((rank_sorted >= k).astype(jnp.int32))

    tiles = _xla_tile_build(
        grid.psort, ids_sorted, rank_sorted, lo, cell, d=d, k=k,
        dtype=pos.dtype,
    )

    # Dense sweep over the Chebyshev ball. Layout: slot axis on SUBLANES,
    # flattened cells on LANES — (k, 4, d, d, d) — so the VPU runs at full
    # lane utilization (the (d³, K, 4)-trailing layout starves the lanes).
    tiles_t = tiles.transpose(3, 4, 0, 1, 2)  # (k, 4, d, d, d)

    r = range(-ws, ws + 1)
    offs = np.asarray(
        [(x, y, z) for x in r for y in r for z in r], np.int32
    )
    pad = [(0, 0), (0, 0), (ws, ws), (ws, ws), (ws, ws)]
    tiles_pad = jnp.pad(tiles_t, pad)
    offsets_arr = jnp.asarray(offs + ws)

    pc = d * d * d
    tgt = tiles_t.reshape(k, 4, pc)  # (k, 4, pc)
    eps2 = eps * eps

    def body(acc, off):
        zero = jnp.zeros((), off.dtype)
        src = jax.lax.dynamic_slice(
            tiles_pad, (zero, zero, off[0], off[1], off[2]), (k, 4, d, d, d)
        ).reshape(k, 4, pc)
        sx, sy, sz, sm = src[:, 0], src[:, 1], src[:, 2], src[:, 3]
        rows = []
        for kt in range(k):
            dx = sx - tgt[kt, 0]          # (k_s, pc)
            dy = sy - tgt[kt, 1]
            dz = sz - tgt[kt, 2]
            r2_raw = dx * dx + dy * dy + dz * dz
            inv = jax.lax.rsqrt(r2_raw + eps2)
            w = sm * (inv * inv * inv)    # empty slots: m = 0 ⇒ w = 0
            if cutoff2 is not None:
                w = jnp.where(r2_raw <= cutoff2, w, 0.0)
            w = jnp.where(r2_raw == 0.0, 0.0, w)
            rows.append(
                jnp.stack(
                    [
                        jnp.sum(w * dx, axis=0),
                        jnp.sum(w * dy, axis=0),
                        jnp.sum(w * dz, axis=0),
                    ]
                )
            )
        return acc + jnp.stack(rows, axis=0), None  # (k, 3, pc)

    acc0 = jnp.zeros((k, 3, pc), pos.dtype)
    acc_slots, _ = jax.lax.scan(body, acc0, offsets_arr)
    acc_slots = acc_slots.reshape(k, 3, d, d, d)
    return _slot_pickup(acc_slots, grid, ids_sorted, rank_sorted, k, n, G,
                        sorted_output=sorted_output), overflow


def _xla_tile_build(
    psort, ids_sorted, rank_sorted, lo, cell, *, d: int, k: int, dtype
):
    """Exact XLA (cell, slot) tile build → (d, d, d, k, 4).

    Tiles carry inert empty slots at cell centers. The scatter uses LINEAR
    row indices into (d³·(k+1), 4) — measured ~10× faster on TPU than the
    equivalent 4-D index scatter (slot k is the overflow sink, sliced off).
    Slow (~50 ms at 1M rows: XLA scatters are descriptor-serialized) but
    windowless — the impl="xla" engine build and the equivalence oracle
    the Pallas path is tested against.
    """
    num_cells = d * d * d
    cgrid = jnp.stack(
        jnp.meshgrid(
            jnp.arange(d), jnp.arange(d), jnp.arange(d), indexing="ij"
        ),
        axis=-1,
    ).astype(dtype)
    centers = lo + (cgrid + 0.5) * cell  # (d, d, d, 3)
    rank_capped = jnp.minimum(rank_sorted, k)
    flat = ids_sorted * (k + 1) + rank_capped
    init = jnp.concatenate(
        [
            jnp.broadcast_to(centers[:, :, :, None, :], (d, d, d, k + 1, 3)),
            jnp.zeros((d, d, d, k + 1, 1), dtype),
        ],
        axis=-1,
    ).reshape(num_cells * (k + 1), 4)
    # unique_indices: every (cell, rank<k) pair is distinct; only sink
    # slots (rank clamped to k) can collide, and those rows are sliced
    # away below — the hint lets XLA skip its duplicate-serialization.
    return (
        init.at[flat].set(psort, unique_indices=True)
        .reshape(d, d, d, k + 1, 4)[:, :, :, :k, :]
    )


def _slot_pickup_rowmajor(acc_rm, grid, ids_sorted, rank_sorted, d, k, n, G,
                          sorted_output: bool = False, overflow_rows=None):
    """Per-particle pickup from the sweep kernel's ROW-MAJOR
    (d, nc·c, 128) output (lanes = slot·8 + ch, 8k used, the rest
    zero): a pure RESHAPE to width-8 rows — 128/8 = 16 slot rows per
    cell, NO slice of the full array (a 3-lane-stride layout would need
    a ~26 ms/1M narrow strided copy) — then a LINEAR row gather and a
    tiny fused 3-column slice of the gathered (N, 8). The in-kernel
    permutation matmul already did the layout flip that the raw path
    pays an XLA transpose for."""
    from nbody_tpu.ops.sorted_window import unsort_rows

    ncc = acc_rm.shape[1]
    l = d * d
    spr = 128 // 8  # slot rows per cell row (slots k..15 are zero)
    acc_t = acc_rm.reshape(d * ncc * spr, 8)
    if ncc == l:
        row = ids_sorted
    else:
        # lane-chunk padding: cells per plane (l) < rows per plane (ncc)
        row = (ids_sorted // l) * ncc + (ids_sorted % l)
    rank_read = jnp.minimum(rank_sorted, k - 1)
    acc_sorted = acc_t[row * spr + rank_read][:, :3]  # (N, 3)
    if overflow_rows is None:
        fallback = 0.0
    else:
        fallback = overflow_rows[ids_sorted]
    acc_sorted = jnp.where(
        (rank_sorted < k)[:, None], acc_sorted, fallback
    )
    if sorted_output:
        return G * acc_sorted
    return unsort_rows(G * acc_sorted, grid.order)


def _slot_pickup_raw(acc_raw, grid, ids_sorted, rank_sorted, d, k, n, G,
                     sorted_output: bool = False, overflow_rows=None):
    """Per-particle pickup from the sweep kernel's RAW (d, 3, k, NC·C)
    output: one XLA relayout to row-major (cell·k + slot, 3) then a
    LINEAR row gather. (The 4-axis advanced-index gather straight off
    the raw layout measured ~2 ms SLOWER at 1M — r3j variant B vs D —
    XLA's batched gather beats the multi-axis one here.)

    ``overflow_rows`` (d³, 3): per-cell values served to rows past the
    k-slot cap instead of zero (the far-folded path passes the far A
    grid; None keeps the zero contract)."""
    from nbody_tpu.ops.sorted_window import unsort_rows

    l = d * d
    acc_t = (
        acc_raw[:, :, :, :l]          # strip lane-chunk padding
        .reshape(d, 3, k, d, d)       # (x, ch, slot, y, z)
        .transpose(0, 3, 4, 2, 1)     # (x, y, z, slot, ch)
        .reshape(d * d * d * k, 3)
    )
    if overflow_rows is None:
        rank_read = jnp.minimum(rank_sorted, k - 1)
        acc_sorted = acc_t[ids_sorted * k + rank_read]  # (N, 3)
        acc_sorted = jnp.where(
            (rank_sorted < k)[:, None], acc_sorted, 0.0
        )
    else:
        # FUSED overflow fallback (measured r3s q4 vs q6: 45.7 → 31.6 ms
        # force eval at 1M — the fallback's second 1M-row gather + where
        # cost ~14 ms): append the d³ fallback rows to the pickup table
        # and REDIRECT overflow rows into the same gather by index. One
        # gather serves both populations; bit-identical to the
        # gather+where form (r3s equivalence: max |diff| = 0).
        table = jnp.concatenate([acc_t, overflow_rows], axis=0)
        idx = jnp.where(
            rank_sorted < k,
            ids_sorted * k + rank_sorted,
            d * d * d * k + ids_sorted,
        )
        acc_sorted = table[idx]
    if sorted_output:
        return G * acc_sorted
    return unsort_rows(G * acc_sorted, grid.order)


def _slot_pickup(acc_slots, grid, ids_sorted, rank_sorted, k, n, G,
                 sorted_output: bool = False):
    """Per-particle pickup: (k, 3, d, d, d) slot accelerations → (N, 3) in
    ORIGINAL particle order. One transpose then a LINEAR row gather
    (cell·k + rank), then the inverse-permutation GATHER (unsort_rows —
    a 1M-row scatter costs ~50 ms on TPU, the gather form ~13 ms)."""
    from nbody_tpu.ops.sorted_window import unsort_rows

    d = acc_slots.shape[-1]
    acc_t = acc_slots.transpose(2, 3, 4, 0, 1).reshape(d * d * d * k, 3)
    rank_read = jnp.minimum(rank_sorted, k - 1)
    acc_sorted = acc_t[ids_sorted * k + rank_read]
    acc_sorted = jnp.where((rank_sorted < k)[:, None], acc_sorted, 0.0)
    if sorted_output:
        return G * acc_sorted
    return unsort_rows(G * acc_sorted, grid.order)
