"""Monotone row scatter on the MXU — builds the dense (cell, slot) tiles.

``init.at[flat].set(psort)`` with 1M rows costs ~50 ms on TPU: XLA
lowers scatters to descriptor-serialized row writes (~20 M rows/s),
20× slower than gathers (scripts/profile_build.py). But this scatter is
special: the destinations are STRICTLY INCREASING along the (cell-sorted)
input. So each contiguous chunk of output rows draws from ONE contiguous
window of input rows — and "place row r at dest d" becomes a ONE-HOT
matrix multiply, which is what the MXU is for:

    placed(ch, R) = src_window(ch, W) ·contract-W· onehot(R, W),
    onehot[r, w] = (src_dest[w] == chunk_row0 + r)

Exactness: with ``precision=HIGHEST`` XLA decomposes each f32 operand
into three bf16 terms whose sum is exactly the f32 value (3 × 8-bit
mantissas ≥ 24 bits), one-hot entries are exactly representable, and
each dest row matches at most one source row — the result is bit-exact
row placement, not an approximation.

Layout choices (each shaped by a measured Mosaic constraint —
scripts in /tmp probed them on hardware):
  * sources are channel-major (8, rows): a window is then a LANE slice,
    whose dynamic start must be PROVABLY 128-aligned — so the scalar
    prefetch carries ``start // 128`` and the kernel multiplies back;
    (row-major (rows, 8) DMAs are rejected outright: trailing dims must
    be 128-aligned);
  * the dest id rides as channel 4 (ids < 2²⁴ are exact in f32) and
    channel 5 carries the constant 1 — after the one-hot matmul,
    channel 5 IS the coverage mask, for free, in the right layout;
  * the one-hot pairs a SUBLANE dest iota (R, 1) with the LANE source
    keys (1, W): no transposes anywhere in the kernel;
  * output is channel-major (8, d³·k) in (8, R) lane-aligned blocks,
    matching the sweep kernel's channel-major tile layout.

Unmatched dest rows get the filler: their cell center with mass 0 (the
inert-slot convention of ops/tile_sweep.py), computed in-kernel from the
dest row index. Source rows whose dest was set to the overflow sentinel
never match. A chunk whose source span exceeds one window LOOPS further
windows in-kernel (prefetched per-chunk count, lax.fori_loop over DMAs)
— the build is exact for any density; the window size w only tunes the
MXU compare-pass count, it is not a correctness knob.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = float(1 << 25)  # exact in f32; > any real dest id (< 2^24)


def _split3_dot(win_v, onehot):
    """One-hot placement matmul via an exact 3-way bf16 split — packed
    into ONE MXU pass.

    ``win_v = w0 + w1 + w2`` is the exact 3-way bf16 split (8+8+8 ≥ 24
    mantissa bits) and the one-hot rhs is exactly representable in bf16,
    so with ≤ 1 match per dest row the three partial products reassemble
    the f32 value BIT-EXACTLY — the same guarantee as precision=HIGHEST
    at a fraction of the passes (HIGHEST splits BOTH operands; the
    one-hot side needs no split). For many-match rows (segment sums)
    each partial sum accumulates in f32 — f32-accurate, rounding differs
    from HIGHEST only by summation order.

    The split terms are STACKED on the M (sublane) axis — (3·C, W) —
    because the MXU pads M to a full 128-row tile per pass (measured:
    split3-as-3-passes costs ~1.5 ms/pass at 1M regardless of C = 8);
    one (24, W) pass costs the same as one (8, W) pass, so stacking
    recovers ~2 passes of pure padding.
    """
    c_rows = win_v.shape[0]
    w0 = win_v.astype(jnp.bfloat16)
    r1 = win_v - w0.astype(jnp.float32)
    w1 = r1.astype(jnp.bfloat16)
    w2 = (r1 - w1.astype(jnp.float32)).astype(jnp.bfloat16)
    lhs = jnp.concatenate([w0, w1, w2], axis=0)  # (3·C, W) bf16
    oh = onehot.astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        lhs, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3·C, R)
    return acc[:c_rows] + acc[c_rows:2 * c_rows] + acc[2 * c_rows:]


def _placement_dot(win_v, onehot, split3: bool):
    if split3:
        return _split3_dot(win_v, onehot)
    return jax.lax.dot_general(
        win_v,
        onehot,
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def _decode_cell(cell, d: int):
    """Linear cell id → (cx, cy, cz) int vectors (row-major, z fastest)."""
    if d & (d - 1) == 0:
        dbits = d.bit_length() - 1
        cz = cell & (d - 1)
        cy = (cell >> dbits) & (d - 1)
        cx = cell >> (2 * dbits)
    else:
        cz = cell % d
        cyx = cell // d
        cy = cyx % d
        cx = cyx // d
    return cx, cy, cz


def _kernel(
    starts_ref,   # (n_chunks,) i32 scalar-prefetch: window starts // 128
    nonempty_ref,  # (n_chunks,) i32 scalar-prefetch: chunk has sources
    nwin_ref,     # (n_chunks,) i32 scalar-prefetch: windows covering span
    geom_ref,     # (1, 128) f32 VMEM: [lo_x, lo_y, lo_z, cell, ...]
    src_hbm,      # (n_ch, cols_pad) f32 ANY: x,y,z,m,dest,1,cid,0[,extras]
    *out_refs,    # (n_ch, R) f32 VMEM block [+ (16, QP) moments block]
    r: int,
    w: int,
    k: int,
    d: int,
    q: int,
    qp: int,
    split3: bool,
    with_moments: bool,
    n_ch: int = 8,
):
    if with_moments:
        out_ref, mom_ref = out_refs
    else:
        (out_ref,) = out_refs
    c = pl.program_id(0)

    # Filler: cell centers, mass 0. With q == 0 (legacy layout) output
    # column = local dest id, so cell = dest_row // k (constant divisor);
    # with q > 0 (slot-major layout, cells per chunk) column col maps to
    # slot col // q of cell chunk·q + col % q — the layout the near-sweep
    # kernel consumes with ONE contiguous-run transpose (tile_sweep.py).
    # A power-of-two divisor decodes with shift/mask, any other with
    # constant-divisor div/mod (both are vector int ops). Computed
    # unconditionally — it is also the whole output of empty chunks
    # (~45% of chunks on a spherical scene are outside the ball; they
    # skip the DMA + matmul entirely).
    col_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    if q:
        cell = c * q + col_lanes % q
    else:
        cell = (c * r + col_lanes) // k
    cx, cy, cz = _decode_cell(cell, d)
    lo_x = geom_ref[0, 0]
    lo_y = geom_ref[0, 1]
    lo_z = geom_ref[0, 2]
    cw = geom_ref[0, 3]
    fx = lo_x + (cx.astype(jnp.float32) + 0.5) * cw
    fy = lo_y + (cy.astype(jnp.float32) + 0.5) * cw
    fz = lo_z + (cz.astype(jnp.float32) + 0.5) * cw

    # Scratch is allocated unconditionally (Mosaic hoists allocations);
    # only the DMA + matmul sit behind the emptiness branch.
    def inner(win, sem):
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        if q:
            dest_sub = (c * q + iota_sub % q) * k + iota_sub // q
        else:
            dest_sub = iota_sub + c * r
        dest_rows_f = dest_sub.astype(jnp.float32)               # (R, 1)

        def window_moments(win_v):
            """(11, q) per-cell moments of this window's rows for the
            chunk's q cells: [m, m·xr(3), m·xr⊗xr(6), count], xr the
            CENTER-RELATIVE position (the pyramid_from_packed order-2
            layout, plus a trailing count channel). The cell one-hot
            keys on channel 6 (cell id, < 2²⁴ exact in f32), so slot
            OVERFLOW rows still contribute — the moments are exact at
            any density, like the old monotone_segment_sum path."""
            cid_f = win_v[6:7]                                   # (1, W)
            cell_sub = c * q + jax.lax.broadcasted_iota(
                jnp.int32, (q, 1), 0
            )
            oh_cell = (
                cell_sub.astype(jnp.float32) == cid_f
            ).astype(jnp.float32)                                # (q, W)
            scx, scy, scz = _decode_cell(cid_f.astype(jnp.int32), d)
            sfx = lo_x + (scx.astype(jnp.float32) + 0.5) * cw
            sfy = lo_y + (scy.astype(jnp.float32) + 0.5) * cw
            sfz = lo_z + (scz.astype(jnp.float32) + 0.5) * cw
            mm = win_v[3:4]
            xr = win_v[0:1] - sfx
            yr = win_v[1:2] - sfy
            zr = win_v[2:3] - sfz
            vals = jnp.concatenate(
                [
                    mm, mm * xr, mm * yr, mm * zr,
                    mm * (xr * xr), mm * (yr * yr), mm * (zr * zr),
                    mm * (xr * yr), mm * (xr * zr), mm * (yr * zr),
                    jnp.ones_like(mm),
                ],
                axis=0,
            )                                                    # (11, W)
            return _placement_dot(vals, oh_cell, split3)         # (11, q)

        @pl.when(nonempty_ref[c] == 0)
        def _empty():
            out_ref[0:1] = fx
            out_ref[1:2] = fy
            out_ref[2:3] = fz
            out_ref[3:n_ch] = jnp.zeros((n_ch - 3, r), jnp.float32)
            if with_moments:
                mom_ref[...] = jnp.zeros((16, qp), jnp.float32)

        @pl.when(nonempty_ref[c] != 0)
        def _full():
            s128 = starts_ref[c]
            cp = pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(s128 * 128, w)], win, sem
            )
            cp.start()
            cp.wait()

            win_v = win[...]                                     # (8, W)
            keys = win_v[4:5]                                    # (1, W)
            onehot = (dest_rows_f == keys).astype(jnp.float32)   # (R, W)
            out_ref[...] = _placement_dot(win_v, onehot, split3)
            if with_moments:
                mom_ref[...] = jnp.zeros((16, qp), jnp.float32)
                mom_ref[0:11, 0:q] = window_moments(win_v)

            # Overflow windows: a chunk whose source span exceeds W loops
            # further windows [start + j·W, start + (j+1)·W) through the
            # same one-hot placement until the prefetched count is
            # exhausted — the build is EXACT for any density, with zero
            # extra cost for chunks that fit one window (the typical
            # case; the old whole-array lax.cond fallback cost ~55 ms on
            # EVERY step at 1M, scripts/profile_r3j.py). Windows are
            # disjoint and dest rows unique, so a column is hit by at
            # most one pass and the adds stay BIT-EXACT (the misses
            # contribute exact 0.0).
            def _more(j, carry):
                off128 = s128 + j * (w // 128)
                cp2 = pltpu.make_async_copy(
                    src_hbm.at[:, pl.ds(off128 * 128, w)], win, sem
                )
                cp2.start()
                cp2.wait()

                wv = win[...]                                    # (8, W)
                oh = (dest_rows_f == wv[4:5]).astype(jnp.float32)
                out_ref[...] = out_ref[...] + _placement_dot(
                    wv, oh, split3
                )
                if with_moments:
                    mom_ref[0:11, 0:q] = (
                        mom_ref[0:11, 0:q] + window_moments(wv)
                    )
                return carry

            jax.lax.fori_loop(1, nwin_ref[c], _more, 0)

            # Filler merge LAST, exactly once: channel 5 accumulated the
            # coverage mask across all windows (0 or 1 per column), so
            # placed columns add an exact 0·filler and untouched columns
            # an exact 1·filler — placement stays bit-exact regardless of
            # the window count.
            miss = 1.0 - out_ref[5:6]
            out_ref[0:1] = out_ref[0:1] + miss * fx
            out_ref[1:2] = out_ref[1:2] + miss * fy
            out_ref[2:3] = out_ref[2:3] + miss * fz

    pl.run_scoped(
        inner,
        win=pltpu.VMEM((n_ch, w), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _segsum_kernel(
    starts_ref,   # (n_chunks,) i32 scalar-prefetch: window starts // 128
    nonempty_ref,  # (n_chunks,) i32 scalar-prefetch: chunk has sources
    nwin_ref,     # (n_chunks,) i32 scalar-prefetch: windows covering span
    src_hbm,      # (16, cols_pad) f32 ANY: C value channels + dest + 0s
    out_ref,      # (16, R) f32 VMEM block
    *,
    r: int,
    w: int,
    split3: bool,
):
    c = pl.program_id(0)

    def inner(win, sem):
        row0 = c * r
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        dest_rows_f = (iota_sub + row0).astype(jnp.float32)      # (R, 1)

        @pl.when(nonempty_ref[c] == 0)
        def _empty():
            out_ref[...] = jnp.zeros((16, r), jnp.float32)

        @pl.when(nonempty_ref[c] != 0)
        def _full():
            s128 = starts_ref[c]
            cp = pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(s128 * 128, w)], win, sem
            )
            cp.start()
            cp.wait()

            win_v = win[...]                                     # (16, W)
            keys = win_v[15:16]                                  # (1, W)
            onehot = (dest_rows_f == keys).astype(jnp.float32)   # (R, W)
            # (16, R): segment sums, f32-accurate MXU accumulation
            out_ref[...] = _placement_dot(win_v, onehot, split3)

            # Overflow windows (see _kernel): a segment's sources may
            # straddle windows; partial sums ADD — no filler merge needed.
            def _more(j, carry):
                off128 = s128 + j * (w // 128)
                cp2 = pltpu.make_async_copy(
                    src_hbm.at[:, pl.ds(off128 * 128, w)], win, sem
                )
                cp2.start()
                cp2.wait()

                wv = win[...]                                    # (16, W)
                oh = (dest_rows_f == wv[15:16]).astype(jnp.float32)
                out_ref[...] = out_ref[...] + _placement_dot(
                    wv, oh, split3
                )
                return carry

            jax.lax.fori_loop(1, nwin_ref[c], _more, 0)

    pl.run_scoped(
        inner,
        win=pltpu.VMEM((16, w), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit, static_argnames=("num_dest", "r", "w", "split3", "interpret")
)
def monotone_segment_sum(
    vals: jax.Array,        # (N, C) rows, C <= 15, sorted by dest
    dest: jax.Array,        # (N,) i32 non-decreasing segment ids
    src_starts: jax.Array,  # (n_chunks,) i32 source window starts
    *,
    num_dest: int,
    r: int = 256,
    w: int = 2560,
    nonempty: jax.Array | None = None,  # (n_chunks,) bool/i32 chunk flags
    nwin: jax.Array | None = None,      # (n_chunks,) i32 windows per chunk
    split3: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """→ (C, num_dest) per-segment sums — the scatter-ADD analogue of
    ``monotone_scatter_tiles`` (same one-hot MXU pattern, but a dest row
    matches MANY sources; precision=HIGHEST accumulates their exact
    3-way-bf16 splits in f32). An XLA ``.at[dest].add`` of 1M rows costs
    ~50 ms; this runs in a few ms. Chunks whose span exceeds one window
    loop further windows in-kernel (count ``nwin``, derived from ``dest``
    when None) — EXACT for any density; w is purely a performance tune.
    """
    n, c_in = vals.shape
    assert c_in <= 15
    if w % 128 != 0:
        raise ValueError(f"window must be 128-aligned, got w={w}")
    m = -(-num_dest // r) * r
    n_chunks = m // r

    if nonempty is None or nwin is None:
        # A chunk is live iff any (sorted) dest id lands in its row range.
        # Sentinel rows (dest ≥ 2²⁴) may INTERLEAVE with real dests, so
        # binary-search the monotone ENVELOPE: sentinel rows inherit the
        # last real dest (they never match a column, so whether a span
        # includes them is irrelevant — only real-row coverage matters).
        denv = jax.lax.cummax(
            jnp.where(dest < (1 << 24), dest, dest.dtype.type(-1))
        )
        bounds = jnp.arange(n_chunks + 1, dtype=dest.dtype) * r
        idx = jnp.searchsorted(denv, bounds, side="left")
        if nonempty is None:
            nonempty = idx[1:] > idx[:-1]
        if nwin is None:
            span = idx[1:] - (src_starts // 128) * 128
            nwin = -(-span // w)
    nonempty = nonempty.astype(jnp.int32)
    nwin = jnp.maximum(nwin.astype(jnp.int32), 1)

    cols_pad = -(-(n + 2 * w + 128) // 128) * 128
    dest_f = jnp.where(
        dest >= (1 << 24), SENTINEL, dest.astype(jnp.float32)
    )
    # Stack channel rows (no concat().T — that's a full XLA transpose).
    zrow = jnp.zeros((n,), jnp.float32)
    src = jnp.stack(
        [vals[:, i] for i in range(c_in)]
        + [zrow] * (15 - c_in)
        + [dest_f],
        axis=0,
    )  # (16, N)
    src = jnp.pad(src, ((0, 0), (0, cols_pad - n)))
    src = src.at[15, n:].set(SENTINEL)

    starts128 = jnp.clip(src_starts // 128, 0, (cols_pad - 2 * w) // 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((16, r), lambda i, *_: (0, i)),
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, r=r, w=w, split3=split3),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, m), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_chunks * (r * w * 18),
            bytes_accessed=n_chunks * (w * 16 + 16 * r) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts128, nonempty, nwin, src)
    return out[:c_in, :num_dest]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "d", "r", "w", "q", "split3", "interpret", "with_moments",
        "with_coverage",
    ),
)
def monotone_scatter_tiles(
    psort: jax.Array,       # (N, 4) cell-sorted rows x,y,z,m
    dest: jax.Array,        # (N,) i32 increasing; overflow rows >= 2^24
    src_starts: jax.Array,  # (n_chunks,) i32 source window starts
    lo: jax.Array,          # (3,) grid origin
    cell: jax.Array,        # () cell width
    *,
    k: int,
    d: int,
    r: int = 1024,
    w: int = 1024,
    q: int = 0,
    nonempty: jax.Array | None = None,  # (n_chunks,) bool/i32 chunk flags
    nwin: jax.Array | None = None,      # (n_chunks,) i32 windows per chunk
    split3: bool = True,
    interpret: bool = False,
    with_moments: bool = False,
    cell_ids: jax.Array | None = None,  # (N,) i32 sorted cell ids (moments)
    with_coverage: bool = False,
    extra: jax.Array | None = None,     # (N, E<=8) extra placed channels
):
    """→ (4, d³·k) channel-major dense slot rows, cell centers with mass 0
    in unmatched columns.

    Column layout: with ``q == 0`` column = (cell · k + slot) globally
    (slot fastest); with ``q = r // k`` (cells per chunk) each chunk's
    columns are SLOT-MAJOR — col = chunk·r + slot·q + local_cell — so the
    global array reshapes to (4, n_chunks, k, q) and reaches the sweep
    kernel's plane-major layout in one contiguous-run transpose
    (ops/tile_sweep.py). Chunk boundaries, windows, and audits are
    identical in both layouts.

    ``src_starts[c]`` must point at (or before) the first input row whose
    dest lies in chunk c's range; the kernel loops as many w-wide source
    windows as the chunk's span needs (count ``nwin``, derived from
    ``dest`` when None) — the build is EXACT for any density, and w is
    purely a performance tune (MXU compare passes scale with it).

    ``with_moments=True`` (requires ``q > 0`` and ``cell_ids``, the
    non-decreasing linear cell id per sorted row) additionally returns
    ``(11, d³)`` per-cell moment sums [m, m·xr(3), m·xr⊗xr(6), count]
    about cell centers — the Barnes-Hut finest-level multipoles plus an
    exact occupancy count, accumulated on the MXU from the SAME source
    windows the placement pass already DMAs (the separate
    monotone_segment_sum moments pass cost ~10 ms/step at 1M). Keyed on
    the cell id, not the slot dest, so k-overflow rows still contribute:
    moments are exact at any density. Returns (tiles, moments) then.

    ``with_coverage=True`` returns 6 channel rows instead of 4: row 4 is
    the placed dest-id channel (unused by callers) and row 5 the EXACT
    occupancy mask (1.0 where a source row was placed, 0.0 filler) that
    the kernel accumulates anyway for its filler merge — table-resident
    stepping (ops/table_step.py) uses it to mask empty slots without
    assuming mass > 0.

    ``extra`` (N, E<=8) places E more per-row channels (velocity, tags,
    …) through the SAME one-hot in the SAME kernel pass, returned as a
    trailing (E, d³·k) array. The placement matmul's M axis pads to a
    full 128-row MXU tile either way, so the extra channels ride the
    pass for free — fusing what was a second full kernel launch (its
    window DMAs and its R×W one-hot construction) into this one. Empty
    slots get exact 0.0 in every extra channel.
    """
    if q != 0 and q * k != r:
        raise ValueError(f"slot-major layout needs q*k == r, got {(q, k, r)}")
    if with_moments and (q == 0 or cell_ids is None):
        raise ValueError("with_moments requires q > 0 and cell_ids")
    if w % 128 != 0:
        raise ValueError(f"window must be 128-aligned, got w={w}")
    n = psort.shape[0]
    m = d * d * d * k
    if m % r == 0:
        n_chunks = m // r
    else:
        raise ValueError(
            f"chunk size r={r} must divide d³·k = {d}³·{k} = {m}"
        )
    if m >= (1 << 24):
        raise ValueError(
            f"dest ids ride in f32 (exact to 2^24): d³·k = {m} too large — "
            "use the XLA tile build for grids this size"
        )

    if nonempty is None or nwin is None:
        # Overflow-sentinel rows interleave with real dests (NOT sorted):
        # search the monotone envelope — see monotone_segment_sum.
        denv = jax.lax.cummax(
            jnp.where(dest < (1 << 24), dest, dest.dtype.type(-1))
        )
        bounds = jnp.arange(n_chunks + 1, dtype=dest.dtype) * r
        idx = jnp.searchsorted(denv, bounds, side="left")
        if nonempty is None:
            nonempty = idx[1:] > idx[:-1]
        if nwin is None:
            span = idx[1:] - (src_starts // 128) * 128
            nwin = -(-span // w)
    nonempty = nonempty.astype(jnp.int32)
    nwin = jnp.maximum(nwin.astype(jnp.int32), 1)

    cols_pad = -(-(n + 2 * w + 128) // 128) * 128
    dest_f = jnp.where(
        dest >= (1 << 24), SENTINEL, dest.astype(jnp.float32)
    )
    # Build channel-major by STACKING rows — a concat(...).T would cost
    # an XLA transpose pass over the whole array (~1.7 GB/s measured).
    if with_moments:
        cid_row = cell_ids.astype(jnp.float32)
    else:
        cid_row = jnp.zeros((n,), jnp.float32)
    e_ch = 0 if extra is None else int(extra.shape[1])
    if e_ch > 8:
        raise ValueError(f"at most 8 extra channels, got {e_ch}")
    n_ch = 8 if e_ch == 0 else 16
    rows = [
        psort[:, 0],
        psort[:, 1],
        psort[:, 2],
        psort[:, 3],
        dest_f,
        jnp.ones((n,), jnp.float32),
        cid_row,
        jnp.zeros((n,), jnp.float32),
    ]
    if e_ch:
        zrow = jnp.zeros((n,), jnp.float32)
        rows += [extra[:, i] for i in range(e_ch)]
        rows += [zrow] * (8 - e_ch)
    src = jnp.stack(rows, axis=0)  # (n_ch, N)
    # padded tail: dest stays 0-filled — but dest 0 is real; overwrite
    # the dest channel's pad with the sentinel, and likewise the cell-id
    # channel (a 0-filled pad row would otherwise COUNT into cell 0's
    # moments — mass 0 protects the mass channels but not the count).
    src = jnp.pad(src, ((0, 0), (0, cols_pad - n)))
    src = src.at[4, n:].set(SENTINEL)
    if with_moments:
        src = src.at[6, n:].set(SENTINEL)

    geom = jnp.zeros((1, 128), jnp.float32)
    geom = geom.at[0, :3].set(lo.astype(jnp.float32))
    geom = geom.at[0, 3].set(jnp.asarray(cell, jnp.float32))

    starts128 = jnp.clip(src_starts // 128, 0, (cols_pad - 2 * w) // 128)

    qp = -(-q // 128) * 128 if with_moments else 0
    out_specs = pl.BlockSpec((n_ch, r), lambda i, *_: (0, i))
    out_shape = jax.ShapeDtypeStruct((n_ch, m), jnp.float32)
    if with_moments:
        out_specs = [
            out_specs,
            pl.BlockSpec((16, qp), lambda i, *_: (0, i)),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((16, n_chunks * qp), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, r=r, w=w, k=k, d=d, q=q, qp=qp, split3=split3,
            with_moments=with_moments, n_ch=n_ch,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_chunks * (r * w * (10 + e_ch)),
            bytes_accessed=n_chunks * (w * n_ch + n_ch * r) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts128, nonempty, nwin, geom, src)
    nch = 6 if with_coverage else 4
    if with_moments:
        tiles, mom = out
        # n_chunks · q == d³ exactly (q = r/k whole cells per chunk).
        mom = (
            mom.reshape(16, n_chunks, qp)[:11, :, :q]
            .reshape(11, n_chunks * q)
        )
        if e_ch:
            return tiles[:nch], mom, tiles[8:8 + e_ch]
        return tiles[:nch], mom
    if e_ch:
        return out[:nch], out[8:8 + e_ch]
    return out[:nch]
