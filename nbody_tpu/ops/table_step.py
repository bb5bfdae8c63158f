"""Table-resident frozen-grid stepping — Verlet steps that never leave
the tile-table layout between re-sorts.

The sorted-state pipeline (ops/integrator.make_resort_multi_step) already
amortizes the per-step argsort, but its FROZEN step still pays the slot
placement (~4 ms at 1M), the pickup transpose + row gather (~7.3 ms) and
row-space elementwise every step — a measured 24.9 ms/step at 1M vs the
36.8 ms full re-sort (round-4 hardware bisect). All of that exists only
because state returns to ROW layout between steps.

Here the integration state LIVES in the sweep kernel's own plane-major
slot layout across frozen steps:

    pos_t:  (d, 4, k, L)  [x, y, z, mass]  — IS the sweep input
    vel_t:  (d, 3, k, L)
    acc_t:  (d, 3, k, L)                   — IS the sweep output layout

(L = the sweep's padded lane count, pallas_tile_near.sweep_lane_geometry;
at the production d = 64 it equals d² exactly.) A frozen step is then:
drift (elementwise, any layout) → finest moments from the table (one
k-axis reduction; only Barnes-Hut) → pyramid + far grids (unchanged) →
sweep (consumes pos_t directly, emits acc in the same layout) → kick.
No sort, no placement, no pickup — the only per-step data movement is
the sweep itself.

Empty slots are inert by construction: the placement kernel parks them
at their cell center with mass 0 (they exert nothing), and the EXACT
coverage channel the kernel accumulates for its filler merge
(pallas_scatter.monotone_scatter_tiles with_coverage) masks their
velocity/acceleration to zero so they never move — no ``mass > 0``
assumption.

Rows past the k-slot cap (the Poisson tail of dense cells, audited —
same graceful-degradation class as the reference's traversal stack cap,
force_barnes_hut.cu:166-171) cannot live in the table; they ride a
STATIC side buffer rebuilt at each re-sort from the fused moments' exact
per-cell counts in O(d³ + cap) work, integrate with the far expansion's
A term at their frozen cell center (exactly today's fused overflow
fallback, ops/tile_sweep._slot_pickup_raw), and contribute their mass to
the finest moments through a tiny scatter-add so the far field stays
mass-exact. ``side_over`` audits rows beyond the side capacity (they
degrade to reading slot k-1's state — size ``side_cap`` above the
audited overflow of the scene; the 1M bench scene overflows 317 rows).

Like the row-space cadence, accuracy between re-sorts is SCENE-DEPENDENT
(stale near-window center / expansion cell for boundary-crossing rows);
the adaptive driver here audits staleness BEFORE each step's force
evaluation (the positions the force will actually see) and re-sorts via
``lax.cond`` when the crossing fraction exceeds the threshold — unlike
the lagged post-hoc audit of integrator.make_adaptive_multi_step, no
above-threshold frozen step is ever taken.

The reference re-sorts every step (Thrust, force_barnes_hut.cu:276-280);
this whole module is a TPU-build extension with no CUDA counterpart.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from nbody_tpu.state import ParticleState

_F32_EXACT = 1 << 24


@dataclasses.dataclass(frozen=True)
class TableParams:
    """Static configuration of a table-resident engine (closed over by
    the step factories — changing any field rebuilds the jitted step,
    same facade semantics as ops/forces.py)."""

    mode: str                 # "bh" | "hash"
    d: int
    k: int
    G: float
    softening: float
    ws: int
    impl: str                 # "pallas" | "pallas_interpret"
    levels: int = 0           # bh only
    cutoff2: float | None = None  # hash only
    cell_size: float | None = None  # hash only (fixed cell width)
    side_cap: int = 4096
    chunk: int = 512

    @property
    def interpret(self) -> bool:
        return self.impl == "pallas_interpret"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TableState:
    """Integration state in plane-major slot layout (+ overflow side
    buffer). ``idx_ext`` maps each sorted row to its row in the
    extraction table concat([(d³·k, ·) table rows, (cap, ·) side rows]);
    ``tag_t`` carries each slot's original row index as an exact float
    (N < 2²⁴)."""

    pos_t: jax.Array      # (d, 4, k, L) [x, y, z, mass]
    vel_t: jax.Array      # (d, 3, k, L)
    acc_t: jax.Array      # (d, 3, k, L) G-scaled
    cov_t: jax.Array      # (d, 1, k, L) 1.0 where occupied
    tag_t: jax.Array      # (d, 1, k, L) original row index (exact f32)
    rowid_t: jax.Array    # (d, 1, k, L) last-rebuild sorted-row index
    #                       (exact f32) — lets the repair step update
    #                       idx_ext for relocated rows without a rebuild
    idx_ext: jax.Array    # (N,) i32
    side: jax.Array       # (cap, 8) [x, y, z, m, vx, vy, vz, tag]
    side_cell: jax.Array  # (cap,) i32 frozen cell id
    side_acc: jax.Array   # (cap, 3) G-scaled
    side_valid: jax.Array  # (cap,) f32 1.0 for live side rows
    side_over: jax.Array  # () i32 audit: overflow rows beyond side_cap
    lo: jax.Array         # (3,) grid origin at last re-sort
    cell: jax.Array       # () cell width at last re-sort
    time: jax.Array       # ()


# ---------------------------------------------------------------------------
# geometry / bookkeeping helpers
# ---------------------------------------------------------------------------


def _lane_geom(p: TableParams):
    from nbody_tpu.ops.pallas_tile_near import sweep_lane_geometry

    c, nc, L = sweep_lane_geometry(p.d, p.chunk)
    return p.d * p.d, L


def _bin_ids(pos3, lo, cell, p: TableParams):
    """Linear cell ids — the EXACT binning formula of each engine
    (barnes_hut._barnes_hut_forces / spatial_hash._spatial_hash_tiles_
    sorted), so table-mode assignments match the row engines bit for
    bit."""
    d = p.d
    if p.mode == "bh":
        cs = jnp.clip(((pos3 - lo) / cell).astype(jnp.int32), 0, d - 1)
    else:
        cs = jnp.clip(
            jnp.floor((pos3 - lo) / cell).astype(jnp.int32), 0, d - 1
        )
    return (cs[..., 0] * d + cs[..., 1]) * d + cs[..., 2]


def _grid_geometry(pos3, p: TableParams):
    if p.mode == "bh":
        from nbody_tpu.ops.barnes_hut import pyramid_geometry

        return pyramid_geometry(
            jnp.min(pos3, axis=0), jnp.max(pos3, axis=0), p.levels
        )
    lo = jnp.min(pos3, axis=0)
    return lo, jnp.asarray(p.cell_size, pos3.dtype)


def _chunk_bookkeeping(ids_s, rank_s, p: TableParams):
    """dest ids + per-chunk source windows for the one-hot placement —
    the same derivation as tile_sweep.tile_build_pallas (shared so the
    two scatter calls here see identical windows)."""
    from nbody_tpu.ops.sorted_window import cell_starts_at

    d, k = p.d, p.k
    num_cells = d * d * d
    g = 128 // math.gcd(d * k, 128)
    r = g * d * k
    q = r // k
    w = 640 if q <= 64 else -(-(q * 10) // 128) * 128
    dest = jnp.where(rank_s < k, ids_s * k + rank_s, 1 << 24)
    n_chunks = num_cells * k // r
    chunk_ar = jnp.arange(n_chunks, dtype=jnp.int32)
    c0 = (chunk_ar * r) // k
    c1 = jnp.minimum(((chunk_ar + 1) * r + k - 1) // k, num_cells)
    starts = cell_starts_at(ids_s, c0)
    ends = cell_starts_at(ids_s, c1)
    span = ends - (starts // 128) * 128
    nwin = -(-span // w)
    nonempty = ends > starts
    return dict(
        dest=dest, starts=starts, nonempty=nonempty, nwin=nwin,
        r=r, q=q, w=w, g=g,
    )


def _relayout_plane(tiles_cm, nch: int, p: TableParams, g: int):
    """(nch, d³·k) slot-major chunk blocks → (d, nch, k, L) plane-major,
    lane-padded to the sweep geometry (tile_sweep.tile_build_pallas's
    one relayout, generalized over channel count)."""
    d, k = p.d, p.k
    l, L = _lane_geom(p)
    t = (
        tiles_cm.reshape(nch, d, d // g, k, g, d)
        .transpose(1, 0, 3, 2, 4, 5)
        .reshape(d, nch, k, l)
    )
    if L != l:
        t = jnp.pad(t, [(0, 0), (0, 0), (0, 0), (0, L - l)])
    return t


def _lane_centers(lo, cell, p: TableParams, dtype):
    """Per-slot cell-center coordinates in table layout: plane-major x
    (d, 1, 1, 1) and lane-major y/z (1, 1, 1, L)."""
    d = p.d
    l, L = _lane_geom(p)
    lane = jnp.arange(L, dtype=jnp.int32)
    cy = lane // d
    cz = lane % d
    cx = jnp.arange(d, dtype=jnp.int32)
    fx = (lo[0] + (cx.astype(dtype) + 0.5) * cell).reshape(d, 1, 1, 1)
    fy = (lo[1] + (cy.astype(dtype) + 0.5) * cell).reshape(1, 1, 1, L)
    fz = (lo[2] + (cz.astype(dtype) + 0.5) * cell).reshape(1, 1, 1, L)
    return fx, fy, fz


def _static_cell_ids(p: TableParams):
    """Each table slot's own linear cell id (d, 1, 1, L) plus a lane
    validity mask (pad lanes past d² excluded)."""
    d = p.d
    l, L = _lane_geom(p)
    lane = jnp.arange(L, dtype=jnp.int32)
    yz = (lane // d) * d + (lane % d)
    x = jnp.arange(d, dtype=jnp.int32) * (d * d)
    lin = x.reshape(d, 1, 1, 1) + yz.reshape(1, 1, 1, L)
    valid = (lane < l).reshape(1, 1, 1, L)
    return lin, valid


# ---------------------------------------------------------------------------
# far field (Barnes-Hut)
# ---------------------------------------------------------------------------


def _far_grids(packed, lo, cell, p: TableParams):
    """packed (d,d,d,10) finest moments → (far_plane (d, C, d²) UNSCALED,
    far_a (d³, 3)) — the far path of barnes_hut._fused_bh_force_from_grid
    plus the overflow fallback table of tile_sweep.tile_sweep_pick."""
    from nbody_tpu.ops.barnes_hut import far_field_grid, pyramid_from_packed

    d = p.d
    pyr = pyramid_from_packed(packed, lo, cell, p.levels, 2)
    a_far, j_far, h_far = far_field_grid(
        pyr, p.ws, 1.0, p.softening, p.levels, impl=p.impl
    )
    parts = [a_far, j_far] + ([h_far] if h_far is not None else [])
    packed_g = jnp.concatenate(parts, axis=-1)
    far_plane = packed_g.reshape(d, d * d, packed_g.shape[-1]).transpose(
        0, 2, 1
    )
    far_a = far_plane[:, 0:3, :].transpose(0, 2, 1).reshape(d * d * d, 3)
    return far_plane, far_a


def _table_moments(pos_d_t, cov_t, side_pd, side_cell, side_valid, lo,
                   cell, p: TableParams):
    """Finest-level order-2 moments from the CURRENT table positions
    about the FROZEN cell centers — the frozen-step replacement for the
    placement kernel's fused moments (pallas_scatter window_moments
    channel order: [m, m·xr, m·yr, m·zr, m·xr², m·yr², m·zr², m·xr·yr,
    m·xr·zr, m·yr·zr]), plus the side rows' contribution so the far
    field keeps every row's mass. Returns packed (d, d, d, 10)."""
    d = p.d
    l, L = _lane_geom(p)
    fx, fy, fz = _lane_centers(lo, cell, p, pos_d_t.dtype)
    mm = pos_d_t[:, 3:4]
    xr = pos_d_t[:, 0:1] - fx
    yr = pos_d_t[:, 1:2] - fy
    zr = pos_d_t[:, 2:3] - fz
    mom = jnp.concatenate(
        [
            mm, mm * xr, mm * yr, mm * zr,
            mm * (xr * xr), mm * (yr * yr), mm * (zr * zr),
            mm * (xr * yr), mm * (xr * zr), mm * (yr * zr),
        ],
        axis=1,
    )  # (d, 10, k, L); empty slots: mass 0 ⇒ zero rows
    mom = jnp.sum(mom, axis=2)  # (d, 10, L)
    if L != l:
        mom = mom[:, :, :l]
    mom_flat = mom.transpose(0, 2, 1).reshape(d * d * d, 10)
    if p.side_cap > 0:
        sc = jnp.clip(side_cell, 0, d * d * d - 1)
        ctr = lo + (
            jnp.stack(
                [sc // (d * d), (sc // d) % d, sc % d], axis=-1
            ).astype(side_pd.dtype)
            + 0.5
        ) * cell
        sm = (side_pd[:, 3] * side_valid)[:, None]
        sxr = side_pd[:, 0:3] - ctr
        svals = jnp.concatenate(
            [
                sm, sm * sxr,
                sm * (sxr * sxr),
                sm * (sxr[:, 0:1] * sxr[:, 1:2]),
                sm * (sxr[:, 0:1] * sxr[:, 2:3]),
                sm * (sxr[:, 1:2] * sxr[:, 2:3]),
            ],
            axis=-1,
        )
        mom_flat = mom_flat.at[sc].add(svals, mode="drop")
    return mom_flat.reshape(d, d, d, 10)


# ---------------------------------------------------------------------------
# core phases
# ---------------------------------------------------------------------------


def _sweep(pos_t, far_plane, lo, cell, p: TableParams):
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas_plane

    return tile_sweep_pallas_plane(
        pos_t, k=p.k, d=p.d, ws=p.ws, eps=p.softening,
        chunk=p.chunk, cutoff2=p.cutoff2,
        far_plane=far_plane, lo=lo, cell=cell,
        interpret=p.interpret,
    )  # (d, 3, k, L) unscaled


def _drift(ts: TableState, dt, p: TableParams):
    """Position drift + first half-kick, in table layout (empty slots
    have vel = acc = 0 and stay parked at their cell centers)."""
    dtc = jnp.asarray(dt, ts.pos_t.dtype)
    pos3 = ts.pos_t[:, 0:3]
    pos_d3 = pos3 + ts.vel_t * dtc + (0.5 * dtc * dtc) * ts.acc_t
    pos_d_t = jnp.concatenate([pos_d3, ts.pos_t[:, 3:4]], axis=1)
    vel_h = ts.vel_t + (0.5 * dtc) * ts.acc_t
    sp = (
        ts.side[:, 0:3] + ts.side[:, 4:7] * dtc
        + (0.5 * dtc * dtc) * ts.side_acc
    )
    svh = ts.side[:, 4:7] + (0.5 * dtc) * ts.side_acc
    side_pd = jnp.concatenate(
        [sp, ts.side[:, 3:4], svh, ts.side[:, 7:8]], axis=-1
    )
    return pos_d_t, vel_h, side_pd


def _audit(pos_d_t, side_pd, ts: TableState, p: TableParams):
    """Stale-assignment count of the DRIFTED positions vs the frozen
    binning — evaluated BEFORE the force so the adaptive driver can
    re-sort instead of taking an above-threshold frozen step."""
    lin, lane_valid = _static_cell_ids(p)
    ids_now = _bin_ids(
        jnp.moveaxis(pos_d_t[:, 0:3], 1, -1), ts.lo, ts.cell, p
    )  # (d, k, L)
    stale_t = (
        (ids_now != lin[:, 0]) & lane_valid[:, 0]
        & (ts.cov_t[:, 0] > 0.0)
    )
    n_stale = jnp.sum(stale_t.astype(jnp.int32))
    if p.side_cap > 0:
        ids_side = _bin_ids(side_pd[:, 0:3], ts.lo, ts.cell, p)
        n_stale = n_stale + jnp.sum(
            ((ids_side != ts.side_cell) & (ts.side_valid > 0.0)).astype(
                jnp.int32
            )
        )
    return n_stale


def _extract(ts: TableState, pos_d_t, vel_h, side_pd, p: TableParams):
    """Drifted table + side → (N, 8) rows [pos_d, m, vel_h, tag] in the
    LAST re-sort's row order (one relayout transpose + one row gather —
    paid on re-sort steps only)."""
    d, k = p.d, p.k
    l, L = _lane_geom(p)
    ext = jnp.concatenate([pos_d_t, vel_h, ts.tag_t], axis=1)
    if L != l:
        ext = ext[:, :, :, :l]
    ext = (
        ext.reshape(d, 8, k, d, d)
        .transpose(0, 3, 4, 2, 1)
        .reshape(d * d * d * k, 8)
    )
    if p.side_cap > 0:
        ext = jnp.concatenate([ext, side_pd], axis=0)
    return ext[ts.idx_ext]


def _frozen_force_and_kick(ts: TableState, pos_d_t, vel_h, side_pd, dt,
                           p: TableParams) -> TableState:
    """Force on the frozen assignment + second half-kick — the frozen
    step's tail after ``_drift``."""
    dtc = jnp.asarray(dt, pos_d_t.dtype)
    if p.mode == "bh":
        packed = _table_moments(
            pos_d_t, ts.cov_t, side_pd, ts.side_cell, ts.side_valid,
            ts.lo, ts.cell, p,
        )
        far_plane, far_a = _far_grids(packed, ts.lo, ts.cell, p)
    else:
        far_plane, far_a = None, None
    raw = _sweep(pos_d_t, far_plane, ts.lo, ts.cell, p)
    acc_t = p.G * (ts.cov_t * raw)
    vel_t = vel_h + (0.5 * dtc) * acc_t
    if p.side_cap > 0:
        if far_a is not None:
            sacc = p.G * (
                far_a[jnp.clip(ts.side_cell, 0, p.d ** 3 - 1)]
                * ts.side_valid[:, None]
            )
        else:
            sacc = jnp.zeros_like(ts.side_acc)
        svel = side_pd[:, 4:7] + (0.5 * dtc) * sacc
        side = jnp.concatenate(
            [side_pd[:, 0:4], svel, side_pd[:, 7:8]], axis=-1
        )
    else:
        sacc, side = ts.side_acc, side_pd
    return dataclasses.replace(
        ts, pos_t=pos_d_t, vel_t=vel_t, acc_t=acc_t,
        side=side, side_acc=sacc, time=ts.time + dtc,
    )


def _sort_build(rows, prev_time, dt, p: TableParams) -> TableState:
    """(N, 8) drifted+half-kicked rows [pos_d, m, vel_h, tag] (any row
    order) → fresh TableState: bin → argsort → ONE 8-wide payload gather
    → two one-hot placements (pos+mass fused with moments/coverage,
    vel+tag) → far grids → sweep → second half-kick → side rebuild."""
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.sorted_window import cell_starts_at, sorted_ranks

    d, k = p.d, p.k
    n = rows.shape[0]
    num_cells = d * d * d
    dtc = jnp.asarray(dt, rows.dtype)
    lo, cell = _grid_geometry(rows[:, 0:3], p)
    ids = _bin_ids(rows[:, 0:3], lo, cell, p)
    order = jnp.argsort(ids).astype(jnp.int32)
    # ONE 9-column row gather: the cell id rides as an f32 VALUE column
    # (ids < d³ ≤ 2²⁴ are exactly representable — a value cast, NOT the
    # denormal-hazard bitcast), measured 4.8 ms/step cheaper than a
    # separate int32 ids gather at 1M (scripts/profile_r5h.py g0/g1).
    pay9 = jnp.concatenate(
        [rows, ids.astype(rows.dtype)[:, None]], axis=-1
    )[order]
    pay = pay9[:, :8]
    ids_s = pay9[:, 8].astype(jnp.int32)
    rank_s = sorted_ranks(ids_s)
    bk = _chunk_bookkeeping(ids_s, rank_s, p)

    # ONE fused placement pass: pos+mass (with moments/coverage) AND
    # vel+tag+rowid ride the same one-hot — the M axis of the placement
    # matmul pads to a 128-row MXU tile either way, so the second
    # kernel launch (its DMAs + its R×W one-hot) was pure overhead.
    # rowid (the sorted row position, exact f32 < 2²⁴) is what lets the
    # repair step relocate rows without rebuilding idx_ext.
    rowid_col = jnp.arange(n, dtype=rows.dtype)[:, None]
    tiles6, moments, tiles_x = monotone_scatter_tiles(
        pay[:, 0:4], bk["dest"], bk["starts"], lo, cell,
        k=k, d=d, r=bk["r"], w=bk["w"], q=bk["q"],
        nonempty=bk["nonempty"], nwin=bk["nwin"],
        interpret=p.interpret, with_moments=True, cell_ids=ids_s,
        with_coverage=True,
        extra=jnp.concatenate([pay[:, 4:8], rowid_col], axis=-1),
    )
    plane6 = _relayout_plane(tiles6, 6, p, bk["g"])
    pos_t = plane6[:, 0:4]
    cov_t = plane6[:, 5:6]
    plane_x = _relayout_plane(tiles_x, 5, p, bk["g"])
    vel_h_t = plane_x[:, 0:3] * cov_t
    tag_t = plane_x[:, 3:4]
    rowid_t = plane_x[:, 4:5]

    # --- side buffer: overflow rows from the EXACT per-cell counts ----
    counts = moments[10]
    ovf = jnp.maximum(counts - float(k), 0.0).astype(jnp.int32)
    inc = jnp.cumsum(ovf)
    total = inc[-1]
    cap = p.side_cap
    if cap > 0:
        j = jnp.arange(cap, dtype=jnp.int32)
        cellj = jnp.searchsorted(inc, j, side="right").astype(jnp.int32)
        cellj_c = jnp.clip(cellj, 0, num_cells - 1)
        before = inc[cellj_c] - ovf[cellj_c]
        start_c = cell_starts_at(ids_s, cellj_c)
        valid = j < total
        side_row = jnp.where(valid, start_c + k + (j - before), n)
        side_pd = pay[jnp.clip(side_row, 0, n - 1)] * (
            valid[:, None].astype(pay.dtype)
        )
        side_cell = jnp.where(valid, cellj_c, num_cells - 1)
        side_valid = valid.astype(pay.dtype)
    else:
        side_row = jnp.zeros((0,), jnp.int32)
        side_pd = jnp.zeros((0, 8), rows.dtype)
        side_cell = jnp.zeros((0,), jnp.int32)
        side_valid = jnp.zeros((0,), rows.dtype)
    side_over = jnp.maximum(total - cap, 0).astype(jnp.int32)

    # Overflow rows BEYOND the side capacity degrade to reading slot
    # k-1 of their OWN cell (the documented bounded-error contract in
    # the module docstring) — pointing them at slot 0 globally would
    # teleport them into cell (0,0,0), which on a collapsing scene
    # (side overflow ≫ side_cap) builds an unphysical point mass there
    # and blows the run up within a few re-sorts.
    idx_ext = jnp.where(
        rank_s < k, ids_s * k + rank_s, ids_s * k + (k - 1)
    ).astype(jnp.int32)
    if cap > 0:
        idx_ext = idx_ext.at[side_row].set(
            num_cells * k + jnp.arange(cap, dtype=jnp.int32), mode="drop"
        )

    # --- far field + sweep + second half-kick ------------------------
    if p.mode == "bh":
        packed = moments[:10].T.reshape(d, d, d, 10)
        far_plane, far_a = _far_grids(packed, lo, cell, p)
    else:
        far_plane, far_a = None, None
    raw = _sweep(pos_t, far_plane, lo, cell, p)
    acc_t = p.G * (cov_t * raw)
    vel_t = vel_h_t + (0.5 * dtc) * acc_t
    if cap > 0:
        if far_a is not None:
            sacc = p.G * (far_a[side_cell] * side_valid[:, None])
        else:
            sacc = jnp.zeros((cap, 3), rows.dtype)
        svel = side_pd[:, 4:7] + (0.5 * dtc) * sacc
        side = jnp.concatenate(
            [side_pd[:, 0:4], svel, side_pd[:, 7:8]], axis=-1
        )
    else:
        sacc = jnp.zeros((0, 3), rows.dtype)
        side = side_pd

    return TableState(
        pos_t=pos_t, vel_t=vel_t, acc_t=acc_t, cov_t=cov_t, tag_t=tag_t,
        rowid_t=rowid_t,
        idx_ext=idx_ext, side=side, side_cell=side_cell, side_acc=sacc,
        side_valid=side_valid, side_over=side_over,
        lo=lo, cell=cell, time=prev_time + dtc,
    )


# ---------------------------------------------------------------------------
# step drivers
# ---------------------------------------------------------------------------


def _entry(state: ParticleState, dt, p: TableParams) -> TableState:
    """First step: drift in row space (state.acc must hold a(t), see
    integrator.initialize_forces) then sort+build — the same arithmetic
    as integrator.make_resort_multi_step's sorted step."""
    n = state.pos.shape[0]
    dtc = jnp.asarray(dt, state.pos.dtype)
    pos_d = state.pos + state.vel * dtc + (0.5 * dtc * dtc) * state.acc
    vel_h = state.vel + (0.5 * dtc) * state.acc
    tagf = jnp.arange(n, dtype=state.pos.dtype)[:, None]
    rows = jnp.concatenate(
        [pos_d, state.mass[:, None], vel_h, tagf], axis=-1
    )
    return _sort_build(rows, state.time, dt, p)


def _table_sorted_step(ts: TableState, dt, p: TableParams) -> TableState:
    pos_d_t, vel_h, side_pd = _drift(ts, dt, p)
    rows = _extract(ts, pos_d_t, vel_h, side_pd, p)
    return _sort_build(rows, ts.time, dt, p)


def _table_frozen_step(ts: TableState, dt, p: TableParams) -> TableState:
    pos_d_t, vel_h, side_pd = _drift(ts, dt, p)
    return _frozen_force_and_kick(ts, pos_d_t, vel_h, side_pd, dt, p)


def _mover_bookkeeping(tgt_s, p: TableParams, w: int):
    """Chunk windows over the SORTED mover targets — the same chunk
    geometry as ``_chunk_bookkeeping`` but against the (small) mover
    array, so the placement kernel skips every chunk no mover lands
    in."""
    from nbody_tpu.ops.sorted_window import cell_starts_at

    d, k = p.d, p.k
    num_cells = d * d * d
    g = 128 // math.gcd(d * k, 128)
    r = g * d * k
    q = r // k
    n_chunks = num_cells * k // r
    chunk_ar = jnp.arange(n_chunks, dtype=jnp.int32)
    c0 = (chunk_ar * r) // k
    c1 = jnp.minimum(((chunk_ar + 1) * r + k - 1) // k, num_cells)
    starts = cell_starts_at(tgt_s, c0)
    ends = cell_starts_at(tgt_s, c1)
    span = ends - (starts // 128) * 128
    return dict(
        starts=starts, nonempty=ends > starts, nwin=-(-span // w),
        r=r, q=q, g=g,
    )


def _repair_step(ts: TableState, pos_d_t, vel_h, side_pd, stale,
                 ids_now, dt, p: TableParams, cap: int) -> TableState:
    """EXACT-assignment incremental step: relocate only the (≤ cap)
    rows whose cell binning changed, leaving everything else in place —
    no sort, no extract, no full placement. The TPU shape of an
    incremental grid update: audit mask → ``nonzero`` compaction →
    high-water-mark slot assignment → monotone one-hot insert (the
    placement kernel skips chunks without arrivals) → ONE fused
    elementwise merge over the table.

    Degradations (all audited, all self-correcting):
      * arrivals to a cell whose high-water mark reached k are DENIED —
        the row keeps its old (stale) slot, keeps counting in the
        driver's stale audit, and retries next step; accumulating
        leftovers push the audit over the rebuild threshold.
      * freed slots are not compacted (the high-water mark only grows
        between rebuilds) — fragmentation, like denial, drives the
        audit toward a rebuild.
      * side rows never join the table here; their frozen cell id is
        re-binned so the far field stays mass-exact.

    No CUDA counterpart: the reference re-sorts every step
    (force_barnes_hut.cu:276-280)."""
    d, k = p.d, p.k
    l, L = _lane_geom(p)
    num_cells = d * d * d
    dtc = jnp.asarray(dt, pos_d_t.dtype)
    fdt = pos_d_t.dtype

    # --- compact the movers -------------------------------------------
    stale_flat = stale.reshape(-1)
    mov = jnp.nonzero(stale_flat, size=cap, fill_value=d * k * L)[0]
    mov = mov.astype(jnp.int32)
    val = mov < d * k * L
    movc = jnp.where(val, mov, 0)
    li = movc % L
    ki = (movc // L) % k
    di = movc // (L * k)

    def chan(arr, ch, nch):
        idx = ((di * nch + ch) * k + ki) * L + li
        return arr.reshape(-1)[idx] * val.astype(fdt)

    cols = [chan(pos_d_t, c, 4) for c in range(4)]
    cols += [chan(vel_h, c, 3) for c in range(3)]
    cols += [chan(ts.tag_t, 0, 1), chan(ts.rowid_t, 0, 1)]
    rows_mov = jnp.stack(cols, axis=-1)          # (cap, 9)
    tgt = ids_now.reshape(-1)[movc]

    # --- sort movers by target cell, rank them ------------------------
    from nbody_tpu.ops.sorted_window import sorted_ranks

    key = jnp.where(val, tgt, jnp.int32(num_cells))
    ordm = jnp.argsort(key).astype(jnp.int32)
    tgt_s = key[ordm]
    rank = sorted_ranks(tgt_s)
    rows_s = rows_mov[ordm]
    val_s = val[ordm]

    # --- free-slot assignment: per-cell high-water mark ---------------
    # Occupied slots are contiguous only at rebuild; repairs punch
    # holes, so arrivals go ABOVE the highest ever-occupied slot — can
    # never collide with a staying row.
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (d, k, L), 1)
    occ = ts.cov_t[:, 0] > 0.0
    hwm = jnp.max(jnp.where(occ, slot_iota + 1, 0), axis=1)  # (d, L)
    hwm_flat = hwm[:, :l].reshape(-1)                        # (d³,)
    base = hwm_flat[jnp.clip(tgt_s, 0, num_cells - 1)]
    slot = base + rank
    fits = val_s & (slot < k) & (tgt_s < num_cells)
    dest = jnp.where(fits, tgt_s * k + slot, jnp.int32(1 << 24))

    # --- insert via the monotone one-hot kernel -----------------------
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles

    bk = _mover_bookkeeping(tgt_s, p, 256)
    ins6, ins_x = monotone_scatter_tiles(
        rows_s[:, 0:4], dest, bk["starts"], ts.lo, ts.cell,
        k=k, d=d, r=bk["r"], w=256, q=bk["q"],
        nonempty=bk["nonempty"], nwin=bk["nwin"],
        interpret=p.interpret, with_coverage=True,
        extra=rows_s[:, 4:9],
    )
    pl6 = _relayout_plane(ins6, 6, p, bk["g"])
    plx = _relayout_plane(ins_x, 5, p, bk["g"])
    icov = pl6[:, 5:6] > 0.0

    # --- removal flags back in table order ----------------------------
    inv = jnp.argsort(ordm).astype(jnp.int32)
    rem_flat = (
        jnp.zeros((d * k * L,), jnp.bool_)
        .at[mov]                      # invalid movers are OOB → dropped
        .set(fits[inv], mode="drop")
    )
    rem = rem_flat.reshape(d, 1, k, L)

    # --- ONE fused merge over the table -------------------------------
    fx, fy, fz = _lane_centers(ts.lo, ts.cell, p, fdt)
    filler = jnp.concatenate(
        [jnp.broadcast_to(fx, (d, 1, k, L)),
         jnp.broadcast_to(fy, (d, 1, k, L)),
         jnp.broadcast_to(fz, (d, 1, k, L)),
         jnp.zeros((d, 1, k, L), fdt)], axis=1,
    )
    pos_new = jnp.where(icov, pl6[:, 0:4], jnp.where(rem, filler,
                                                     pos_d_t))
    vel_new = jnp.where(icov, plx[:, 0:3], jnp.where(rem, 0.0, vel_h))
    tag_new = jnp.where(icov, plx[:, 3:4], jnp.where(rem, 0.0,
                                                     ts.tag_t))
    rid_new = jnp.where(icov, plx[:, 4:5], jnp.where(rem, 0.0,
                                                     ts.rowid_t))
    cov_new = jnp.where(icov, 1.0, jnp.where(rem, 0.0, ts.cov_t))

    # --- idx_ext update for the relocated rows ------------------------
    rid_mov = rows_s[:, 8].astype(jnp.int32)
    idx_ext = ts.idx_ext.at[
        jnp.where(fits, rid_mov, jnp.int32(ts.idx_ext.shape[0]))
    ].set(dest, mode="drop")

    # --- side rows: refresh the frozen cell id ------------------------
    if p.side_cap > 0:
        ids_side = _bin_ids(side_pd[:, 0:3], ts.lo, ts.cell, p)
        side_cell = jnp.where(ts.side_valid > 0.0, ids_side,
                              ts.side_cell)
    else:
        side_cell = ts.side_cell

    merged = dataclasses.replace(
        ts, cov_t=cov_new, tag_t=tag_new, rowid_t=rid_new,
        idx_ext=idx_ext, side_cell=side_cell,
    )
    return _frozen_force_and_kick(merged, pos_new, vel_new, side_pd,
                                  dt, p)


def make_table_repair_multi_step(
    p: TableParams, dt: float, n_steps: int,
    *, repair_cap: int = 32768, max_cadence: int = 64,
    with_trace: bool = False,
):
    """``n_steps`` Verlet steps with EXACT cell assignments at
    incremental cost: every step re-homes the rows whose binning
    changed (``_repair_step``); a FULL rebuild runs only when the
    audited mover count exceeds ``repair_cap`` (the compaction
    capacity — beyond it movers would be silently dropped, so the
    rebuild is mandatory, not advisory) or ``max_cadence`` expires
    (bounding high-water-mark fragmentation and frozen-geometry
    drift). Unlike the adaptive FROZEN driver there is no staleness
    approximation to tune: physics matches re-sort-every-step up to
    slot summation order and the audited denial set.

    ``with_trace=True`` additionally returns per-step
    ``(stale_counts, rebuilt)`` arrays (entry step excluded)."""
    _validate(p)
    if repair_cap < 128:
        raise ValueError("repair_cap must be >= 128")
    if max_cadence < 1:
        raise ValueError("max_cadence must be >= 1")
    lin, lane_valid = _static_cell_ids(p)

    def multi(state: ParticleState):
        n = state.pos.shape[0]
        if n >= _F32_EXACT:
            raise ValueError("table stepping requires N < 2^24")
        ts = _entry(state, dt, p)

        def body(c, _):
            ts, since = c
            pos_d_t, vel_h, side_pd = _drift(ts, dt, p)
            ids_now = _bin_ids(
                jnp.moveaxis(pos_d_t[:, 0:3], 1, -1), ts.lo, ts.cell, p
            )
            stale = (
                (ids_now != lin[:, 0]) & lane_valid[:, 0]
                & (ts.cov_t[:, 0] > 0.0)
            )
            n_stale = jnp.sum(stale.astype(jnp.int32))
            rebuild = (
                (n_stale > repair_cap) | (since >= max_cadence - 1)
            )

            def do_rebuild(args):
                ts, pos_d_t, vel_h, side_pd, _stale, _ids = args
                rows = _extract(ts, pos_d_t, vel_h, side_pd, p)
                return _sort_build(rows, ts.time, dt, p), jnp.int32(0)

            def do_repair(args):
                ts, pos_d_t, vel_h, side_pd, stale, ids_now = args
                return (
                    _repair_step(ts, pos_d_t, vel_h, side_pd, stale,
                                 ids_now, dt, p, repair_cap),
                    since + jnp.int32(1),
                )

            ts, since = jax.lax.cond(
                rebuild, do_rebuild, do_repair,
                (ts, pos_d_t, vel_h, side_pd, stale, ids_now),
            )
            return (ts, since), (n_stale, rebuild)

        if n_steps > 1:
            (ts, _), trace = jax.lax.scan(
                body, (ts, jnp.int32(0)), None, length=n_steps - 1
            )
        else:
            trace = (jnp.zeros((0,), jnp.int32), jnp.zeros((0,), bool))
        out = table_to_particle_state(ts, n, p)
        if with_trace:
            return out, trace
        return out

    return multi


def table_to_particle_state(ts: TableState, n: int,
                            p: TableParams) -> ParticleState:
    """Readout: two extraction gathers (state 8-wide, acc 3-wide) + the
    inverse permutation by the carried tags — original row order out."""
    d, k = p.d, p.k
    l, L = _lane_geom(p)
    ext = jnp.concatenate([ts.pos_t, ts.vel_t, ts.tag_t], axis=1)
    if L != l:
        ext = ext[:, :, :, :l]
    ext = (
        ext.reshape(d, 8, k, d, d)
        .transpose(0, 3, 4, 2, 1)
        .reshape(d * d * d * k, 8)
    )
    ext_a = ts.acc_t if L == l else ts.acc_t[:, :, :, :l]
    ext_a = (
        ext_a.reshape(d, 3, k, d, d)
        .transpose(0, 3, 4, 2, 1)
        .reshape(d * d * d * k, 3)
    )
    if p.side_cap > 0:
        ext = jnp.concatenate([ext, ts.side], axis=0)
        ext_a = jnp.concatenate([ext_a, ts.side_acc], axis=0)
    rows = ext[ts.idx_ext]
    acc_s = ext_a[ts.idx_ext]
    inv = jnp.argsort(rows[:, 7].astype(jnp.int32))
    return ParticleState(
        pos=rows[inv, 0:3], vel=rows[inv, 4:7], acc=acc_s[inv],
        mass=rows[inv, 3], time=ts.time,
    )


def _validate(p: TableParams, resort_every=1):
    from nbody_tpu.ops.tile_sweep import tile_engine_fused

    if p.mode not in ("bh", "hash"):
        raise ValueError(f"unknown table mode {p.mode!r}")
    if not tile_engine_fused(p.d, p.k, p.impl):
        raise ValueError(
            "table-resident stepping requires the fused tiles path "
            f"(d={p.d}, k={p.k}, impl={p.impl!r})"
        )
    if p.mode == "bh" and (1 << p.levels) != p.d:
        raise ValueError("bh mode needs d == 2^levels")
    if resort_every < 1:
        raise ValueError("resort_every must be >= 1")


def make_table_multi_step(p: TableParams, dt: float, n_steps: int,
                          resort_every: int = 1):
    """``n_steps`` Verlet steps, table-resident between re-sorts at a
    FIXED cadence — the table-layout counterpart of
    integrator.make_resort_multi_step (same chunk semantics: the first
    step of every ``resort_every`` block re-sorts). Returns
    ``multi(state: ParticleState) -> ParticleState`` (original row order
    in and out; ``state.acc`` must hold a(t))."""
    _validate(p, resort_every)

    def frozen_body(ts, _):
        return _table_frozen_step(ts, dt, p), None

    def frozen_run(ts, length):
        if length <= 0:
            return ts
        ts, _ = jax.lax.scan(frozen_body, ts, None, length=length)
        return ts

    def multi(state: ParticleState) -> ParticleState:
        n = state.pos.shape[0]
        if n >= _F32_EXACT:
            raise ValueError("table stepping requires N < 2^24")
        ts = _entry(state, dt, p)
        remaining = n_steps - 1
        f1 = min(resort_every - 1, remaining)
        ts = frozen_run(ts, f1)
        remaining -= f1
        n_chunks, rem = divmod(remaining, resort_every)

        def chunk_body(ts, _):
            ts = _table_sorted_step(ts, dt, p)
            return frozen_run(ts, resort_every - 1), None

        if n_chunks > 0:
            ts, _ = jax.lax.scan(chunk_body, ts, None, length=n_chunks)
        if rem:
            ts = _table_sorted_step(ts, dt, p)
            ts = frozen_run(ts, rem - 1)
        return table_to_particle_state(ts, n, p)

    return multi


def make_table_adaptive_multi_step(
    p: TableParams, dt: float, n_steps: int,
    *, max_stale_frac: float = 0.01, max_cadence: int = 16,
    with_trace: bool = False,
):
    """``n_steps`` Verlet steps that re-sort WHEN THE SCENE ASKS, with
    the staleness audit evaluated BEFORE each step's force (on the
    drifted positions that force would see) — the design fix for the
    one-step audit lag of integrator.make_adaptive_multi_step: no frozen
    step above ``max_stale_frac`` is ever taken, so the realized error
    bound is the threshold itself. ``with_trace=True`` also returns the
    per-step ``(stale_counts, resorted)`` arrays (entry step excluded).
    """
    _validate(p)
    if not 0.0 <= max_stale_frac <= 1.0:
        raise ValueError("max_stale_frac must be in [0, 1]")
    if max_cadence < 1:
        raise ValueError("max_cadence must be >= 1")

    def multi(state: ParticleState):
        n = state.pos.shape[0]
        if n >= _F32_EXACT:
            raise ValueError("table stepping requires N < 2^24")
        stale_cap = jnp.int32(int(max_stale_frac * n))
        ts = _entry(state, dt, p)

        def body(c, _):
            ts, since = c
            pos_d_t, vel_h, side_pd = _drift(ts, dt, p)
            stale = _audit(pos_d_t, side_pd, ts, p)
            resort = (stale > stale_cap) | (since >= max_cadence - 1)

            def do_sorted(args):
                ts, pos_d_t, vel_h, side_pd = args
                rows = _extract(ts, pos_d_t, vel_h, side_pd, p)
                return _sort_build(rows, ts.time, dt, p), jnp.int32(0)

            def do_frozen(args):
                ts, pos_d_t, vel_h, side_pd = args
                return (
                    _frozen_force_and_kick(
                        ts, pos_d_t, vel_h, side_pd, dt, p
                    ),
                    since + jnp.int32(1),
                )

            ts, since = jax.lax.cond(
                resort, do_sorted, do_frozen,
                (ts, pos_d_t, vel_h, side_pd),
            )
            return (ts, since), (stale, resort)

        if n_steps > 1:
            (ts, _), trace = jax.lax.scan(
                body, (ts, jnp.int32(0)), None, length=n_steps - 1
            )
        else:
            trace = (jnp.zeros((0,), jnp.int32), jnp.zeros((0,), bool))
        out = table_to_particle_state(ts, n, p)
        if with_trace:
            return out, trace
        return out

    return multi


# ---------------------------------------------------------------------------
# engine param builders
# ---------------------------------------------------------------------------


def bh_table_params(
    G=1.0, softening=0.1, theta=0.5, *, levels=6, near_k=16,
    impl=None, side_cap=4096,
) -> TableParams:
    """TableParams for the Barnes-Hut fused tiles engine (same knobs as
    ops/barnes_hut.make_barnes_hut_forces_sorted; multipole order 2)."""
    from nbody_tpu.ops.barnes_hut import resolve_impl, theta_to_ws

    if impl is None:
        impl = resolve_impl("NBODY_PALLAS_NEAR")
    if impl == "xla":
        impl = "pallas_interpret"
    return TableParams(
        mode="bh", d=1 << levels, k=near_k, G=float(G),
        softening=float(softening),
        ws=theta_to_ws(theta, order=2), impl=impl, levels=levels,
        side_cap=side_cap,
    )


def hash_table_params(
    G=1.0, softening=0.1, *, cutoff=2.0, cell_size=1.0, d=64, k=8,
    impl=None, side_cap=4096,
) -> TableParams:
    """TableParams for the spatial-hash tiles engine (same knobs as
    ops/spatial_hash.spatial_hash_forces_tiles_sorted; ws = 1, cutoff²
    pair predicate, no far field — overflow side rows get zero force,
    the engine's existing k-cap contract)."""
    from nbody_tpu.ops.barnes_hut import resolve_impl

    if impl is None:
        impl = resolve_impl("NBODY_PALLAS_NEAR")
    if impl == "xla":
        impl = "pallas_interpret"
    return TableParams(
        mode="hash", d=d, k=k, G=float(G), softening=float(softening),
        ws=1, impl=impl, cutoff2=float(cutoff) * float(cutoff),
        cell_size=float(cell_size), side_cap=side_cap,
    )
