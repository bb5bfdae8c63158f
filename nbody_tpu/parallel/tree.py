"""Distributed Barnes-Hut and spatial-hash forces — designed comm patterns.

The reference is single-GPU; its build pipelines imply distinct
communication patterns per method (reference: force_spatial_hash.cu:235-303
builds a global sorted grid, force_barnes_hut.cu:282-289 a global octree).
This module is the multi-chip layer those pipelines never had, designed for
the ICI ring rather than inferred by the SPMD partitioner:

  1. **psum-combined pyramid** (far field): every device scatter-adds its
     LOCAL particles' moments into the full finest-level grid, then ONE
     ``psum`` replicates the exact global moments — scatter-add commutes
     with the device sum. The upward pass and per-level far sweeps run
     replicated: the grid work is O(D³·small) and independent of N, so
     replicating it costs less than any sharded-grid halo scheme at the
     particle counts where N ≫ D³.
  2. **slab routing** (near field): exact short-range pairs need spatial
     locality, so particles are routed to the owner of their x-slab
     (D/P planes per device) with ONE ``all_to_all`` of fixed
     per-destination capacity (overflow counted, never silently dropped).
  3. **halo exchange**: each slab owner builds dense cell tiles
     (ops/tile_sweep.py layout) for its planes and ``ppermute``s the ±ws
     boundary planes with its ring neighbors — the 26-neighbor short-range
     halo. Domain edges zero the wrapped halo's mass channel (inert tiles).
  4. **inverse routing**: per-particle accelerations ride the mirror
     ``all_to_all`` home; the (device, slot) coordinates of the outbound
     trip are reused, so no indices travel with the payload.

Every collective is explicit: psum (moments, overflow), all_to_all
(routing), ppermute (halo). Equivalence with the single-device engines is
tested in tests/test_parallel.py (allclose, not just isfinite).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nbody_tpu.parallel.mesh import PARTICLE_AXIS


def _route_to_slabs(pos_l, mass_l, dest, n_dev: int, capacity: int, axis):
    """all_to_all particles to their slab owners.

    Returns (recv (P·C, 5) rows [x, y, z, m, valid], route_back, overflow)
    where ``route_back(acc_back (P, C, 3)) -> (n_local, 3)`` undoes the
    routing for the acceleration payload.
    """
    n_l = pos_l.shape[0]
    c = capacity
    order = jnp.argsort(dest).astype(jnp.int32)
    dest_s = dest[order]
    start = jnp.searchsorted(
        dest_s, jnp.arange(n_dev, dtype=dest_s.dtype), side="left"
    ).astype(jnp.int32)
    rank = jnp.arange(n_l, dtype=jnp.int32) - start[dest_s]
    overflow = jnp.sum((rank >= c).astype(jnp.int32))

    # (P·(C+1), 5) send buffer with a sink column for capacity overflow;
    # valid=0 rows are routed to the receiver's sink cell.
    rows = jnp.concatenate(
        [pos_l, mass_l[:, None], jnp.ones((n_l, 1), pos_l.dtype)], axis=-1
    )[order]
    flat = dest_s * (c + 1) + jnp.minimum(rank, c)
    send = (
        jnp.zeros((n_dev * (c + 1), 5), pos_l.dtype)
        .at[flat]
        .set(rows)
        .reshape(n_dev, c + 1, 5)[:, :c]
    )
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)

    def route_back(acc_back):
        # acc_back: (P, C, 3) — row r = accs computed by slab owner r for
        # the particles I sent it, in my send-slot order.
        from nbody_tpu.ops.sorted_window import unsort_rows

        flatb = acc_back.reshape(n_dev * c, 3)
        idx = dest_s * c + jnp.minimum(rank, c - 1)
        acc_sorted = jnp.where((rank < c)[:, None], flatb[idx], 0.0)
        return unsort_rows(acc_sorted, order)

    return recv.reshape(n_dev * c, 5), route_back, overflow


def _build_slab_tiles(recv, coords, valid, q, s: int, d: int, k: int,
                      lo, cell):
    """Scatter routed candidates into this device's slab tiles.

    recv: (M, 5) routed rows; coords: (M, 3) their global cell coords.
    Returns (tiles (S, d, d, K, 4), lid (M,), rank (M,), overflow).
    Empty slots sit at their cell center with mass 0 (inert); invalid rows
    and rank-K overflow land in sink slots that are sliced away.
    """
    m = recv.shape[0]
    lx = coords[:, 0] - q * s
    lid = (lx * d + coords[:, 1]) * d + coords[:, 2]
    num_cells = s * d * d
    # invalid rows → sink cell (the last, extra cell row)
    lid = jnp.where(valid, lid, num_cells)

    order = jnp.argsort(lid).astype(jnp.int32)
    lid_s = lid[order]
    arange = jnp.arange(m, dtype=jnp.int32)
    first = (
        jnp.full((num_cells + 2,), m, jnp.int32).at[lid_s].min(arange)
    )
    cell_start = jnp.flip(jax.lax.cummin(jnp.flip(first)))
    rank_s = arange - cell_start[lid_s]
    overflow = jnp.sum(
        ((rank_s >= k) & (lid_s < num_cells)).astype(jnp.int32)
    )

    # slab cell centers (x is global: plane q·S + lx)
    xs = (q * s + jnp.arange(s, dtype=recv.dtype) + 0.5) * cell + lo[0]
    ys = (jnp.arange(d, dtype=recv.dtype) + 0.5) * cell + lo[1]
    zs = (jnp.arange(d, dtype=recv.dtype) + 0.5) * cell + lo[2]
    centers = jnp.stack(
        jnp.meshgrid(xs, ys, zs, indexing="ij"), axis=-1
    )  # (S, d, d, 3)
    init = jnp.concatenate(
        [
            jnp.broadcast_to(centers[:, :, :, None, :], (s, d, d, k + 1, 3)),
            jnp.zeros((s, d, d, k + 1, 1), recv.dtype),
        ],
        axis=-1,
    ).reshape(num_cells * (k + 1), 4)
    # one extra sink CELL row block for invalid candidates
    init = jnp.concatenate(
        [init, jnp.zeros((k + 1, 4), recv.dtype)], axis=0
    )
    flat = lid_s * (k + 1) + jnp.minimum(rank_s, k)
    tiles = (
        init.at[flat]
        .set(recv[order, :4])[: num_cells * (k + 1)]
        .reshape(s, d, d, k + 1, 4)[:, :, :, :k, :]
    )
    return tiles, lid_s, rank_s, order, overflow


def _slab_sweep(slab_t, pair_weight, s: int, d: int, k: int, ws: int,
                axis):
    """Dense (2ws+1)³ neighbor sweep over a halo'd tile slab.

    slab_t: (K, 4, S+2ws, d, d) — targets are x-planes [ws, ws+S).
    Returns (K, 3, S·d²) per-slot accelerations (un-scaled).
    """
    import numpy as np

    pad = [(0, 0), (0, 0), (0, 0), (ws, ws), (ws, ws)]
    tiles_pad = jnp.pad(slab_t, pad)
    r = range(-ws, ws + 1)
    offs = np.asarray([(x, y, z) for x in r for y in r for z in r], np.int32)
    offsets_arr = jnp.asarray(offs + ws)

    pc = s * d * d
    tgt = slab_t[:, :, ws : ws + s].reshape(k, 4, pc)

    def body(acc, off):
        zero = jnp.zeros((), off.dtype)
        src = jax.lax.dynamic_slice(
            tiles_pad, (zero, zero, off[0], off[1], off[2]), (k, 4, s, d, d)
        ).reshape(k, 4, pc)
        sx, sy, sz, sm = src[:, 0], src[:, 1], src[:, 2], src[:, 3]
        rows = []
        for kt in range(k):
            dx = sx - tgt[kt, 0]
            dy = sy - tgt[kt, 1]
            dz = sz - tgt[kt, 2]
            r2_raw = dx * dx + dy * dy + dz * dz
            w = pair_weight(r2_raw, sm)
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
        return acc + jnp.stack(rows, axis=0), None

    # The scan carry must carry the shard_map varying-axis tag of the
    # device-local slab data, or the carry-in/carry-out types mismatch.
    acc0 = jax.lax.pcast(
        jnp.zeros((k, 3, pc), slab_t.dtype), axis, to="varying"
    )
    acc, _ = jax.lax.scan(body, acc0, offsets_arr)
    return acc


def _sharded_near_field(
    pos_l,
    mass_l,
    coords_l,
    lo,
    cell,
    *,
    d: int,
    ws: int,
    k: int,
    capacity: int,
    n_dev: int,
    axis,
    pair_weight: Callable,
    coords_fn: Callable,
):
    """Slab-routed exact near field inside shard_map.

    ``coords_fn(pos) -> (M, 3) int32`` must reproduce the caller's cell
    assignment exactly (routed rows re-derive their cell on the receiver).
    Returns (acc_local (n_l, 3) un-scaled, overflow scalar [psum'd]).
    """
    s = d // n_dev
    q = jax.lax.axis_index(axis)
    dest = jnp.clip(coords_l[:, 0] // s, 0, n_dev - 1)
    recv, route_back, route_over = _route_to_slabs(
        pos_l, mass_l, dest, n_dev, capacity, axis
    )
    valid = recv[:, 4] > 0.5
    rcoords = coords_fn(recv[:, :3])
    tiles, lid_s, rank_s, order, tile_over = _build_slab_tiles(
        recv, rcoords, valid, q, s, d, k, lo, cell
    )

    # Halo exchange: the ±ws x-planes around this device's slab. When
    # ws > S (thin slabs / wide acceptance windows) the halo spans
    # ⌈ws/S⌉ ring neighbors, so the exchange is a CHAIN of ppermutes —
    # hop j delivers device q∓j's whole slab, from which the needed
    # planes are sliced. Wrapped halos past the domain edge are masked
    # inert via the mass channel (empty slots already sit at cell
    # centers with mass 0, so a masked tile exerts no force).
    tiles_t = tiles.transpose(3, 4, 0, 1, 2)  # (K, 4, S, d, d)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]  # data flows q-1 → q
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    hops = -(-ws // s)
    left_parts, right_parts = [], []
    cur_l = cur_r = tiles_t
    rem = ws
    for j in range(1, hops + 1):
        cur_l = jax.lax.ppermute(cur_l, axis, fwd)   # from device q-j
        cur_r = jax.lax.ppermute(cur_r, axis, bwd)   # from device q+j
        take = min(s, rem)
        mask_l = (q >= j).astype(tiles_t.dtype)
        mask_r = (q < n_dev - j).astype(tiles_t.dtype)
        left_parts.insert(
            0, cur_l[:, :, s - take :].at[:, 3].multiply(mask_l)
        )
        right_parts.append(cur_r[:, :, :take].at[:, 3].multiply(mask_r))
        rem -= take
    slab = jnp.concatenate(
        left_parts + [tiles_t] + right_parts, axis=2
    )

    acc_slots = _slab_sweep(
        slab, pair_weight, s, d, k, ws, axis
    )  # (K, 3, S·d²)

    # pickup per routed candidate (lid-sorted order) → send-slot order
    acc_t = acc_slots.transpose(2, 0, 1).reshape(s * d * d * k, 3)
    rank_read = jnp.minimum(rank_s, k - 1)
    lid_read = jnp.minimum(lid_s, s * d * d - 1)
    picked = acc_t[lid_read * k + rank_read]
    picked = jnp.where(
        ((rank_s < k) & (lid_s < s * d * d))[:, None], picked, 0.0
    )
    from nbody_tpu.ops.sorted_window import unsort_rows

    acc_recv = unsort_rows(picked, order)
    acc_back = jax.lax.all_to_all(
        acc_recv.reshape(n_dev, capacity, 3), axis, split_axis=0,
        concat_axis=0,
    )
    acc_l = route_back(acc_back)
    overflow = jax.lax.psum(route_over + tile_over, axis)
    return acc_l, overflow


def sharded_barnes_hut_forces(
    pos: jax.Array,
    mass: jax.Array,
    mesh: Mesh,
    G: float = 1.0,
    softening: float = 0.1,
    theta: float = 0.5,
    *,
    levels: int = 6,
    near_k: int = 16,
    multipole_order: int = 2,
    capacity: int = 0,
    return_overflow: bool = False,
):
    """Multi-chip Barnes-Hut with the particle axis sharded over ``mesh``.

    psum-combined pyramid far field + slab-routed exact near field (module
    docstring). Matches the single-device ``barnes_hut_forces`` to f32
    reduction-order tolerance. D = 2^levels must divide the device count.
    ``capacity`` is the per-destination routing capacity (0 → N/P, which
    cannot overflow); overflowed particles lose their NEAR field only and
    are counted (``return_overflow=True``).
    """
    from nbody_tpu.ops.barnes_hut import (
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
        scatter_finest_moments,
        sym3_matvec,
        sym_matvec,
        theta_to_ws,
    )

    axis = PARTICLE_AXIS
    n_dev = mesh.devices.size
    d = 1 << levels
    if d % n_dev:
        raise ValueError(
            f"finest grid {d}^3 must split over {n_dev} devices evenly"
        )
    ws = theta_to_ws(theta, order=multipole_order)
    cap = capacity if capacity > 0 else pos.shape[0] // n_dev
    eps2 = softening * softening

    def pair_weight(r2_raw, sm):
        inv = jax.lax.rsqrt(r2_raw + eps2)
        return sm * (inv * inv * inv)

    def local(pos_l, mass_l):
        lo = jax.lax.pmin(jnp.min(pos_l, axis=0), axis)
        hi = jax.lax.pmax(jnp.max(pos_l, axis=0), axis)
        lo, cell = pyramid_geometry(lo, hi, levels)

        def coords_fn(p):
            return jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, d - 1)

        coords_l = coords_fn(pos_l)

        # far field: psum-combined finest moments, replicated sweeps
        packed_l = scatter_finest_moments(
            pos_l, mass_l, coords_l, lo, cell, d, multipole_order
        )
        packed = jax.lax.psum(packed_l, axis)
        pyr = pyramid_from_packed(packed, lo, cell, levels, multipole_order)
        a_far, j_far, h_far = far_field_grid(pyr, ws, G, softening, levels)

        # local pickup of the cell-center expansion (identical to the
        # single-device tail of barnes_hut_forces)
        centers = lo + (coords_l.astype(pos_l.dtype) + 0.5) * cell
        parts = [a_far, j_far] + ([h_far] if h_far is not None else [])
        packed_g = jnp.concatenate(parts, axis=-1)
        cid = (coords_l[:, 0] * d + coords_l[:, 1]) * d + coords_l[:, 2]
        vals = packed_g.reshape(d**3, packed_g.shape[-1])[cid]
        delta = pos_l - centers
        pick = vals[:, :3] + sym_matvec(vals[:, 3:9], delta)
        if h_far is not None:
            pick = pick + 0.5 * sym_matvec(
                sym3_matvec(vals[:, 9:19], delta), delta
            )

        acc_near, overflow = _sharded_near_field(
            pos_l, mass_l, coords_l, lo, cell,
            d=d, ws=ws, k=near_k, capacity=cap, n_dev=n_dev, axis=axis,
            pair_weight=pair_weight, coords_fn=coords_fn,
        )
        return G * acc_near + pick, overflow

    acc, overflow = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P()),
    )(pos, mass)
    if return_overflow:
        return acc, overflow
    return acc


def sharded_spatial_hash_forces(
    pos: jax.Array,
    mass: jax.Array,
    mesh: Mesh,
    G: float = 1.0,
    softening: float = 0.1,
    *,
    cutoff: float = 2.0,
    cell_size: float = 1.0,
    cap: int = 64,
    max_per_cell: int = 64,
    capacity: int = 0,
    return_overflow: bool = False,
):
    """Multi-chip spatial-hash short-range forces (slab routing + halo).

    Same pair predicate as the single-device path (cutoff² tested on the
    raw squared distance BEFORE softening, reference
    force_spatial_hash.cu:120-139); the 3×3×3 cell sweep becomes the ws=1
    slab sweep with ppermute'd boundary planes. ``cap`` (static grid dim)
    must divide the device count.
    """
    axis = PARTICLE_AXIS
    n_dev = mesh.devices.size
    if cap % n_dev:
        raise ValueError(
            f"grid cap {cap} must split over {n_dev} devices evenly"
        )
    capacity_ = capacity if capacity > 0 else pos.shape[0] // n_dev
    eps2 = softening * softening
    cut2 = cutoff * cutoff

    def pair_weight(r2_raw, sm):
        inv = jax.lax.rsqrt(r2_raw + eps2)
        return jnp.where(r2_raw <= cut2, sm * (inv * inv * inv), 0.0)

    def local(pos_l, mass_l):
        lo = jax.lax.pmin(jnp.min(pos_l, axis=0), axis)
        hi = jax.lax.pmax(jnp.max(pos_l, axis=0), axis)
        dims = jnp.clip(
            jnp.ceil((hi - lo) / cell_size).astype(jnp.int32), 1, cap
        )

        def coords_fn(p):
            return jnp.clip(
                jnp.floor((p - lo) / cell_size).astype(jnp.int32),
                0,
                dims - 1,
            )

        coords_l = coords_fn(pos_l)
        cell = jnp.asarray(cell_size, pos_l.dtype)
        acc_l, overflow = _sharded_near_field(
            pos_l, mass_l, coords_l, lo, cell,
            d=cap, ws=1, k=max_per_cell, capacity=capacity_, n_dev=n_dev,
            axis=axis, pair_weight=pair_weight, coords_fn=coords_fn,
        )
        return G * acc_l, overflow

    acc, overflow = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P()),
    )(pos, mass)
    if return_overflow:
        return acc, overflow
    return acc
