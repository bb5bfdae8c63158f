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

import numpy as np

import jax
import jax.numpy as jnp

from nbody_tpu.ops.sorted_window import build_sorted_grid


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
):
    """Exact near-field acceleration within the (2ws+1)³ cell ball.

    Returns (acc (N, 3) in original order, overflow count).
    """
    n = pos.shape[0]
    grid = build_sorted_grid(pos, mass, coords, d)

    # rank within cell, in sorted order
    num_cells = d * d * d
    ids_sorted = (
        grid.csort[:, 0] * d + grid.csort[:, 1]
    ) * d + grid.csort[:, 2]
    arange = jnp.arange(n, dtype=jnp.int32)
    rank_sorted = arange - grid.cell_start[ids_sorted]
    overflow = jnp.sum((rank_sorted >= k).astype(jnp.int32))

    # tiles with inert empty slots at cell centers
    cgrid = jnp.stack(
        jnp.meshgrid(
            jnp.arange(d), jnp.arange(d), jnp.arange(d), indexing="ij"
        ),
        axis=-1,
    ).astype(pos.dtype)
    centers = lo + (cgrid + 0.5) * cell  # (d, d, d, 3)
    tiles = jnp.concatenate(
        [
            jnp.broadcast_to(centers[:, :, :, None, :], (d, d, d, k, 3)),
            jnp.zeros((d, d, d, k, 1), pos.dtype),
        ],
        axis=-1,
    )
    rank_capped = jnp.minimum(rank_sorted, k)  # k = out of bounds → dropped
    tiles = tiles.at[
        grid.csort[:, 0],
        grid.csort[:, 1],
        grid.csort[:, 2],
        rank_capped,
    ].set(grid.psort, mode="drop")

    # dense sweep over the Chebyshev ball
    r = range(-ws, ws + 1)
    offs = np.asarray(
        [(x, y, z) for x in r for y in r for z in r], np.int32
    )
    pad = [(ws, ws), (ws, ws), (ws, ws), (0, 0), (0, 0)]
    tiles_pad = jnp.pad(tiles, pad)
    offsets_arr = jnp.asarray(offs + ws)

    tgt = tiles[..., :3]
    eps2 = eps * eps

    def body(acc, off):
        zero = jnp.zeros((), off.dtype)
        src = jax.lax.dynamic_slice(
            tiles_pad, (off[0], off[1], off[2], zero, zero), (d, d, d, k, 4)
        )
        dvec = src[..., None, :, :3] - tgt[..., :, None, :]  # (d,d,d,Kt,Ks,3)
        r2_raw = jnp.sum(dvec * dvec, axis=-1)
        inv = jax.lax.rsqrt(r2_raw + eps2)
        w = src[..., None, :, 3] * (inv * inv * inv)
        w = jnp.where(r2_raw == 0.0, 0.0, w)
        return acc + jnp.einsum("...ts,...tsd->...td", w, dvec), None

    acc0 = jnp.zeros((d, d, d, k, 3), pos.dtype)
    acc_slots, _ = jax.lax.scan(body, acc0, offsets_arr)

    # per-particle pickup (sorted order → original order)
    rank_read = jnp.minimum(rank_sorted, k - 1)
    acc_sorted = acc_slots[
        grid.csort[:, 0], grid.csort[:, 1], grid.csort[:, 2], rank_read
    ]
    acc_sorted = jnp.where((rank_sorted < k)[:, None], acc_sorted, 0.0)
    acc = jnp.zeros((n, 3), pos.dtype).at[grid.order].set(G * acc_sorted)
    return acc, overflow
