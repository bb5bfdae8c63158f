"""Interpret-mode correctness for the Pallas TPU kernels (run on CPU; the
same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas


def reference_sweep(tiles_t, ws, eps):
    """NumPy re-computation of the tile sweep."""
    k, _, d, _, _ = tiles_t.shape
    t = np.asarray(tiles_t, np.float64)
    pad = np.zeros((k, 4, d + 2 * ws, d + 2 * ws, d + 2 * ws))
    pad[:, :, ws:ws + d, ws:ws + d, ws:ws + d] = t
    acc = np.zeros((k, 3, d, d, d))
    r = range(2 * ws + 1)
    for xo in r:
        for yo in r:
            for zo in r:
                s = pad[:, :, xo:xo + d, yo:yo + d, zo:zo + d]
                for kt in range(k):
                    dx = s[:, 0] - t[kt, 0]
                    dy = s[:, 1] - t[kt, 1]
                    dz = s[:, 2] - t[kt, 2]
                    r2 = dx * dx + dy * dy + dz * dz
                    w = s[:, 3] * (r2 + eps * eps) ** -1.5
                    w = np.where(r2 == 0.0, 0.0, w)
                    acc[kt, 0] += (w * dx).sum(0)
                    acc[kt, 1] += (w * dy).sum(0)
                    acc[kt, 2] += (w * dz).sum(0)
    return acc


@pytest.mark.parametrize("ws", [1, 2])
def test_tile_sweep_pallas_interpret(ws):
    # interpret mode executes each of the (2ws+1)³·k unrolled blocks in
    # Python — keep ws=2 tiny (162 s at k=4 on the 1-core box)
    k, d = (4, 8) if ws == 1 else (2, 6)
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (k, 3, d, d, d), jnp.float32, 0.0, 8.0)
    mass = jax.random.uniform(
        jax.random.PRNGKey(1), (k, 1, d, d, d), jnp.float32, 0.0, 1.0
    )
    # some empty slots (mass 0)
    mass = mass.at[2:].set(0.0)
    tiles_t = jnp.concatenate([pos, mass], axis=1)  # (k, 4, d, d, d)

    got = tile_sweep_pallas(
        tiles_t, k=k, d=d, ws=ws, eps=0.1, interpret=True
    )
    ref = reference_sweep(tiles_t, ws, 0.1)
    np.testing.assert_allclose(
        np.asarray(got), ref, rtol=2e-4, atol=2e-4
    )


def _sorted_scene(n=1500, d=8, radius=4.0):
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.types import SphericalDistParams

    s = init_spherical(jax.random.PRNGKey(1), n, SphericalDistParams(radius=radius))
    lo = jnp.min(s.pos, axis=0)
    hi = jnp.max(s.pos, axis=0)
    cell = jnp.maximum(jnp.max(hi - lo), 1e-6) * (1 + 1e-5) / d
    coords = jnp.clip(((s.pos - lo) / cell).astype(jnp.int32), 0, d - 1)
    grid = build_sorted_grid(s.pos, s.mass, coords, d)
    return s, grid, lo, cell, coords


def test_monotone_scatter_contract():
    """MXU one-hot scatter (ops/pallas_scatter.py): real rows land
    BIT-EXACTLY at their (cell, slot) column; unmatched columns are inert
    fillers (mass exactly 0, center inside the right cell)."""
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles

    n, d, k = 1500, 8, 8
    s, grid, lo, cell, _ = _sorted_scene(n, d)
    nc = d**3
    ids_sorted = (
        grid.csort[:, 0] * d + grid.csort[:, 1]
    ) * d + grid.csort[:, 2]
    ar = jnp.arange(n, dtype=jnp.int32)
    rank = ar - grid.cell_start[ids_sorted]

    r, w = 512, 2048
    dest = jnp.where(rank < k, ids_sorted * k + rank, 1 << 24)
    car = jnp.arange(nc * k // r, dtype=jnp.int32)
    starts = grid.cell_start[(car * r) // k]
    c1 = jnp.minimum(((car + 1) * r + k - 1) // k, nc)
    miss = int(jnp.sum(jnp.maximum(grid.cell_start[c1] - starts - w, 0)))
    assert miss == 0  # w chosen to cover this scene

    got = np.asarray(
        monotone_scatter_tiles(
            grid.psort, dest, starts, lo, cell,
            k=k, d=d, r=r, w=w, interpret=True,
        )
    )
    psort = np.asarray(grid.psort)
    destn = np.asarray(dest)
    real = destn < (1 << 24)
    cols = destn[real]
    assert (got[:, cols].T == psort[real]).all()
    fill = np.ones(nc * k, bool)
    fill[cols] = False
    assert (got[3, fill] == 0.0).all()
    cw = float(cell)
    lo_np = np.asarray(lo)
    fc = np.flatnonzero(fill)
    dec = (fc // k // (d * d), (fc // k // d) % d, (fc // k) % d)
    for ch in range(3):
        lo_b = lo_np[ch] + dec[ch] * cw
        v = got[ch, fc]
        assert ((v >= lo_b - 1e-5) & (v <= lo_b + cw + 1e-5)).all()


def test_monotone_scatter_window_loop():
    """A window far smaller than the densest chunk's span forces the
    kernel's in-kernel window LOOP (lax.fori_loop over source DMAs);
    the result must be IDENTICAL to a single-window run that covers
    everything — the build is exact at any density, w is a perf tune."""
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles

    n, d, k = 1500, 8, 8
    s, grid, lo, cell, _ = _sorted_scene(n, d)
    nc = d**3
    ids_sorted = (
        grid.csort[:, 0] * d + grid.csort[:, 1]
    ) * d + grid.csort[:, 2]
    ar = jnp.arange(n, dtype=jnp.int32)
    rank = ar - grid.cell_start[ids_sorted]
    r = 512
    dest = jnp.where(rank < k, ids_sorted * k + rank, 1 << 24)
    car = jnp.arange(nc * k // r, dtype=jnp.int32)
    starts = grid.cell_start[(car * r) // k]

    wide = monotone_scatter_tiles(
        grid.psort, dest, starts, lo, cell,
        k=k, d=d, r=r, w=2048, interpret=True,
    )
    # w=128: the dense spherical core spans many windows per chunk
    looped = monotone_scatter_tiles(
        grid.psort, dest, starts, lo, cell,
        k=k, d=d, r=r, w=128, interpret=True,
    )
    assert (np.asarray(looped) == np.asarray(wide)).all()


def test_monotone_segment_sum_window_loop():
    """Same exactness contract for the segment-sum kernel: partial sums
    from looped windows must reproduce the single-window result to f32
    reduction tolerance (summation order differs across windows)."""
    from nbody_tpu.ops.pallas_scatter import monotone_segment_sum

    n, d = 1500, 8
    s, grid, lo, cell, _ = _sorted_scene(n, d)
    nc = d**3
    ids_sorted = (
        grid.csort[:, 0] * d + grid.csort[:, 1]
    ) * d + grid.csort[:, 2]
    vals = jnp.concatenate(
        [grid.psort[:, 3:4], grid.psort[:, 3:4] * grid.psort[:, :3]],
        axis=-1,
    )
    want = jnp.zeros((nc, 4)).at[ids_sorted].add(vals)
    r = 128
    n_chunks = -(-nc // r)
    car = jnp.arange(n_chunks, dtype=jnp.int32)
    starts = grid.cell_start[jnp.minimum(car * r, nc)]

    got = monotone_segment_sum(
        vals, ids_sorted, starts, num_dest=nc, r=r, w=128, interpret=True
    ).T
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_window_sweep_pallas_matches_xla():
    """Pallas sorted-window sweep ≡ the XLA window_sweep path (same
    windows, same validity predicate, cutoff-before-softening)."""
    from nbody_tpu.ops.pallas_window_sweep import window_sweep_pallas
    from nbody_tpu.ops.sorted_window import (
        _window_starts,
        unsort_rows,
        window_sweep,
        xy_ball,
    )

    n, d = 1500, 8
    s, grid, lo, cell, _ = _sorted_scene(n, d)
    eps, cut = 0.1, 1.2
    eps2, cut2 = eps * eps, cut * cut

    def pw(r2, mj):
        inv = jax.lax.rsqrt(r2 + eps2)
        return jnp.where(r2 <= cut2, mj * inv**3, 0.0)

    wsize, b = 1024, 256
    acc_x, over_x = window_sweep(
        grid, d=d, xy_offsets=xy_ball(1), z_halfwidth=1,
        pair_weight=pw, window=wsize, block_size=b,
    )
    starts, nchunks, over_p = _window_starts(
        grid, d=d, xy_offsets=xy_ball(1), z_halfwidth=1,
        window=wsize, block_size=b,
    )
    acc_sorted = window_sweep_pallas(
        grid.psort, grid.csort, starts, nchunks, offsets=xy_ball(1),
        block_size=b, window=wsize, z_hw=1, eps=eps, cut2=cut2,
        interpret=True,
    )
    acc_p = unsort_rows(acc_sorted[:n], grid.order)
    assert int(over_x) == 0 and int(over_p) == 0
    scale = float(jnp.max(jnp.abs(acc_x)))
    np.testing.assert_allclose(
        np.asarray(acc_p), np.asarray(acc_x), atol=2e-5 * scale
    )


def test_monotone_segment_sum_matches_scatter_add():
    """MXU segment sum (pallas_scatter.monotone_segment_sum) ≡ the XLA
    scatter-add it replaces, to f32 reduction tolerance."""
    from nbody_tpu.ops.pallas_scatter import monotone_segment_sum

    n, d = 1500, 8
    s, grid, lo, cell, _ = _sorted_scene(n, d)
    nc = d**3
    ids_sorted = (
        grid.csort[:, 0] * d + grid.csort[:, 1]
    ) * d + grid.csort[:, 2]
    vals = jnp.concatenate(
        [grid.psort[:, 3:4], grid.psort[:, 3:4] * grid.psort[:, :3]],
        axis=-1,
    )  # (n, 4) moments

    want = jnp.zeros((nc, 4)).at[ids_sorted].add(vals)

    r, w = 128, 2048
    n_chunks = -(-nc // r)
    car = jnp.arange(n_chunks, dtype=jnp.int32)
    starts = grid.cell_start[jnp.minimum(car * r, nc)]
    ends = grid.cell_start[jnp.minimum((car + 1) * r, nc)]
    miss = int(jnp.sum(jnp.maximum(ends - (starts // 128) * 128 - w, 0)))
    assert miss == 0

    got = monotone_segment_sum(
        vals, ids_sorted, starts, num_dest=nc, r=r, w=w, interpret=True
    ).T
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_fused_tile_path_matches_xla():
    """The full TPU tile pipeline (MXU scatter → plane sweep with far
    folding → raw-layout pickup) ≡ the XLA path, end-to-end, via the
    static near_impl switch (interpret mode on CPU).

    Rows past the k-slot cap are the AUDITED graceful-degradation set:
    they lose their near contribution on both paths, and on the fused
    path their far field is the expansion's A term at the cell center
    (pickup fallback) rather than the full expansion at their position
    — so they are compared against that documented semantic, and the
    strict equivalence gate applies to every non-overflow row."""
    import jax.numpy as jnp2

    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import barnes_hut_forces, pyramid_geometry
    from nbody_tpu.ops.sorted_window import build_sorted_grid, unsort_rows
    from nbody_tpu.types import SphericalDistParams

    s = init_spherical(
        jax.random.PRNGKey(3), 1200, SphericalDistParams(radius=4.0)
    )
    levels, k = 3, 8
    d = 1 << levels
    kw = dict(levels=levels, near_engine="tiles", near_k=k,
              multipole_order=2)

    want = barnes_hut_forces(
        s.pos, s.mass, 1.0, 0.1, 0.5, near_impl="xla", **kw
    )
    got = barnes_hut_forces(
        s.pos, s.mass, 1.0, 0.1, 0.5, near_impl="pallas_interpret", **kw
    )

    # identify the audited overflow rows (rank ≥ k in their cell)
    lo, cell = pyramid_geometry(
        jnp.min(s.pos, axis=0), jnp.max(s.pos, axis=0), levels
    )
    coords = jnp.clip(((s.pos - lo) / cell).astype(jnp.int32), 0, d - 1)
    grid = build_sorted_grid(s.pos, s.mass, coords, d)
    rank_sorted = jnp.arange(s.pos.shape[0]) - grid.cell_start[grid.ids]
    over = np.asarray(
        unsort_rows((rank_sorted >= k)[:, None], grid.order)
    )[:, 0]
    assert over.sum() > 0  # the scene must actually exercise the fallback

    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(
        np.asarray(got)[~over], np.asarray(want)[~over],
        atol=2e-5 * scale,
    )
    # overflow rows: far A at the cell center, near dropped (audited)
    ids = (coords[:, 0] * d + coords[:, 1]) * d + coords[:, 2]
    a_want = np.asarray(got)[over]
    assert np.isfinite(a_want).all()
    # same-cell overflow rows share the fallback value exactly
    ids_np = np.asarray(ids)[over]
    vals_by_cell = {}
    for cid_i, row in zip(ids_np, a_want):
        if cid_i in vals_by_cell:
            np.testing.assert_array_equal(vals_by_cell[cid_i], row)
        vals_by_cell[cid_i] = row
