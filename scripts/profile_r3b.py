"""TPU profile r3b — v5 row-padded window near-field prototype + the
benches that failed in r3a (moments/pyramid/glue), at 1M/L6.

The v5 idea (BENCHMARKS.md round-3 plan #1, executed): instead of dense
(cell, slot) tiles + K² sweep + pickup (58 ms measured chain), pad each
(x, y) row of the cell-sorted array to a multiple of 64 so every
128-target block lies in at most two ADJACENT rows; then each (block,
xy-offset) needs ONE contiguous source window of ~384 lanes in the
padded array, and the EXISTING pallas_window_sweep kernel computes
per-particle near-field accelerations directly — no tiles, no slot
axis, no K² waste, no slot-cap particle drops.

Usage: python scripts/profile_r3b.py [N]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = 10
LEVELS = 6
D = 1 << LEVELS
K = 16
WS = 1
PAD = 64


def bench(name, make_body, reps=REPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    def sync(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return float(jnp.sum(leaf))

    try:
        chk = sync(run(init))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(init))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:52s} {best / reps * 1000:8.2f} ms/iter "
              f"(chk {chk:.6e})", flush=True)
        return best / reps
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def _round_up(x, m):
    return -(-x // m) * m


def build_row_padded(pos, mass, coords, d, n_static, pad=PAD):
    """Row-padded cell-sorted layout. Returns a dict of arrays."""
    n = pos.shape[0]
    nc = d * d * d
    nrows = d * d
    ids = (coords[:, 0] * d + coords[:, 1]) * d + coords[:, 2]
    order = jnp.argsort(ids).astype(jnp.int32)
    sid = ids[order]
    ar = jnp.arange(n, dtype=jnp.int32)
    first = jnp.full((nc + 1,), n, jnp.int32).at[sid].min(ar)
    cell_start = jnp.flip(jax.lax.cummin(jnp.flip(first)))

    row_start = cell_start[jnp.arange(nrows + 1, dtype=jnp.int32) * d]
    cnt = row_start[1:] - row_start[:-1]
    padded_cnt = _round_up(cnt, pad)
    row_start_pad = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(padded_cnt).astype(jnp.int32)]
    )
    p_cap = _round_up(n_static + (pad - 1) * nrows, 128)

    nsub = p_cap // pad
    sub_ids = jnp.arange(nsub, dtype=jnp.int32)
    row_of_sub = (
        jnp.searchsorted(
            row_start_pad // pad, sub_ids, side="right"
        ).astype(jnp.int32) - 1
    )
    row_of_sub = jnp.clip(row_of_sub, 0, nrows - 1)
    rsp = row_start_pad[row_of_sub]
    rsu = row_start[row_of_sub]
    rcnt = cnt[row_of_sub]
    lane = jnp.arange(pad, dtype=jnp.int32)
    off_in_row = sub_ids[:, None] * pad + lane[None, :] - rsp[:, None]
    src = rsu[:, None] + off_in_row
    valid = (off_in_row >= 0) & (off_in_row < rcnt[:, None])
    src = jnp.where(valid, src, n).reshape(p_cap)

    data = jnp.concatenate(
        [pos, mass[:, None], coords.astype(jnp.float32)], axis=-1
    )  # (N, 7)
    data_sorted = data[order]
    sentinel = jnp.asarray(
        [[0.0, 0.0, 0.0, 0.0, 2.0 ** 26, 2.0 ** 26, 2.0 ** 26]],
        jnp.float32,
    )
    data_s = jnp.concatenate([data_sorted, sentinel], axis=0)
    padded = data_s[src]  # (P, 7) one wide gather
    return dict(
        order=order, sid=sid, cell_start=cell_start, row_start=row_start,
        row_start_pad=row_start_pad, cnt=cnt, row_of_sub=row_of_sub,
        rsp=rsp, rsu=rsu, rcnt=rcnt, psort_pad=padded[:, :4],
        csort_pad=padded[:, 4:7].astype(jnp.int32),
        src=src,
    )


def row_window_starts(g, d, window, block=128, pad=PAD):
    """(n_blocks, 9) window starts into the PADDED array + miss audit."""
    nrows = d * d
    p_cap = g["psort_pad"].shape[0]
    nsub = p_cap // pad
    subs_per_block = block // pad
    n_blocks = p_cap // block

    # per-sub first/last REAL z (sentinel-free: from unpadded csort via
    # cell ids). first real slot of sub s = rsu[s] + max(off0, 0)
    off0 = jnp.arange(nsub, dtype=jnp.int32) * pad - g["rsp"]
    first_real = g["rsu"] + jnp.maximum(off0, 0)
    last_real = g["rsu"] + jnp.minimum(off0 + pad, g["rcnt"]) - 1
    has_real = jnp.minimum(off0 + pad, g["rcnt"]) > jnp.maximum(off0, 0)
    sid = g["sid"]
    n = sid.shape[0]
    zf = sid[jnp.clip(first_real, 0, n - 1)] % d
    zl = sid[jnp.clip(last_real, 0, n - 1)] % d

    # per (sub, offset): start/end in UNPADDED then -> padded coords
    r = g["row_of_sub"]  # (nsub,)
    rx, ry = r // d, r % d
    starts_all = []
    ends_all = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            nbx = jnp.clip(rx + dx, 0, d - 1)
            nby = jnp.clip(ry + dy, 0, d - 1)
            nbr = nbx * d + nby
            s_un = g["cell_start"][nbr * d + jnp.maximum(zf - 1, 0)]
            e_un = g["cell_start"][nbr * d + jnp.minimum(zl + 2, d)]
            base = g["row_start_pad"][nbr] - g["row_start"][nbr]
            s_pad = jnp.where(has_real, base + s_un, jnp.iinfo(jnp.int32).max)
            e_pad = jnp.where(has_real, base + e_un, 0)
            starts_all.append(s_pad)
            ends_all.append(e_pad)
    s = jnp.stack(starts_all, -1).reshape(nsub // subs_per_block,
                                          subs_per_block, 9)
    e = jnp.stack(ends_all, -1).reshape(nsub // subs_per_block,
                                        subs_per_block, 9)
    bs = jnp.min(s, axis=1)  # (n_blocks, 9)
    be = jnp.max(e, axis=1)
    bs = jnp.minimum(bs, p_cap)
    wbuf = _round_up(window + 128, 128)
    miss = jnp.sum(
        jnp.maximum(be - (jnp.minimum(bs, be) // 128) * 128 - wbuf, 0)
    )
    return bs, miss


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        _sorted_finest_moments,
        pyramid_from_packed,
        pyramid_geometry,
    )
    from nbody_tpu.ops.pallas_window_sweep import window_sweep_pallas
    from nbody_tpu.ops.sorted_window import build_sorted_grid, unsort_rows
    from nbody_tpu.ops.tile_sweep import tile_near_field
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()} N={N} L={LEVELS} pad={PAD}",
          flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    lo, cell = pyramid_geometry(
        jnp.min(pos0, axis=0), jnp.max(pos0, axis=0), LEVELS)
    coords0 = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)

    grid0 = jax.jit(
        lambda p: build_sorted_grid(p, mass, coords0, D)
    )(pos0)
    jax.block_until_ready(grid0)
    ids_sorted0 = (
        grid0.csort[:, 0] * D + grid0.csort[:, 1]
    ) * D + grid0.csort[:, 2]

    # ---- fixed r3a benches ----
    def mk_moments():
        def body(c, _):
            import dataclasses as dc
            g = dc.replace(grid0, psort=grid0.psort * (1 + c[0, 0] * 1e-30))
            packed, miss = _sorted_finest_moments(
                g, ids_sorted0, lo, cell, D, 2)
            return packed[..., :2].sum(-1) + miss, None
        return body, jnp.zeros((D, D, D))

    def mk_pyramid_up():
        packed0, _ = jax.jit(
            lambda: _sorted_finest_moments(grid0, ids_sorted0, lo, cell,
                                           D, 2)
        )()
        jax.block_until_ready(packed0)

        def body(c, _):
            pyr = pyramid_from_packed(
                packed0 * (1 + c * 1e-30), lo, cell, LEVELS, 2)
            return c * 0 + sum(jnp.sum(m) for m in pyr.masses), None
        return body, jnp.zeros(())

    def mk_moment_vals():
        # the (N, 10) vals build alone (concat of m, m*xr, m*outer6)
        from nbody_tpu.ops.barnes_hut import _outer6

        def body(c, _):
            psort = grid0.psort * (1 + c[0, 0] * 1e-30)
            ctr = lo + (grid0.csort.astype(jnp.float32) + 0.5) * cell
            m = psort[:, 3:4]
            xr = psort[:, :3] - ctr
            vals = jnp.concatenate([m, m * xr, m * _outer6(xr)], axis=-1)
            return vals[:, :3], None
        return body, jnp.zeros((N, 3))

    # ---- v5 prototype ----
    gpad0 = jax.jit(
        lambda p: build_row_padded(p, mass, coords0, D, N)
    )(pos0)
    jax.block_until_ready(gpad0["psort_pad"])
    print(f"P_cap={gpad0['psort_pad'].shape[0]} (N={N})", flush=True)
    W = 256

    starts0, miss0 = jax.jit(
        lambda g: row_window_starts(g, D, W)
    )(gpad0)
    jax.block_until_ready(starts0)
    _, miss384 = jax.jit(
        lambda g: row_window_starts(g, D, 384)
    )(gpad0)
    print(f"v5 window miss audit: W=256 -> {int(miss0)}, "
          f"W=384 -> {int(miss384)}", flush=True)

    def mk_v5_build():
        def body(c, _):
            g = build_row_padded(pos0 * (1 + c[0, 0] * 1e-30), mass,
                                 coords0, D, N)
            return g["psort_pad"][:N, :3], None
        return body, jnp.zeros((N, 3))

    def mk_v5_starts():
        def body(c, _):
            s, miss = row_window_starts(gpad0, D, W)
            return s + c * 0 + miss, None
        return body, jnp.zeros(starts0.shape, jnp.int32)

    def mk_v5_kernel(wsize):
        offsets = tuple(
            (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1))

        def body(c, _):
            ps = gpad0["psort_pad"] * (1 + c[0, 0] * 1e-30)
            acc = window_sweep_pallas(
                ps, gpad0["csort_pad"], starts0,
                offsets=offsets, block_size=128, window=wsize, z_hw=WS,
                eps=0.1, cut2=None)
            return acc[:N], None
        return body, jnp.zeros((N, 3))

    def mk_v5_total():
        offsets = tuple(
            (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1))

        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            g = build_row_padded(p, mass, coords0, D, N)
            s, miss = row_window_starts(g, D, W)
            acc_pad = window_sweep_pallas(
                g["psort_pad"], g["csort_pad"], s,
                offsets=offsets, block_size=128, window=W, z_hw=WS,
                eps=0.1, cut2=None)
            # map back to original order
            rowid = g["sid"] // D
            pad_pos = (g["row_start_pad"][rowid]
                       + jnp.arange(N, dtype=jnp.int32)
                       - g["row_start"][rowid])
            acc_sorted = acc_pad[pad_pos]
            return unsort_rows(acc_sorted, g["order"]) + miss * 0.0, None
        return body, jnp.zeros((N, 3))

    def mk_tile_near_current():
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            a, over = tile_near_field(
                p, mass, coords0, lo, cell, d=D, ws=WS, k=K, G=1.0,
                eps=0.1, impl="pallas")
            return a, None
        return body, jnp.zeros((N, 3))

    bench("moments segsum (sorted)", mk_moments)
    bench("  moment vals (N,10) build alone", mk_moment_vals)
    bench("pyramid upward pass", mk_pyramid_up)
    bench("v5 row-padded build", mk_v5_build)
    bench("v5 window starts + audit", mk_v5_starts)
    bench("v5 sweep kernel (W=256+128)", lambda: mk_v5_kernel(256))
    bench("v5 sweep kernel (W=384+128)", lambda: mk_v5_kernel(384))
    bench("v5 near-field TOTAL (build+starts+kernel+map)", mk_v5_total)
    bench("near tiles CURRENT total (for comparison)", mk_tile_near_current)

    # equivalence check: v5 vs current tile near field (expect close;
    # the tile path drops k-cap overflow rows, v5 has no cap)
    offsets = tuple((dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1))

    @jax.jit
    def v5_once(p):
        g = build_row_padded(p, mass, coords0, D, N)
        s, miss = row_window_starts(g, D, W)
        acc_pad = window_sweep_pallas(
            g["psort_pad"], g["csort_pad"], s, offsets=offsets,
            block_size=128, window=W, z_hw=WS, eps=0.1, cut2=None)
        rowid = g["sid"] // D
        pad_pos = (g["row_start_pad"][rowid]
                   + jnp.arange(N, dtype=jnp.int32)
                   - g["row_start"][rowid])
        return unsort_rows(acc_pad[pad_pos], g["order"]), miss

    @jax.jit
    def tile_once(p):
        a, over = tile_near_field(
            p, mass, coords0, lo, cell, d=D, ws=WS, k=K, G=1.0, eps=0.1,
            impl="pallas")
        return a, over

    a5, miss = v5_once(pos0)
    at, over = tile_once(pos0)
    diff = jnp.abs(a5 - at)
    scale = jnp.max(jnp.abs(at))
    nbad = int(jnp.sum(jnp.any(diff > 1e-4 * scale, axis=-1)))
    print(f"v5 vs tiles: max|d|/scale={float(jnp.max(diff) / scale):.3e} "
          f"rows>1e-4: {nbad} (tile k-cap overflow rows: {int(over)}) "
          f"v5 miss: {int(miss)}", flush=True)


if __name__ == "__main__":
    main()
