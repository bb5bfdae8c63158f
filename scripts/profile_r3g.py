"""TPU profile r3g — surgical 1M buckets + the sparse hash tiles chain.

Known (r3f, grouped kernel): sweep k16 c512 = 17.95, near chain 43.17,
FULL 94.52. This batch isolates scatter/transpose/pickup/moments pieces,
A/Bs scatter (r, w) and segsum (r, w) pass counts, and measures the NEW
sparse-regime hash tiles engine end to end (d=128, k=8, w=256) on the
1M uniform scene (~1 particle/cell — the regime the engine exists for).

Usage: python scripts/profile_r3g.py
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 1_000_000
REPS = 10
LEVELS = 6
D = 1 << LEVELS
K = 16
WS = 1
G = 1.0
EPS = 0.1


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
              f"(chk {chk:.4e})", flush=True)
        return best / reps
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def mk(rung, ref):
    def make():
        def body(c, _):
            p = ref * (1 + c[0] * 1e-30)
            out = jnp.ravel(rung(p))[:8]
            return jnp.pad(out, (0, 8 - out.shape[0])), None
        return body, jnp.zeros((8,))
    return make


def main():
    from nbody_tpu.models.distributions import init_spherical, init_uniform
    from nbody_tpu.ops.barnes_hut import (
        _barnes_hut_forces,
        _outer6,
        _sorted_finest_moments,
        pyramid_geometry,
    )
    from nbody_tpu.ops.pallas_scatter import (
        monotone_scatter_tiles,
        monotone_segment_sum,
    )
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import _slot_pickup, tile_near_field
    from nbody_tpu.ops.spatial_hash import (
        spatial_hash_forces_tiles,
        spatial_hash_forces_tiles_sorted,
    )
    from nbody_tpu.types import SphericalDistParams, UniformDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    # ---------------- BH dense scene (1M spherical, L6/D64/K16) --------
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    lo, cell = pyramid_geometry(
        jnp.min(pos0, axis=0), jnp.max(pos0, axis=0), LEVELS)
    coords0 = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)
    grid0 = jax.jit(lambda p: build_sorted_grid(p, mass, coords0, D))(pos0)
    jax.block_until_ready(grid0)
    NC = D * D * D
    ids_sorted0 = (
        grid0.csort[:, 0] * D + grid0.csort[:, 1]
    ) * D + grid0.csort[:, 2]
    arange = jnp.arange(N, dtype=jnp.int32)
    rank0 = arange - grid0.cell_start[ids_sorted0]

    # scatter window-miss audit at candidate (r, w)
    for r_c, w_c in ((1024, 640), (512, 512), (256, 384), (256, 256)):
        m = NC * K
        nch = m // r_c
        car = jnp.arange(nch, dtype=jnp.int32)
        c0 = (car * r_c) // K
        c1 = jnp.minimum(((car + 1) * r_c + K - 1) // K, NC)
        st = grid0.cell_start[c0]
        miss = int(jnp.sum(jnp.maximum(
            grid0.cell_start[c1] - (st // 128) * 128 - w_c, 0)))
        print(f"BH scatter miss @ r={r_c} w={w_c}: {miss}", flush=True)

    def mk_scatter(r_c, w_c):
        m = NC * K
        nch = m // r_c
        car = jnp.arange(nch, dtype=jnp.int32)
        c0 = (car * r_c) // K
        starts = grid0.cell_start[c0]
        dest = jnp.where(rank0 < K, ids_sorted0 * K + rank0, 1 << 24)

        def rung(p):
            ps = grid0.psort * (1 + p[0, 0] * 1e-30)
            t = monotone_scatter_tiles(
                ps, dest, starts, lo, cell, k=K, d=D, r=r_c, w=w_c)
            return t[:, :8].sum(axis=0)
        return mk(rung, pos0)

    bench("BH scatter r=1024 w=640 (current)", mk_scatter(1024, 640))
    bench("BH scatter r=512 w=512", mk_scatter(512, 512))
    bench("BH scatter r=256 w=384", mk_scatter(256, 384))

    # scatter + relayout to sweep input (isolates the transpose cost)
    def mk_scatter_relayout():
        r_c, w_c = 1024, 640
        m = NC * K
        nch = m // r_c
        car = jnp.arange(nch, dtype=jnp.int32)
        starts = grid0.cell_start[(car * r_c) // K]
        dest = jnp.where(rank0 < K, ids_sorted0 * K + rank0, 1 << 24)

        def rung(p):
            ps = grid0.psort * (1 + p[0, 0] * 1e-30)
            t = monotone_scatter_tiles(
                ps, dest, starts, lo, cell, k=K, d=D, r=r_c, w=w_c)
            tt = t.reshape(4, D, D, D, K).transpose(4, 0, 1, 2, 3)
            tt2 = tt.transpose(2, 1, 0, 3, 4)  # kernel-side layout
            return tt2[:, 0, 0, 0, :8].sum(axis=0)
        return mk(rung, pos0)

    bench("BH scatter + full relayout to (Dx,4,K,Dy,Dz)",
          mk_scatter_relayout())

    # pickup alone (sorted output: no unsort)
    acc_slots0 = jax.jit(
        lambda: jnp.ones((K, 3, D, D, D), jnp.float32)
    )()
    jax.block_until_ready(acc_slots0)

    def mk_pickup():
        def rung(p):
            a = acc_slots0 * (1 + p[0, 0] * 1e-30)
            out = _slot_pickup(
                a, grid0, ids_sorted0, rank0, K, N, G, sorted_output=True)
            return out[0]
        return mk(rung, pos0)

    bench("BH slot pickup (sorted, no unsort)", mk_pickup())

    # moments pieces
    def mk_vals_build():
        def rung(p):
            ps = grid0.psort * (1 + p[0, 0] * 1e-30)
            ctr = lo + (grid0.csort.astype(ps.dtype) + 0.5) * cell
            mm = ps[:, 3:4]
            xr = ps[:, :3] - ctr
            vals = jnp.concatenate([mm, mm * xr, mm * _outer6(xr)], axis=-1)
            return vals[0]
        return mk(rung, pos0)

    bench("moments vals build (N,10)", mk_vals_build())

    def mk_segsum(r_c, w_c):
        nch = -(-NC // r_c)
        car = jnp.arange(nch, dtype=jnp.int32)
        starts = grid0.cell_start[jnp.minimum(car * r_c, NC)]
        ends = grid0.cell_start[jnp.minimum((car + 1) * r_c, NC)]
        miss = int(jnp.sum(jnp.maximum(
            ends - (starts // 128) * 128 - w_c, 0)))
        print(f"  segsum miss @ r={r_c} w={w_c}: {miss}", flush=True)

        def rung(p):
            ps = grid0.psort * (1 + p[0, 0] * 1e-30)
            ctr = lo + (grid0.csort.astype(ps.dtype) + 0.5) * cell
            mm = ps[:, 3:4]
            xr = ps[:, :3] - ctr
            vals = jnp.concatenate([mm, mm * xr, mm * _outer6(xr)], axis=-1)
            cm = monotone_segment_sum(
                vals, ids_sorted0, starts, num_dest=NC, r=r_c, w=w_c)
            return cm[:, 0]
        return mk(rung, pos0)

    bench("moments vals+segsum r=256 w=2560 (current)",
          mk_segsum(256, 2560))
    bench("moments vals+segsum r=256 w=2048", mk_segsum(256, 2048))
    bench("moments vals+segsum r=128 w=1152", mk_segsum(128, 1152))

    def mk_moments_full():
        def rung(p):
            ps = pos0 * (1 + p[0, 0] * 1e-30)
            packed, miss = _sorted_finest_moments(
                grid0, ids_sorted0, lo, cell, D, 2)
            return packed[0, 0, 0] + miss
        return mk(rung, pos0)

    bench("moments FULL (vals+segsum+transpose)", mk_moments_full())

    # cell_start alternatives (on prebuilt sorted ids)
    def mk_cellstart_ss():
        def rung(p):
            sid = ids_sorted0 + (p[0, 0] * 1e-30).astype(jnp.int32)
            q = jnp.arange(NC + 1, dtype=sid.dtype)
            cs = jnp.searchsorted(sid, q, side="left").astype(jnp.int32)
            return cs[:8].astype(jnp.float32)
        return mk(rung, pos0)

    bench("cell_start via searchsorted (current)", mk_cellstart_ss())

    # ---------------- sparse hash scene (1M uniform, ~1/cell) ----------
    del grid0, acc_slots0
    sp = init_uniform(
        jax.random.PRNGKey(42), N,
        UniformDistParams(min_bounds=(-50.0, -50.0, -50.0),
                          max_bounds=(50.0, 50.0, 50.0)))
    pos_s = jax.device_put(sp.pos)
    mass_s = jax.device_put(sp.mass)
    jax.block_until_ready((pos_s, mass_s))
    HD, HK, HW = 128, 8, 256

    lo_s = jnp.min(pos_s, axis=0)
    coords_s = jnp.clip(
        jnp.floor((pos_s - lo_s) / 1.0).astype(jnp.int32), 0, HD - 1)
    grid_s = jax.jit(
        lambda p: build_sorted_grid(p, mass_s, coords_s, HD))(pos_s)
    jax.block_until_ready(grid_s)

    def mk_hash_grid():
        def rung(p):
            lo2 = jnp.min(p, axis=0)
            crd = jnp.clip(
                jnp.floor((p - lo2) / 1.0).astype(jnp.int32), 0, HD - 1)
            g = build_sorted_grid(p, mass_s, crd, HD)
            return g.psort[0, :3] + g.cell_start[0].astype(jnp.float32)
        return mk(rung, pos_s)

    bench("hash grid build (sort+gathers+cell_start) d=128", mk_hash_grid())

    def mk_hash_sweep(chunk):
        ids_s = (
            grid_s.csort[:, 0] * HD + grid_s.csort[:, 1]
        ) * HD + grid_s.csort[:, 2]
        rank_s = jnp.arange(N, dtype=jnp.int32) - grid_s.cell_start[ids_s]
        m = HD**3 * HK
        car = jnp.arange(m // 1024, dtype=jnp.int32)
        starts = grid_s.cell_start[(car * 1024) // HK]
        dest = jnp.where(rank_s < HK, ids_s * HK + rank_s, 1 << 24)
        tiles_cm = jax.jit(
            lambda: monotone_scatter_tiles(
                grid_s.psort, dest, starts, lo_s, jnp.float32(1.0),
                k=HK, d=HD, r=1024, w=HW)
        )()
        tt = jax.jit(
            lambda t: t.reshape(4, HD, HD, HD, HK).transpose(4, 0, 1, 2, 3)
        )(tiles_cm)
        jax.block_until_ready(tt)

        def rung(p):
            t = tt * (1 + p[0, 0] * 1e-30)
            acc = tile_sweep_pallas(
                t, k=HK, d=HD, ws=1, eps=EPS, cutoff2=4.0, chunk=chunk)
            return acc[0, :, 64, 64, :8].sum(axis=0)
        return mk(rung, pos_s)

    bench("hash sweep d=128 k=8 chunk=512", mk_hash_sweep(512))
    bench("hash sweep d=128 k=8 chunk=1024", mk_hash_sweep(1024))

    def mk_hash_full():
        def rung(p):
            acc = spatial_hash_forces_tiles(
                p, mass_s, G, EPS, cutoff=2.0, cell_size=1.0,
                d=HD, k=HK, build_window=HW, impl="pallas")
            return acc[0]
        return mk(rung, pos_s)

    bench("hash tiles FULL force (unsorted out)", mk_hash_full())

    def mk_hash_sorted():
        def rung(p):
            acc, ps, order = spatial_hash_forces_tiles_sorted(
                p, mass_s, G, EPS, cutoff=2.0, cell_size=1.0,
                d=HD, k=HK, build_window=HW, impl="pallas")
            return acc[0] + ps[0, :3]
        return mk(rung, pos_s)

    bench("hash tiles FULL force (sorted out)", mk_hash_sorted())

    # BH FULL sanity (should match r3f's 94.52)
    def mk_bh_full():
        def rung(p):
            return _barnes_hut_forces(
                p, mass, G, EPS, 0.5, levels=LEVELS, window=2048,
                near_engine="tiles", near_k=K, multipole_order=2,
                near_impl="pallas")[0]
        return mk(rung, pos0)

    bench("BH FULL fast path (sanity)", mk_bh_full())


if __name__ == "__main__":
    main()
