"""TPU profile r3j — bisect the v5 composition regression.

r3i facts (honest sum readbacks): pieces sum to ~39 ms (grid 16.8,
scatter 6.3, relayout 3.0, sweep 4.0, pickup-legacy 8.5) but the composed
near chain reads 94 ms and FULL sorted 136 ms (Verlet 146.5 — a ~30 ms
REGRESSION vs r3h's 116.9). window_miss is 0 on this scene (verified on
CPU), so the lax.cond SHOULD take the pallas branch. Suspects: the cond
itself (select-ification / fusion barrier), the slice3 pickup (12.1 vs
8.5 legacy), the payload-bitcast grid build in composition.

Variants measured here, all sum-readback:
  A  near chain: cond + slice3 pickup      (the r3i regression, control)
  B  near chain: DIRECT pallas tiles (no cond) + slice3
  C  near chain: cond + legacy pickup
  D  near chain: direct + legacy pickup
  E  grid build v4-style (two gathers, no bitcast payload)
  F  far chain honest (grid+moments+pyramid+taps, sum readback)

Usage: python scripts/profile_r3j.py
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
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:400]}",
              flush=True)
        return None


def mk(rung, ref):
    def make():
        def body(c, _):
            p = ref * (1 + c[0] * 1e-30)
            out = rung(p)
            s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
            return jnp.full((8,), s * 1e-30), None
        return body, jnp.zeros((8,))
    return make


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        _sorted_finest_moments,
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
        scatter_finest_moments,
    )
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas_plane
    from nbody_tpu.ops.sorted_window import build_sorted_grid, unsort_rows
    from nbody_tpu.ops.tile_sweep import _xla_tile_build
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    g_f = 128 // math.gcd(D * K, 128)
    r_chunk = g_f * D * K
    q_cells = r_chunk // K
    m = D * D * D * K
    n_chunks = m // r_chunk
    W = 640

    def near_chain(p, *, use_cond, pickup):
        lo2, cell2 = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        crd = jnp.clip(((p - lo2) / cell2).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(p, mass, crd, D)
        ids_sorted = (
            grid.csort[:, 0] * D + grid.csort[:, 1]
        ) * D + grid.csort[:, 2]
        rank = jnp.arange(N, dtype=jnp.int32) - grid.cell_start[ids_sorted]
        dest = jnp.where(rank < K, ids_sorted * K + rank, 1 << 24)
        car = jnp.arange(n_chunks, dtype=jnp.int32)
        starts = grid.cell_start[(car * r_chunk) // K]
        ends = grid.cell_start[
            jnp.minimum(((car + 1) * r_chunk + K - 1) // K, D**3)]
        miss = jnp.sum(jnp.maximum(ends - (starts // 128) * 128 - W, 0))

        def _pal():
            return monotone_scatter_tiles(
                grid.psort, dest, starts, lo2, cell2,
                k=K, d=D, r=r_chunk, w=W, q=q_cells)

        def _xla():
            tiles = _xla_tile_build(
                grid.psort, ids_sorted, rank, lo2, cell2, d=D, k=K,
                dtype=p.dtype)
            return (
                tiles.reshape(D, D // g_f, g_f, D, K, 4)
                .transpose(5, 0, 1, 4, 2, 3)
                .reshape(4, m)
            )

        if use_cond:
            tiles_cm = jax.lax.cond(miss == 0, _pal, _xla)
        else:
            tiles_cm = _pal()
        tiles_plane = (
            tiles_cm.reshape(4, D, D // g_f, K, g_f, D)
            .transpose(1, 0, 3, 2, 4, 5)
            .reshape(D, 4, K, D * D)
        )
        acc_raw = tile_sweep_pallas_plane(
            tiles_plane, k=K, d=D, ws=1, eps=EPS)
        rank_read = jnp.minimum(rank, K - 1)
        if pickup == "slice3":
            xi = ids_sorted // (D * D)
            lane = ids_sorted - xi * (D * D)
            acc_sorted = acc_raw[xi, :, rank_read, lane]
        else:
            l = D * D
            acc_slots = (
                acc_raw[:, :, :, :l].reshape(D, 3, K, D, D)
                .transpose(2, 1, 0, 3, 4)
            )
            acc_t = acc_slots.transpose(2, 3, 4, 0, 1).reshape(
                D * D * D * K, 3)
            acc_sorted = acc_t[ids_sorted * K + rank_read]
        acc_sorted = jnp.where((rank < K)[:, None], acc_sorted, 0.0)
        return G * acc_sorted, miss

    for name, kw in (
        ("A near: cond + slice3 (r3i control)",
         dict(use_cond=True, pickup="slice3")),
        ("B near: direct + slice3",
         dict(use_cond=False, pickup="slice3")),
        ("C near: cond + legacy pickup",
         dict(use_cond=True, pickup="legacy")),
        ("D near: direct + legacy pickup",
         dict(use_cond=False, pickup="legacy")),
    ):
        bench(name, mk(lambda p, kw=kw: near_chain(p, **kw), pos0))

    # E: v4-style grid build (two gathers) honest
    lo, cell = pyramid_geometry(
        jnp.min(pos0, axis=0), jnp.max(pos0, axis=0), LEVELS)
    coords0 = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)

    def grid_v4(p):
        ids = (
            (coords0[:, 0] * D + coords0[:, 1]) * D + coords0[:, 2]
        ).astype(jnp.int32)
        order = jnp.argsort(ids).astype(jnp.int32)
        sorted_ids = ids[order]
        arange = jnp.arange(N, dtype=jnp.int32)
        first = (
            jnp.full((D**3 + 1,), N, jnp.int32).at[sorted_ids].min(arange)
        )
        cell_start = jnp.flip(jax.lax.cummin(jnp.flip(first)))
        psort = jnp.concatenate([p, mass[:, None]], axis=-1)[order]
        csort = coords0[order]
        return psort, csort, cell_start

    bench("E grid build v4 (two gathers)", mk(grid_v4, pos0))

    def grid_v5(p):
        gridb = build_sorted_grid(p, mass, coords0, D)
        return gridb.psort, gridb.csort, gridb.cell_start

    bench("E' grid build v5 (payload bitcast)", mk(grid_v5, pos0))

    # F: far chain honest
    def far_chain(p):
        lo2, cell2 = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        crd = jnp.clip(((p - lo2) / cell2).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(p, mass, crd, D)
        ids_sorted = (
            grid.csort[:, 0] * D + grid.csort[:, 1]
        ) * D + grid.csort[:, 2]
        packed_fast, miss = _sorted_finest_moments(
            grid, ids_sorted, lo2, cell2, D, 2)
        packed = jax.lax.cond(
            miss == 0,
            lambda: packed_fast,
            lambda: scatter_finest_moments(p, mass, crd, lo2, cell2, D, 2),
        )
        pyr = pyramid_from_packed(packed, lo2, cell2, LEVELS, 2)
        return far_field_grid(pyr, 1, G, EPS, LEVELS)

    bench("F far chain honest (grid+moments+pyr+taps)",
          mk(far_chain, pos0))


if __name__ == "__main__":
    main()
