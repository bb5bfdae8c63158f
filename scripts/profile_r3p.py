"""TPU profile r3p — sub-bisect the 16 ms scatter PREP (r3o row n1).

r3o measured grid 9.4 but grid+prep 25.4 — the rank/dest/starts stage
costs ~16 ms when its parts should sum to ~6. Rows isolate each part,
plus the cummax envelope the monotone_* wrappers recompute when
``nonempty`` is not passed (the callers already have ends>starts).

All rows are honest sum-readbacks, min of 3 timed scans of REPS.
Usage: python scripts/profile_r3p.py
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
            out = rung(p)
            s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
            return jnp.full((8,), s * 1e-30), None
        return body, jnp.zeros((8,))
    return make


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import pyramid_geometry
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.sorted_window import (
        build_sorted_grid,
        use_full_cell_start,
    )
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    num_cells = D * D * D
    g_f = 128 // math.gcd(D * K, 128)
    r_chunk = g_f * D * K
    q_cells = r_chunk // K
    w_win = 640 if q_cells <= 64 else -(-(q_cells * 10) // 128) * 128
    m_slots = num_cells * K
    n_chunks = m_slots // r_chunk

    def rung_grid(p):
        lo, cell = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(
            p, mass, coords, D,
            with_cell_start=use_full_cell_start(num_cells),
        )
        return grid, lo, cell

    # --- prep sub-bisection --------------------------------------------
    def p0(p):
        grid, lo, cell = rung_grid(p)
        return (grid.ids,)

    bench("p0 sort+ids only (payload DCE'd)", mk(p0, pos0))

    def p1(p):
        grid, lo, cell = rung_grid(p)
        return grid.ids, grid.cell_start

    bench("p1 p0+cell_start", mk(p1, pos0))

    def p2(p):
        grid, lo, cell = rung_grid(p)
        return grid.ids, grid.cell_start, grid.psort

    bench("p2 p1+payload gather (= r3l grid)", mk(p2, pos0))

    def p3(p):
        grid, lo, cell = rung_grid(p)
        rank = jnp.arange(N, dtype=jnp.int32) - grid.cell_start[grid.ids]
        return grid.psort, rank

    bench("p3 p2+rank gather", mk(p3, pos0))

    def p4(p):
        grid, lo, cell = rung_grid(p)
        rank = jnp.arange(N, dtype=jnp.int32) - grid.cell_start[grid.ids]
        overflow = jnp.sum((rank >= K).astype(jnp.int32))
        dest = jnp.where(rank < K, grid.ids * K + rank, 1 << 24)
        return grid.psort, dest, overflow

    bench("p4 p3+dest+overflow", mk(p4, pos0))

    def starts_ends(grid):
        chunk_ar = jnp.arange(n_chunks, dtype=jnp.int32)
        c0 = (chunk_ar * r_chunk) // K
        c1 = jnp.minimum(
            ((chunk_ar + 1) * r_chunk + K - 1) // K, num_cells)
        return grid.cell_start[c0], grid.cell_start[c1]

    def p5(p):
        grid, lo, cell = rung_grid(p)
        rank = jnp.arange(N, dtype=jnp.int32) - grid.cell_start[grid.ids]
        overflow = jnp.sum((rank >= K).astype(jnp.int32))
        dest = jnp.where(rank < K, grid.ids * K + rank, 1 << 24)
        starts, ends = starts_ends(grid)
        span = ends - (starts // 128) * 128
        nwin = -(-span // w_win)
        return grid.psort, dest, overflow, starts, nwin

    bench("p5 p4+starts/nwin (= r3o n1)", mk(p5, pos0))

    # --- cummax envelope cost (what the wrapper recomputes) -------------
    def c1(p):
        grid, lo, cell = rung_grid(p)
        rank = jnp.arange(N, dtype=jnp.int32) - grid.cell_start[grid.ids]
        dest = jnp.where(rank < K, grid.ids * K + rank, 1 << 24)
        denv = jax.lax.cummax(
            jnp.where(dest < (1 << 24), dest, dest.dtype.type(-1)))
        bounds = jnp.arange(n_chunks + 1, dtype=dest.dtype) * r_chunk
        idx = jnp.searchsorted(denv, bounds, side="left")
        return grid.psort, dest, idx

    bench("c1 p4+cummax envelope (wrapper cost)", mk(c1, pos0))

    # --- scatter with vs without explicit nonempty ----------------------
    def rung_scatter(p, pass_nonempty):
        grid, lo, cell = rung_grid(p)
        rank = jnp.arange(N, dtype=jnp.int32) - grid.cell_start[grid.ids]
        overflow = jnp.sum((rank >= K).astype(jnp.int32))
        dest = jnp.where(rank < K, grid.ids * K + rank, 1 << 24)
        starts, ends = starts_ends(grid)
        span = ends - (starts // 128) * 128
        nwin = -(-span // w_win)
        kw = dict(nonempty=ends > starts) if pass_nonempty else {}
        tiles_cm = monotone_scatter_tiles(
            grid.psort, dest, starts, lo, cell,
            k=K, d=D, r=r_chunk, w=w_win, q=q_cells, nwin=nwin, **kw,
        )
        return tiles_cm, overflow

    bench("s1 scatter, wrapper cummax (= r3o n2)",
          mk(lambda p: rung_scatter(p, False), pos0))
    bench("s2 scatter, nonempty passed",
          mk(lambda p: rung_scatter(p, True), pos0))

    # --- light grid build (no cell_start) + searchsorted starts ---------
    from nbody_tpu.ops.sorted_window import cell_starts_at

    def p6(p):
        lo, cell = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(p, mass, coords, D, with_cell_start=False)
        chunk_ar = jnp.arange(n_chunks, dtype=jnp.int32)
        c0 = (chunk_ar * r_chunk) // K
        c1 = jnp.minimum(
            ((chunk_ar + 1) * r_chunk + K - 1) // K, num_cells)
        starts = cell_starts_at(grid.ids, c0)
        ends = cell_starts_at(grid.ids, c1)
        return grid.psort, grid.ids, starts, ends

    bench("p6 light grid + searchsorted starts", mk(p6, pos0))


if __name__ == "__main__":
    main()
