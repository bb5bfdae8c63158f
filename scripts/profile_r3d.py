"""TPU profile r3d — cumulative ladder over the 1M BH fast path.

Each rung replicates the _barnes_hut_forces tiles/pallas fast path up to a
stage boundary; rung differences attribute EVERY millisecond (the r3a
stage-in-isolation numbers left ~24 ms unaccounted — isolated stages de/
re-materialize differently than the fused program).

Usage: python scripts/profile_r3d.py [N]
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
EPS = 0.1
G = 1.0


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
        print(f"{name:46s} {best / reps * 1000:8.2f} ms/iter "
              f"(chk {chk:.4e})", flush=True)
        return best / reps
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        _barnes_hut_forces,
        _sorted_finest_moments,
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
        scatter_finest_moments,
        sym_matvec,
        sym3_matvec,
    )
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import tile_near_field
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()} N={N} L={LEVELS} k={K}",
          flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    # Shared prologue for every rung (replicates the fast path exactly).
    def prologue(p):
        lo, cell = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(p, mass, coords, D)
        ids_sorted = (
            grid.csort[:, 0] * D + grid.csort[:, 1]
        ) * D + grid.csort[:, 2]
        return lo, cell, coords, grid, ids_sorted

    def mk(rung):
        def make():
            def body(c, _):
                p = pos0 * (1 + c[0] * 1e-30)
                out = jnp.ravel(rung(p))[:8]
                return jnp.pad(out, (0, 8 - out.shape[0])), None
            return body, jnp.zeros((8,))
        return make

    def rung_grid(p):
        lo, cell, coords, grid, ids_sorted = prologue(p)
        return grid.psort[0, :3] + ids_sorted[0]

    def rung_moments(p):
        lo, cell, coords, grid, ids_sorted = prologue(p)
        packed_fast, miss = _sorted_finest_moments(
            grid, ids_sorted, lo, cell, D, 2)
        packed = jax.lax.cond(
            miss == 0,
            lambda: packed_fast,
            lambda: scatter_finest_moments(p, mass, coords, lo, cell, D, 2),
        )
        return packed[0, 0, 0] + grid.psort[0, :3].sum()

    def rung_moments_nocond(p):
        lo, cell, coords, grid, ids_sorted = prologue(p)
        packed_fast, miss = _sorted_finest_moments(
            grid, ids_sorted, lo, cell, D, 2)
        return packed_fast[0, 0, 0] + miss + grid.psort[0, :3].sum()

    def rung_moments_notranspose(p):
        # segsum only — skip the (10, d^3).T transpose inside
        from nbody_tpu.ops.barnes_hut import _outer6
        from nbody_tpu.ops.pallas_scatter import monotone_segment_sum
        lo, cell, coords, grid, ids_sorted = prologue(p)
        psort = grid.psort
        ctr = lo + (grid.csort.astype(psort.dtype) + 0.5) * cell
        mm = psort[:, 3:4]
        xr = psort[:, :3] - ctr
        vals = jnp.concatenate([mm, mm * xr, mm * _outer6(xr)], axis=-1)
        nc = D * D * D
        r_chunk, w_win = 256, 2560
        n_chunks = -(-nc // r_chunk)
        car = jnp.arange(n_chunks, dtype=jnp.int32)
        starts = grid.cell_start[jnp.minimum(car * r_chunk, nc)]
        packed_cm = monotone_segment_sum(
            vals, ids_sorted, starts, num_dest=nc, r=r_chunk, w=w_win)
        return packed_cm[:, 0] + grid.psort[0, :3].sum()

    def rung_far(p):
        lo, cell, coords, grid, ids_sorted = prologue(p)
        packed_fast, miss = _sorted_finest_moments(
            grid, ids_sorted, lo, cell, D, 2)
        packed = jax.lax.cond(
            miss == 0,
            lambda: packed_fast,
            lambda: scatter_finest_moments(p, mass, coords, lo, cell, D, 2),
        )
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        a_far, j_far, h_far = far_field_grid(pyr, WS, G, EPS, LEVELS)
        return a_far[0, 0, 0] + j_far[0, 0, 0, :3] + h_far[0, 0, 0, :3]

    def rung_farpick(p):
        lo, cell, coords, grid, ids_sorted = prologue(p)
        packed_fast, miss = _sorted_finest_moments(
            grid, ids_sorted, lo, cell, D, 2)
        packed = jax.lax.cond(
            miss == 0,
            lambda: packed_fast,
            lambda: scatter_finest_moments(p, mass, coords, lo, cell, D, 2),
        )
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        a_far, j_far, h_far = far_field_grid(pyr, WS, G, EPS, LEVELS)
        centers = lo + (coords.astype(p.dtype) + 0.5) * cell
        packed_g = jnp.concatenate([a_far, j_far, h_far], axis=-1)
        cid = (coords[:, 0] * D + coords[:, 1]) * D + coords[:, 2]
        vals = packed_g.reshape(D**3, packed_g.shape[-1])[cid]
        delta = p - centers
        pick = vals[:, :3] + sym_matvec(vals[:, 3:9], delta)
        pick = pick + 0.5 * sym_matvec(
            sym3_matvec(vals[:, 9:19], delta), delta)
        return pick[0] + grid.psort[0, :3]

    def rung_near_only(p):
        # near field alone on top of the shared prologue (no far work)
        lo, cell, coords, grid, ids_sorted = prologue(p)
        a_near, _over = tile_near_field(
            p, mass, coords, lo, cell,
            d=D, ws=WS, k=K, G=G, eps=EPS, grid=grid, impl="pallas")
        return a_near[0]

    def rung_full(p):
        return _barnes_hut_forces(
            p, mass, G, EPS, 0.5, levels=LEVELS, window=2048,
            near_engine="tiles", near_k=K, multipole_order=2,
            near_impl="pallas")[0]

    bench("L0 grid build (sort+gathers+cell_start)", mk(rung_grid))
    bench("L1 + moments segsum + cond", mk(rung_moments))
    bench("L1a + moments, no cond", mk(rung_moments_nocond))
    bench("L1b + segsum only, no transpose", mk(rung_moments_notranspose))
    bench("L2 + pyramid + far taps", mk(rung_far))
    bench("L3 + far pickup", mk(rung_farpick))
    bench("L0 + near field only (scatter+sweep+pickup)", mk(rung_near_only))
    bench("FULL fast path", mk(rung_full))


if __name__ == "__main__":
    main()
