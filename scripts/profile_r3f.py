"""TPU profile r3f — occupancy skip in the near sweep kernel.

History: the per-ROW skip version measured 38.8-57 ms (vs 16.2 straight
-line) — 48 branches/chunk each guarding 9 vector steps destroyed the
software pipelining. This batch measures the GROUP-skip rewrite (8-row
slot groups; group 0 branch-free in registers; one branch per tail
group with 27·8-step straight-line interiors).

Prior facts (r3d/r3e): isolated sweep ~16 ms at 1M/L6/k16 w_win=640;
near chain 57.7; FULL fast path 92.2 ms. Overflow: k=16 → 317, k=24 → 0.

Usage: python scripts/profile_r3f.py [N]
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


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        _barnes_hut_forces,
        pyramid_geometry,
    )
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import tile_near_field
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()} N={N} L={LEVELS}", flush=True)
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
    ids_sorted0 = (
        grid0.csort[:, 0] * D + grid0.csort[:, 1]
    ) * D + grid0.csort[:, 2]
    arange = jnp.arange(N, dtype=jnp.int32)
    rank_sorted0 = arange - grid0.cell_start[ids_sorted0]
    for k in (16, 24, 32):
        over = int(jnp.sum((rank_sorted0 >= k).astype(jnp.int32)))
        print(f"overflow @ k={k}: {over}", flush=True)

    # Prebuilt slot tensors per k (sweep-input layout)
    def tiles_for(k):
        m = D * D * D * k
        r_chunk = 1024
        dest = jnp.where(
            rank_sorted0 < k, ids_sorted0 * k + rank_sorted0, 1 << 24)
        n_chunks = m // r_chunk
        car = jnp.arange(n_chunks, dtype=jnp.int32)
        c0 = (car * r_chunk) // k
        starts = grid0.cell_start[c0]
        tiles_cm = jax.jit(
            lambda: monotone_scatter_tiles(
                grid0.psort, dest, starts, lo, cell,
                k=k, d=D, r=r_chunk, w=640)
        )()
        tt = jax.jit(
            lambda t: t.reshape(4, D, D, D, k).transpose(4, 0, 1, 2, 3)
        )(tiles_cm)
        jax.block_until_ready(tt)
        return tt

    for k in (16, 24):
        tt = tiles_for(k)

        for chunk in (256, 512, 1024):
            def mk_sweep(tt=tt, k=k, chunk=chunk):
                def body(c, _):
                    t = tt * (1 + c[0] * 1e-30)
                    acc = tile_sweep_pallas(
                        t, k=k, d=D, ws=WS, eps=EPS, chunk=chunk)
                    return acc[0, :, 0, 0, :8].sum(axis=0), None
                return body, jnp.zeros((8,))
            bench(f"sweep rowskip k={k} chunk={chunk}",
                  lambda mk=mk_sweep: mk())
        del tt

    def mk_near(k):
        def make():
            def body(c, _):
                p = pos0 * (1 + c[0] * 1e-30)
                a_near, _over = tile_near_field(
                    p, mass, coords0, lo, cell,
                    d=D, ws=WS, k=k, G=G, eps=EPS, impl="pallas")
                return jnp.pad(a_near[0], (0, 5)), None
            return body, jnp.zeros((8,))
        return make

    bench("near chain (sort+scatter+sweep+pickup) k=16", mk_near(16))
    bench("near chain (sort+scatter+sweep+pickup) k=24", mk_near(24))

    def mk_full(k):
        def make():
            def body(c, _):
                p = pos0 * (1 + c[0] * 1e-30)
                out = _barnes_hut_forces(
                    p, mass, G, EPS, 0.5, levels=LEVELS, window=2048,
                    near_engine="tiles", near_k=k, multipole_order=2,
                    near_impl="pallas")[0]
                return out[0] + jnp.zeros((8,)), None
            return body, jnp.zeros((8,))
        return make

    bench("FULL fast path k=16", mk_full(16))
    bench("FULL fast path k=24", mk_full(24))


if __name__ == "__main__":
    main()
