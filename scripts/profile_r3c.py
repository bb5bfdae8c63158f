"""TPU profile r3c — re-measure the 1M BH budget after the r3 kernel work.

New in this round vs profile_r3a: the scatter's empty-chunk skip +
3-way-bf16 split, and the sweep kernel's source-broadcast rewrite with
the geometric chunk skip. A/Bs:
  * sweep lane chunk 128 / 256 / 512 (register-pressure sweet spot)
  * scatter split3 on/off and window 512/640

Usage: python scripts/profile_r3c.py [N]
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
    from nbody_tpu.ops.barnes_hut import _barnes_hut_forces
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()} N={N} L={LEVELS} k={K}",
          flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    from nbody_tpu.ops.barnes_hut import pyramid_geometry
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
    arange = jnp.arange(N, dtype=jnp.int32)
    rank0 = arange - grid0.cell_start[ids_sorted0]
    nc = D * D * D
    r_chunk = 1024
    n_chunks = nc * K // r_chunk
    chunk_ar = jnp.arange(n_chunks, dtype=jnp.int32)
    c0 = jnp.minimum(chunk_ar * r_chunk // K, nc)
    starts0 = grid0.cell_start[c0]
    dest0 = jnp.where(rank0 < K, ids_sorted0 * K + rank0, 1 << 24)
    tiles_cm0 = jax.jit(
        lambda: monotone_scatter_tiles(
            grid0.psort, dest0, starts0, lo, cell,
            k=K, d=D, r=r_chunk, w=640)
    )()
    jax.block_until_ready(tiles_cm0)
    tiles_t0 = jax.jit(
        lambda t: t.reshape(4, D, D, D, K).transpose(4, 0, 1, 2, 3)
    )(tiles_cm0)
    jax.block_until_ready(tiles_t0)

    # ---- full step ----
    def mk_full():
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            a = _barnes_hut_forces(
                p, mass, 1.0, 0.1, 0.5, levels=LEVELS, window=2048,
                near_engine="tiles", near_k=K, multipole_order=2,
                near_impl="pallas")
            return a, None
        return body, jnp.zeros((N, 3))

    def mk_scatter(w_win, split3):
        def make():
            def body(c, _):
                ps = grid0.psort * (1 + c[0, 0] * 1e-30)
                t = monotone_scatter_tiles(
                    ps, dest0, starts0, lo, cell, k=K, d=D, r=r_chunk,
                    w=w_win, split3=split3)
                return ps[:, :2] + t[0, 0] * 0, None
            return body, jnp.zeros((N, 2))
        return make

    def mk_sweep(chunk):
        def make():
            def body(c, _):
                t = tiles_t0 * (1 + c[0, 0, 0, 0, 0] * 1e-30)
                a = tile_sweep_pallas(t, k=K, d=D, ws=WS, eps=0.1,
                                      chunk=chunk)
                return a[:1], None
            return body, jnp.zeros((1, 3, D, D, D))
        return make

    bench("FULL BH step (new kernels)", mk_full)
    bench("scatter w=640 split3", mk_scatter(640, True))
    bench("scatter w=640 HIGHEST", mk_scatter(640, False))
    bench("scatter w=512 split3", mk_scatter(512, True))
    bench("sweep chunk=128", mk_sweep(128))
    bench("sweep chunk=256", mk_sweep(256))
    bench("sweep chunk=512", mk_sweep(512))


if __name__ == "__main__":
    main()
