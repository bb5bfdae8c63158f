"""TPU profile: sub-phases of the tile near-field build + pickup.

profile_bh6 showed build+pickup = 143 ms of the 245 ms 1M BH step (the
Pallas sweep itself is 25 ms). This breaks the 143 ms down: argsort,
sorted-payload gather, rank/segment math, slot scatter, transposes,
pickup gather, unsort scatter — to decide which gathers/scatters to
restructure (CLAUDE.md: XLA random gathers ≈ 1e8 elems/s).

Usage: python scripts/profile_build.py [N]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = 10


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
    from nbody_tpu.ops.barnes_hut import build_pyramid
    from nbody_tpu.types import SphericalDistParams

    LEVELS = 6
    D = 1 << LEVELS
    K = 16
    print(f"backend={jax.default_backend()} N={N} L={LEVELS} K={K}",
          flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    pyr = build_pyramid(pos0, mass, LEVELS)
    lo_, cell_ = pyr.lo, pyr.cell
    coords = jnp.clip(((pos0 - lo_) / cell_).astype(jnp.int32), 0, D - 1)
    ids = (coords[:, 0] * D + coords[:, 1]) * D + coords[:, 2]
    order = jnp.argsort(ids).astype(jnp.int32)
    ids_sorted = ids[order]
    p4 = jnp.concatenate([pos0, mass[:, None]], axis=-1)
    psort = p4[order]
    ar = jnp.arange(N, dtype=jnp.int32)
    first = jnp.full((D**3 + 1,), N, jnp.int32).at[ids_sorted].min(ar)
    cell_start = jnp.flip(jax.lax.cummin(jnp.flip(first)))
    rank = ar - cell_start[ids_sorted]
    flat = ids_sorted * (K + 1) + jnp.minimum(rank, K)
    nc = D**3
    acc_slots = jnp.zeros((K, 3, D, D, D))
    jax.block_until_ready((order, ids_sorted, psort, cell_start, rank, flat))

    def mk(name, fn, init_c):
        def make():
            return fn, init_c
        return make

    def f_argsort(c, _):
        return jnp.argsort(ids + c[0]).astype(jnp.int32), None

    def f_gather_rows4(c, _):
        return p4[order + c[0, 0] * 0], None  # (N, 4) row gather

    def f_gather_1col(c, _):
        return ids[order + c[0] * 0].astype(jnp.int32), None

    def f_segment(c, _):
        f1 = jnp.full((nc + 1,), N, jnp.int32).at[ids_sorted + c[0] * 0].min(ar)
        cs = jnp.flip(jax.lax.cummin(jnp.flip(f1)))
        return cs[ids_sorted] + c[0] * 0, None

    def f_scatter_set(c, _):
        init = jnp.zeros((nc * (K + 1), 4)) + c[0, 0]
        t = init.at[flat].set(psort)
        return t[: nc * (K + 1)].reshape(D, D, D, K + 1, 4)[
            :, :, :, :K, :].reshape(nc * K, 4), None

    def f_transpose(c, _):
        t = (c.reshape(D, D, D, K, 4).transpose(3, 4, 0, 1, 2)
             .reshape(K, 4, D, D, D))
        return t.transpose(2, 3, 4, 0, 1).reshape(nc * K, 4) * 1.000001, None

    def f_pickup(c, _):
        acc_t = (acc_slots + c[0, 0]).transpose(2, 3, 4, 0, 1).reshape(
            nc * K, 3)
        lidr = jnp.minimum(ids_sorted, nc - 1) * K + jnp.minimum(rank, K - 1)
        picked = acc_t[lidr]
        return picked, None

    def f_unsort(c, _):
        return jnp.zeros((N, 3)).at[order].set(c), None

    bench("argsort 1M", mk("", f_argsort, jnp.zeros((N,), jnp.int32)))
    bench("payload row gather (N,4)", mk("", f_gather_rows4,
                                         jnp.zeros((N, 4))))
    bench("single-col gather (N,)", mk("", f_gather_1col,
                                       jnp.zeros((N,), jnp.int32)))
    bench("segment index (scatter-min+cummin+gather)",
          mk("", f_segment, jnp.zeros((N,), jnp.int32)))
    bench("slot scatter-set (N rows -> 4.4M,4)",
          mk("", f_scatter_set, jnp.zeros((nc * K, 4))))
    bench("tiles transpose roundtrip", mk("", f_transpose,
                                          jnp.zeros((nc * K, 4))))
    bench("pickup gather (N rows of 3)", mk("", f_pickup,
                                            jnp.zeros((N, 3))))
    bench("unsort scatter (N rows of 3)", mk("", f_unsort,
                                             jnp.zeros((N, 3))))
    print("exit=0", flush=True)


if __name__ == "__main__":
    main()
