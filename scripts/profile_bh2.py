"""Fine-grained TPU profiling: near-field fixed costs + quad far field.

Usage: python scripts/profile_bh2.py [N] [levels]
"""

import sys
import time

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
LEVELS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
REPS = 5


def bench(name, make_body, reps=REPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    c = run(init)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = run(init)
    chk = float(jnp.sum(c[0]) if isinstance(c, tuple) else jnp.sum(c))
    dt = time.perf_counter() - t0
    print(f"{name:40s} {dt / reps * 1000:8.1f} ms/iter  (chk {chk:.4e})",
          flush=True)
    return dt / reps


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        barnes_hut_forces,
        build_pyramid,
        far_field_grid,
    )
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()} N={N} levels={LEVELS}", flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0)
    )
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready(pos0)
    d = 1 << LEVELS

    pyr0 = build_pyramid(pos0, mass, LEVELS)
    lo, cell = pyr0.lo, pyr0.cell
    coords0 = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, d - 1)
    ids0 = (coords0[:, 0] * d + coords0[:, 1]) * d + coords0[:, 2]
    grid0 = build_sorted_grid(pos0, mass, coords0, d)
    jax.block_until_ready((grid0.psort, ids0))

    def dep(x, c):
        # data-dependence injector: c is a traced scalar from the carry
        return x + (c - c).astype(x.dtype) if x.dtype.kind in "iu" else x * (1 + c * 1e-30)

    # 1. raw argsort of the cell ids
    def mk_argsort():
        def body(c, _):
            ids = ids0 + (c[0] - c[0])
            order = jnp.argsort(ids).astype(jnp.int32)
            return order, None
        return body, jnp.zeros((N,), jnp.int32)

    # 2. full build_sorted_grid
    def mk_bsg():
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            g = build_sorted_grid(p, mass, coords0, d)
            return g.psort[:, :3] + g.cell_start[0] * 0, None
        return body, pos0

    # 3. tile scatter only (k=16): build the (d,d,d,k,4) tensor
    def mk_tile_build(k):
        def body(c, _):
            p = grid0.psort * (1 + c[0, 0] * 1e-30)
            arange = jnp.arange(N, dtype=jnp.int32)
            ids_sorted = (
                grid0.csort[:, 0] * d + grid0.csort[:, 1]
            ) * d + grid0.csort[:, 2]
            rank = arange - grid0.cell_start[ids_sorted]
            rank_capped = jnp.minimum(rank, k)
            tiles = jnp.zeros((d, d, d, k + 1, 4), jnp.float32).at[
                grid0.csort[:, 0], grid0.csort[:, 1], grid0.csort[:, 2],
                rank_capped,
            ].set(p)
            return tiles[..., :k, :].reshape(d, d, d, k * 4)[0, 0] * 1.0 + c * 0, None
        return body, jnp.zeros((d, 4 * 16), jnp.float32)

    # 4. pickup only: gather per-slot acc back to particles + inverse scatter
    def mk_pickup(k):
        acc_slots = jnp.ones((k, 3, d, d, d), jnp.float32)
        arange = jnp.arange(N, dtype=jnp.int32)
        ids_sorted = (
            grid0.csort[:, 0] * d + grid0.csort[:, 1]
        ) * d + grid0.csort[:, 2]
        rank = arange - grid0.cell_start[ids_sorted]

        def body(c, _):
            a = acc_slots * (1 + c[0, 0] * 1e-30)
            rr = jnp.minimum(rank, k - 1)
            acc_sorted = a[
                rr, :, grid0.csort[:, 0], grid0.csort[:, 1], grid0.csort[:, 2]
            ]
            out = jnp.zeros((N, 3), jnp.float32).at[grid0.order].set(acc_sorted)
            return out, None
        return body, jnp.zeros((N, 3))

    # 5. pyramid order=2 build
    def mk_pyr2():
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            pyr = build_pyramid(p, mass, LEVELS, order=2)
            return p + pyr.quads[0][0, 0, 0, 0] * 0, None
        return body, pos0

    # 6. far field quad ws=1
    def mk_far_quad(ws):
        pyr = build_pyramid(pos0, mass, LEVELS, order=2)

        def body(c, _):
            pyr2 = jax.tree.map(
                lambda x: x * (1 + c * 1e-30) if x.ndim >= 3 else x, pyr
            )
            a, j = far_field_grid(pyr2, ws, 1.0, 0.1, LEVELS)[:2]
            return c * 0 + jnp.sum(a) + jnp.sum(j), None
        return body, jnp.zeros(())

    # 7. FULL BH theta=0.5, order=2 (ws=1), tiles k=16 / k=12
    def mk_full(k):
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            a = barnes_hut_forces(
                p, mass, 1.0, 0.1, 0.5, levels=LEVELS,
                near_engine="tiles", near_k=k, multipole_order=2,
            )
            return a, None
        return body, jnp.zeros((N, 3))

    bench("argsort 1M int32", mk_argsort)
    bench("build_sorted_grid", mk_bsg)
    bench("tile scatter k=16", lambda: mk_tile_build(16))
    bench("pickup k=16", lambda: mk_pickup(16))
    bench("pyramid order=2", mk_pyr2)
    bench("far quad ws=1", lambda: mk_far_quad(1))
    bench("FULL BH th=0.5 quad ws=1 k=16", lambda: mk_full(16))
    bench("FULL BH th=0.5 quad ws=1 k=12", lambda: mk_full(12))


if __name__ == "__main__":
    main()
