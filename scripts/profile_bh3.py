"""TPU profile round 3: conv far field + linearized scatters + level sweep.

Usage: python scripts/profile_bh3.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = 5


def bench(name, make_body, reps=REPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    try:
        c = run(init)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        c = run(init)
        chk = float(jnp.sum(c[0]) if isinstance(c, tuple) else jnp.sum(c))
        dt = time.perf_counter() - t0
        print(f"{name:44s} {dt / reps * 1000:8.1f} ms/iter  (chk {chk:.4e})",
              flush=True)
        return dt / reps
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        barnes_hut_forces,
        build_pyramid,
        far_field_grid,
    )
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import tile_near_field
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()} N={N}", flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0)
    )
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready(pos0)

    def mk_pyr2(levels):
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            pyr = build_pyramid(p, mass, levels, order=2)
            return p + pyr.quads[0][0, 0, 0, 0] * 0, None
        return body, pos0

    def mk_far_conv(levels, ws):
        pyr = build_pyramid(pos0, mass, levels, order=2)

        def body(c, _):
            pyr2 = jax.tree.map(
                lambda x: x * (1 + c * 1e-30) if x.ndim >= 3 else x, pyr
            )
            a, j, h = far_field_grid(pyr2, ws, 1.0, 0.1, levels)
            return c * 0 + jnp.sum(a) + jnp.sum(j) + jnp.sum(h), None
        return body, jnp.zeros(())

    def mk_near(levels, ws, k):
        d = 1 << levels
        pyr = build_pyramid(pos0, mass, levels)
        lo, cell = pyr.lo, pyr.cell

        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, d - 1)
            a, _ = tile_near_field(
                p, mass, coords, lo, cell, d=d, ws=ws, k=k, G=1.0, eps=0.1
            )
            return a, None
        return body, jnp.zeros((N, 3))

    def mk_full(levels, k):
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            a = barnes_hut_forces(
                p, mass, 1.0, 0.1, 0.5, levels=levels,
                near_engine="tiles", near_k=k, multipole_order=2,
            )
            return a, None
        return body, jnp.zeros((N, 3))

    # overflow counts at the candidate (levels, k) points
    for levels, k in ((6, 16), (7, 4), (7, 6), (7, 8)):
        d = 1 << levels
        pyr = build_pyramid(pos0, mass, levels)
        coords = jnp.clip(
            ((pos0 - pyr.lo) / pyr.cell).astype(jnp.int32), 0, d - 1
        )
        _, over = jax.jit(
            lambda p, m, co, lo, ce: tile_near_field(
                p, m, co, lo, ce, d=d, ws=1, k=k, G=1.0, eps=0.1
            )
        )(pos0, mass, coords, pyr.lo, pyr.cell)
        print(f"overflow levels={levels} k={k}: {int(over)}", flush=True)

    bench("pyramid order=2 L6 (linear scatter)", lambda: mk_pyr2(6))
    bench("pyramid order=2 L7", lambda: mk_pyr2(7))
    bench("far conv ws=1 L6", lambda: mk_far_conv(6, 1))
    bench("far conv ws=1 L7", lambda: mk_far_conv(7, 1))
    bench("near tiles L6 ws=1 k=16 (linearized)", lambda: mk_near(6, 1, 16))
    bench("near tiles L7 ws=1 k=6", lambda: mk_near(7, 1, 6))
    bench("near tiles L7 ws=1 k=8", lambda: mk_near(7, 1, 8))
    bench("FULL BH th=0.5 o2 L6 k=16", lambda: mk_full(6, 16))
    bench("FULL BH th=0.5 o2 L7 k=8", lambda: mk_full(7, 8))


if __name__ == "__main__":
    main()
