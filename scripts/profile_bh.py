"""Phase-level TPU profiling of the Barnes-Hut pipeline at 1M particles.

Times each phase as a lax.scan inside ONE jit with a scalar readback
closing the bracket (the axon tunnel's async dispatch under-reports
otherwise — see CLAUDE.md). Each scan iteration perturbs the input by a
carry-dependent epsilon so XLA cannot hoist the phase out of the loop.

Usage:  python scripts/profile_bh.py [N] [levels]
"""

import sys
import time

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
LEVELS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
REPS = 5


def bench(name, make_body, reps=REPS):
    """make_body() -> (body, init_carry); body(c, _) -> (c, None)."""
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
    print(f"{name:34s} {dt / reps * 1000:8.1f} ms/iter   (chk {chk:.4e})",
          flush=True)
    return dt / reps


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        build_pyramid,
        far_field_grid,
        sym_matvec,
        theta_to_ws,
    )
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import tile_near_field
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()} N={N} levels={LEVELS}", flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0)
    )
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready(pos0)
    d = 1 << LEVELS

    def perturb(pos, c):
        return pos * (1.0 + c * 1e-30)

    def mk_sort():
        def body(c, _):
            p = perturb(pos0, jnp.sum(c) * 0 + c[0, 0])
            lo = jnp.min(p, axis=0)
            cell = (jnp.max(jnp.max(p, 0) - lo) * (1 + 1e-5)) / d
            coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, d - 1)
            g = build_sorted_grid(p, mass, coords, d)
            return g.psort[:, :3], None
        return body, pos0

    def mk_pyramid():
        def body(c, _):
            p = perturb(pos0, c[0, 0])
            pyr = build_pyramid(p, mass, LEVELS)
            return p + pyr.masses[0][0, 0, 0] * 0, None
        return body, pos0

    def mk_far(ws):
        pyr = build_pyramid(pos0, mass, LEVELS)

        def body(c, _):
            pyr2 = jax.tree.map(
                lambda x: x * (1 + c * 1e-30) if x.ndim >= 3 else x, pyr
            )
            a, j = far_field_grid(pyr2, ws, 1.0, 0.1, LEVELS)[:2]
            return c * 0 + jnp.sum(a) + jnp.sum(j), None
        return body, jnp.zeros(())

    def mk_near(ws, k):
        pyr = build_pyramid(pos0, mass, LEVELS)
        lo, cell = pyr.lo, pyr.cell

        def body(c, _):
            p = perturb(pos0, c[0, 0])
            coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, d - 1)
            a, _ = tile_near_field(
                p, mass, coords, lo, cell, d=d, ws=ws, k=k, G=1.0, eps=0.1
            )
            return a, None
        return body, jnp.zeros((N, 3))

    def mk_pickup():
        pyr = build_pyramid(pos0, mass, LEVELS)
        a_far, j_far, _ = far_field_grid(pyr, 2, 1.0, 0.1, LEVELS)
        packed0 = jnp.concatenate([a_far, j_far], axis=-1)
        lo, cell = pyr.lo, pyr.cell

        def body(c, _):
            p = perturb(pos0, c[0, 0])
            coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, d - 1)
            packed = packed0 * (1 + c[0, 0] * 1e-30)
            centers = lo + (coords.astype(p.dtype) + 0.5) * cell
            vals = packed[coords[:, 0], coords[:, 1], coords[:, 2]]
            pick = vals[:, :3] + sym_matvec(vals[:, 3:9], p - centers)
            return pick, None
        return body, jnp.zeros((N, 3))

    def mk_full(theta):
        from nbody_tpu.ops.barnes_hut import barnes_hut_forces

        def body(c, _):
            p = perturb(pos0, c[0, 0])
            a = barnes_hut_forces(
                p, mass, 1.0, 0.1, theta, levels=LEVELS,
                near_engine="tiles", near_k=16,
            )
            return a, None
        return body, jnp.zeros((N, 3))

    bench("sort (build_sorted_grid)", mk_sort)
    bench("pyramid build", mk_pyramid)
    bench("far field ws=2", lambda: mk_far(2))
    bench("far field ws=1", lambda: mk_far(1))
    bench("near tiles ws=2 k=16", lambda: mk_near(2, 16))
    bench("near tiles ws=1 k=16", lambda: mk_near(1, 16))
    bench("near tiles ws=1 k=8", lambda: mk_near(1, 8))
    bench("pickup (packed gather + expand)", mk_pickup)
    bench("FULL BH theta=0.5 (ws=2)", lambda: mk_full(0.5))


if __name__ == "__main__":
    main()
