"""TPU profile r3l — bisect the composed sorted BH step (post window-loop).

r3k: full sorted library step 77.7 ms but the two chains sum to ~47
(near 36.9 r3j-D, far 27.4 r3k-F', shared grid ~17). Where do the other
~30 ms live? Cumulative rungs of the EXACT library composition:

  1 grid      geometry + coords + build_sorted_grid + ids
  2 +near     rung1 + tile_near_field(sorted_output=True)
  3 +far      rung1 + moments + pyramid + far_field_grid (no pickup)
  4 force     barnes_hut_forces_sorted (near + far + far pickup)
  5 step      sorted_verlet_step on the real sorted force fn

Deltas: (4)-(2)-(3)+(1) = far pickup + add; (5)-(4) = verlet glue.

Usage: python scripts/profile_r3l.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 1_000_000
REPS = 10
LEVELS = 6
D = 1 << LEVELS
G = 1.0
EPS = 0.1
THETA = 0.5


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
        barnes_hut_forces_sorted,
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
        theta_to_ws,
    )
    from nbody_tpu.ops.sorted_window import (
        build_sorted_grid,
        use_full_cell_start,
    )
    from nbody_tpu.ops.tile_sweep import tile_near_field
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    vel0 = jax.device_put(state.vel)
    jax.block_until_ready((pos0, mass, vel0))

    ws = theta_to_ws(THETA, order=2)

    def rung_grid(p):
        lo, cell = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(
            p, mass, coords, D,
            with_cell_start=use_full_cell_start(D * D * D),
        )
        ids_sorted = (
            grid.csort[:, 0] * D + grid.csort[:, 1]
        ) * D + grid.csort[:, 2]
        return grid, ids_sorted, lo, cell, coords

    bench("1 grid (geom+coords+sort+cell_start)",
          mk(lambda p: rung_grid(p)[0].psort, pos0))

    def rung_near(p):
        grid, ids_sorted, lo, cell, coords = rung_grid(p)
        acc, over = tile_near_field(
            p, mass, coords, lo, cell, d=D, ws=ws, k=16, G=G, eps=EPS,
            grid=grid, impl="pallas", sorted_output=True,
        )
        return acc

    bench("2 grid+near (tile_near_field sorted)", mk(rung_near, pos0))

    def rung_far(p):
        grid, ids_sorted, lo, cell, coords = rung_grid(p)
        packed = _sorted_finest_moments(grid, ids_sorted, lo, cell, D, 2)
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        return far_field_grid(pyr, ws, G, EPS, LEVELS)

    bench("3 grid+far (moments+pyramid+taps)", mk(rung_far, pos0))

    def rung_force(p):
        return barnes_hut_forces_sorted(
            p, mass, G, EPS, THETA,
            levels=LEVELS, near_k=16, multipole_order=2,
        )

    bench("4 force sorted (near+far+pickup)", mk(rung_force, pos0))

    # 5: one sorted verlet step (the scan body of the bench loop)
    from nbody_tpu.ops.integrator import (
        SortedState,
        sorted_verlet_step,
    )

    def rung_step(p):
        s = SortedState(
            pos=p, vel=vel0, acc=jnp.zeros_like(p), mass=mass,
            to_orig=jnp.arange(N, dtype=jnp.int32),
            time=jnp.zeros((), p.dtype),
        )
        out = sorted_verlet_step(s, rung_force, 1e-3)
        return out.pos, out.vel

    bench("5 sorted verlet step (force+glue)", mk(rung_step, pos0))


if __name__ == "__main__":
    main()
