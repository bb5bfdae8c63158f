"""TPU profile r3k — far-chain cond cost + composed v5 step.

r3j closed the near-chain question: the lax.cond wrapper around the tile
build cost ~55 ms/iter at 1M (XLA speculates/selects both branches), and
direct + legacy pickup runs the near chain at 36.9 ms. The library now
takes that path. The far chain still conds between the MXU segment-sum
moments and the exact XLA scatter (barnes_hut.py:972) — same suspect
pattern, measured here.

Rows (all honest sum-readbacks, min of 3 timed scans of 10):
  F   far chain: cond moments (current library path, control)
  F'  far chain: DIRECT segment-sum moments (no cond)
  G   full sorted BH Verlet step via the library bench path
  G'  same with NBODY (env) — n/a, kept single config

Usage: python scripts/profile_r3k.py
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
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    def far_chain(p, *, use_cond):
        lo2, cell2 = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        crd = jnp.clip(((p - lo2) / cell2).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(p, mass, crd, D)
        ids_sorted = (
            grid.csort[:, 0] * D + grid.csort[:, 1]
        ) * D + grid.csort[:, 2]
        packed_fast = _sorted_finest_moments(
            grid, ids_sorted, lo2, cell2, D, 2)
        if use_cond:
            # r3k A/B relic: the cond measured +16.5 ms/iter; the library
            # now always takes the direct (window-looped, exact) path.
            packed = jax.lax.cond(
                jnp.sum(packed_fast[..., 0]) >= 0,
                lambda: packed_fast,
                lambda: scatter_finest_moments(
                    p, mass, crd, lo2, cell2, D, 2),
            )
        else:
            packed = packed_fast
        pyr = pyramid_from_packed(packed, lo2, cell2, LEVELS, 2)
        return far_field_grid(pyr, 1, G, EPS, LEVELS)

    bench("F  far chain: cond moments (library control)",
          mk(lambda p: far_chain(p, use_cond=True), pos0))
    bench("F' far chain: direct moments (no cond)",
          mk(lambda p: far_chain(p, use_cond=False), pos0))

    # G: full sorted Verlet step through the library path (bench.py's)
    from nbody_tpu.ops.forces import make_sorted_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_sorted_multi_step,
    )
    from nbody_tpu.types import ForceMethod, SimulationConfig

    config = SimulationConfig(
        particle_count=N,
        force_method=ForceMethod.BARNES_HUT,
        bh_max_level=LEVELS,
        dt=1e-3,
    )
    st = state
    force_fn_sorted = make_sorted_force_fn(config, pos_hint=st.pos)
    from nbody_tpu.ops.forces import make_force_fn
    st = jax.jit(
        lambda s: initialize_forces(s, make_force_fn(config, pos_hint=s.pos))
    )(st)
    st.block_until_ready()
    multi = jax.jit(make_sorted_multi_step(force_fn_sorted, config.dt, REPS))

    out = multi(st)
    chk = float(jnp.sum(out.pos[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = multi(out)
        chk = float(jnp.sum(out.pos[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{'G  full sorted BH Verlet step (library)':52s} "
          f"{best / REPS * 1000:8.2f} ms/iter (chk {chk:.4e}) "
          f"= {REPS / best:.2f} steps/s", flush=True)


if __name__ == "__main__":
    main()
