"""TPU profile r3u — separate-payload sorted step + dynamic window sweep.

Measures (1M dense sphere unless noted; min-of-3 timed 10-step scans,
warm scalar-readback warmup per CLAUDE.md):

  u0  sorted BH force, extra=None              (r3t baseline: 31.5 ms)
  u1  full sorted_verlet_step, NEW separate (N,4) payload gather
      (the old extra-through-engine form measured 47.0 ms — r3t t2)
  u2  1M dense hash force, window engine, DYNAMIC spans
      (static form measured 207 ms in r2)
  u3  100K dense hash force, window engine, DYNAMIC spans
      (static r2: ~14 ms → 70.3 steps/s full step)
  u4  1M SPARSE hash (cube ~1/unit³, cell=2.0) sorted tiles Verlet step

Usage: python scripts/profile_r3u.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 1_000_000
REPS = 10
LEVELS = 6
G = 1.0
EPS = 0.1
THETA = 0.5
K = 16
DT = 1e-3


def bench(name, make_body, reps=REPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    def sync(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return float(jnp.sum(leaf))

    chk = sync(run(init))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(init))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:58s} {best / reps * 1000:8.2f} ms/iter "
          f"(chk {chk:.4e})", flush=True)
    return best / reps


def main():
    from nbody_tpu.models.distributions import init_spherical, init_uniform
    from nbody_tpu.ops.barnes_hut import barnes_hut_forces_sorted
    from nbody_tpu.ops.integrator import SortedState, sorted_verlet_step
    from nbody_tpu.ops.spatial_hash import (
        make_spatial_hash_forces_sorted,
        spatial_hash_forces,
    )
    from nbody_tpu.types import (
        SimulationConfig,
        ForceMethod,
        SphericalDistParams,
        UniformDistParams,
    )

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    kw = dict(levels=LEVELS, near_k=K, multipole_order=2,
              near_impl="pallas")

    def mk_force():
        def body(c, _):
            p = pos0 * (1 + c[0] * 1e-30)
            out = barnes_hut_forces_sorted(p, mass, G, EPS, THETA, **kw)
            s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
            return jnp.full((8,), s * 1e-30), None
        return body, jnp.zeros((8,))

    bench("u0 sorted force, extra=None", mk_force)

    def sorted_force_fn(p, m, extra=None):
        return barnes_hut_forces_sorted(p, m, G, EPS, THETA, **kw)

    def mk_step():
        def body(s, _):
            return sorted_verlet_step(s, sorted_force_fn, DT), None
        init = SortedState(
            pos=pos0, vel=jnp.zeros_like(pos0),
            acc=jnp.zeros_like(pos0), mass=mass,
            to_orig=jnp.arange(N, dtype=jnp.int32),
            time=jnp.asarray(0.0, pos0.dtype),
        )
        return body, init

    bench("u1 full sorted step, separate payload gather", mk_step)

    # --- u2: 1M dense hash window engine (dynamic spans) -----------------
    def mk_hash(p_arr, m_arr, window, block):
        def make():
            def body(c, _):
                p = p_arr * (1 + c[0] * 1e-30)
                a = spatial_hash_forces(
                    p, m_arr, G, EPS, cutoff=2.0, cell_size=1.0,
                    cap=64, window=window, block_size=block,
                    impl="pallas",
                )
                return jnp.full((8,), jnp.sum(a) * 1e-30), None
            return body, jnp.zeros((8,))
        return make

    bench("u2 1M dense hash force, window eng dynamic",
          mk_hash(pos0, mass, 2048, 256))

    s100 = init_spherical(
        jax.random.PRNGKey(42), 100_000, SphericalDistParams(radius=10.0))
    p100 = jax.device_put(s100.pos)
    m100 = jax.device_put(s100.mass)
    jax.block_until_ready((p100, m100))
    bench("u3 100K dense hash force, window eng dynamic",
          mk_hash(p100, m100, 1024, 128))

    # --- u4: 1M sparse hash, sorted tiles Verlet step ---------------------
    half = float(N) ** (1.0 / 3.0) / 2.0
    ssp = init_uniform(
        jax.random.PRNGKey(42), N,
        UniformDistParams(min_bounds=(-half,) * 3, max_bounds=(half,) * 3),
    )
    psp = jax.device_put(ssp.pos)
    msp = jax.device_put(ssp.mass)
    jax.block_until_ready((psp, msp))
    cfg = SimulationConfig(
        particle_count=N, force_method=ForceMethod.SPATIAL_HASH,
        spatial_hash_cell_size=2.0, dt=DT,
    )
    sf = make_spatial_hash_forces_sorted(cfg, pos_hint=psp)
    print(f"sparse engine params: {sf.engine_params}", flush=True)

    def mk_sparse_step():
        def body(s, _):
            return sorted_verlet_step(s, sf, DT), None
        init = SortedState(
            pos=psp, vel=jnp.zeros_like(psp),
            acc=jnp.zeros_like(psp), mass=msp,
            to_orig=jnp.arange(N, dtype=jnp.int32),
            time=jnp.asarray(0.0, psp.dtype),
        )
        return body, init

    bench("u4 1M sparse hash sorted tiles Verlet step", mk_sparse_step)


if __name__ == "__main__":
    main()
