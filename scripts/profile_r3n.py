"""TPU profile r3n — composed step after in-sweep far folding.

Rows:
  G   1M BH sorted Verlet step (library; far folded into the sweep)
  H   1M sparse-scene hash tiles sorted Verlet step (library)
  I   100K BH sorted Verlet step (L5)

Usage: python scripts/profile_r3n.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

REPS = 10


def run_config(name, config, state, reps=REPS):
    from nbody_tpu.ops.forces import make_force_fn, make_sorted_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_sorted_multi_step,
    )

    force_fn = make_force_fn(config, pos_hint=state.pos)
    st = jax.jit(lambda s: initialize_forces(s, force_fn))(state)
    st.block_until_ready()
    sf = make_sorted_force_fn(config, pos_hint=st.pos)
    if sf is None:
        print(f"{name:52s} SKIP (no sorted engine)", flush=True)
        return
    multi = jax.jit(make_sorted_multi_step(sf, config.dt, reps))
    out = multi(st)
    chk = float(jnp.sum(out.pos[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = multi(out)
        chk = float(jnp.sum(out.pos[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best / reps * 1000:8.2f} ms/iter "
          f"(chk {chk:.4e}) = {reps / best:.2f} steps/s", flush=True)


def main():
    from nbody_tpu.models.distributions import init_spherical, init_uniform
    from nbody_tpu.types import (
        ForceMethod,
        SimulationConfig,
        SphericalDistParams,
        UniformDistParams,
    )

    print(f"backend={jax.default_backend()}", flush=True)

    st_1m = init_spherical(
        jax.random.PRNGKey(42), 1_000_000, SphericalDistParams(radius=10.0))
    run_config(
        "G 1M BH sorted step (far folded)",
        SimulationConfig(
            particle_count=1_000_000,
            force_method=ForceMethod.BARNES_HUT,
            bh_max_level=6, dt=1e-3,
        ),
        st_1m,
    )

    half = 50.0
    st_sp = init_uniform(
        jax.random.PRNGKey(42), 1_000_000,
        UniformDistParams(min_bounds=(-half,) * 3, max_bounds=(half,) * 3),
    )
    run_config(
        "H 1M sparse hash tiles sorted step",
        SimulationConfig(
            particle_count=1_000_000,
            force_method=ForceMethod.SPATIAL_HASH,
            spatial_hash_cell_size=2.0, dt=1e-3,
        ),
        st_sp,
    )

    st_100k = init_spherical(
        jax.random.PRNGKey(42), 100_000, SphericalDistParams(radius=10.0))
    run_config(
        "I 100K BH sorted step (L5)",
        SimulationConfig(
            particle_count=100_000,
            force_method=ForceMethod.BARNES_HUT,
            bh_max_level=5, dt=1e-3,
        ),
        st_100k,
        reps=50,
    )


if __name__ == "__main__":
    main()
