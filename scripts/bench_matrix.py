"""One-grant bench matrix — reproduces bench.py's measurement flow for
every published cell in a SINGLE process (each separate python run costs
a full TPU-grant handshake; CLAUDE.md).

Per cell: bench.py-identical config/scene/stepping (sorted stepping when
the engine has the contract), warm scalar readback, min-of-3 timed
lax.scan of full Verlet steps. Prints one line per cell plus a JSON
summary at the end.

Usage: python scripts/bench_matrix.py [cell ...]
  cell ∈ {bh-1m, hash-1m, hash-1m-sparse, bh-100k, hash-100k,
          bh-10k, hash-10k, direct-10k, direct-100k}
  (default: all, in that order)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

BASE = {
    ("barnes-hut", 1_000_000): 25.0,
    ("barnes-hut", 100_000): 60.0,
    ("barnes-hut", 10_000): 120.0,
    ("spatial-hash", 1_000_000): 60.0,
    ("spatial-hash", 100_000): 90.0,
    ("spatial-hash", 10_000): 120.0,
    ("direct-n2", 1_000_000): 1.0,
    ("direct-n2", 100_000): 10.0,
    ("direct-n2", 10_000): 60.0,
}

CELLS = {
    "bh-1m": ("barnes-hut", 1_000_000, "dense"),
    "hash-1m": ("spatial-hash", 1_000_000, "dense"),
    "hash-1m-sparse": ("spatial-hash", 1_000_000, "sparse"),
    "bh-100k": ("barnes-hut", 100_000, "dense"),
    "hash-100k": ("spatial-hash", 100_000, "dense"),
    "bh-10k": ("barnes-hut", 10_000, "dense"),
    "hash-10k": ("spatial-hash", 10_000, "dense"),
    "direct-10k": ("direct-n2", 10_000, "dense"),
    "direct-100k": ("direct-n2", 100_000, "dense"),
}


def run_cell(method_name, n, scene):
    from nbody_tpu.models.distributions import init_spherical, init_uniform
    from nbody_tpu.ops.forces import make_force_fn, make_sorted_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_multi_step,
        make_sorted_multi_step,
    )
    from nbody_tpu.types import (
        ForceMethod,
        SimulationConfig,
        SphericalDistParams,
        UniformDistParams,
    )

    method = ForceMethod.parse(method_name)
    config = SimulationConfig(
        particle_count=n,
        force_method=method,
        bh_max_level=6 if n > 300_000 else 5,
        dt=1e-3,
    )
    if scene == "sparse":
        if method == ForceMethod.SPATIAL_HASH:
            config = config.replace(spatial_hash_cell_size=2.0)
        half = max(10.0, float(n) ** (1.0 / 3.0)) / 2.0
        state = init_uniform(
            jax.random.PRNGKey(42), n,
            UniformDistParams(min_bounds=(-half,) * 3,
                              max_bounds=(half,) * 3),
        )
    else:
        state = init_spherical(
            jax.random.PRNGKey(42), n, SphericalDistParams(radius=10.0)
        )
    force_fn = make_force_fn(config, pos_hint=state.pos)
    state = jax.jit(lambda s: initialize_forces(s, force_fn))(state)
    state.block_until_ready()

    steps = 200 if n <= 10_000 else (50 if n <= 100_000 else 30)
    sorted_force = make_sorted_force_fn(config, pos_hint=state.pos)
    # bench.py-identical cadence knob (NBODY_BENCH_RESORT, default 1 =
    # re-sort every step). Cadence > 1 is opt-in: accuracy is
    # scene-dependent (see bench.py's note / scripts/profile_r4d.py s0).
    import os

    resort = int(os.environ.get("NBODY_BENCH_RESORT", "1"))
    stale_frac = float(os.environ.get("NBODY_BENCH_STALE_FRAC", "0"))
    repair = os.environ.get("NBODY_BENCH_REPAIR") == "1"
    table_p = None
    if stale_frac > 0.0 or repair:
        from nbody_tpu.ops.forces import make_table_step_params

        table_p = make_table_step_params(config, pos_hint=state.pos)
    if table_p is not None and repair:
        from nbody_tpu.ops.table_step import make_table_repair_multi_step

        multi = jax.jit(make_table_repair_multi_step(
            table_p, config.dt, steps,
            max_cadence=resort if resort > 1 else 64,
        ))
    elif table_p is not None:
        from nbody_tpu.ops.table_step import (
            make_table_adaptive_multi_step,
        )

        multi = jax.jit(make_table_adaptive_multi_step(
            table_p, config.dt, steps, max_stale_frac=stale_frac,
            max_cadence=resort if resort > 1 else 16,
        ))
    elif sorted_force is None:
        multi = jax.jit(make_multi_step(force_fn, config.dt, steps))
    elif resort > 1 and hasattr(sorted_force, "frozen") and n < (1 << 24):
        from nbody_tpu.ops.integrator import make_resort_multi_step

        multi = jax.jit(
            make_resort_multi_step(sorted_force, config.dt, steps, resort)
        )
    else:
        multi = jax.jit(make_sorted_multi_step(sorted_force, config.dt, steps))
    out = multi(state)
    float(out.time)  # real readback warmup
    # each rep times steps 0..N from the INITIAL state (bench.py's
    # protocol: the reference benchmarks from init, and the early
    # window is where the k-cap contract holds on collapse scenes)
    wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = multi(state)
        checksum = float(jnp.sum(out.pos[0]))
        wall = min(wall, time.perf_counter() - t0)
    assert checksum == checksum
    sps = steps / wall
    base = BASE.get((method_name, n))
    tag = f"{method_name}@{n // 1000}k" + ("-sparse" if scene == "sparse" else "")
    print(
        f"{tag:28s} {sps:8.2f} steps/s"
        + (f"  ({sps / base:.2f}x baseline {base})" if base else ""),
        flush=True,
    )
    return tag, round(sps, 2), (round(sps / base, 3) if base else None)


def main():
    names = sys.argv[1:] or list(CELLS)
    print(f"backend={jax.default_backend()}", flush=True)
    results = {}
    for name in names:
        m, n, scene = CELLS[name]
        try:
            tag, sps, ratio = run_cell(m, n, scene)
            results[tag] = {"steps_per_sec": sps, "vs_baseline": ratio}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            results[name] = {"error": str(e)[:200]}
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
