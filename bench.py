"""Headline benchmark: 1M-particle Barnes-Hut steps/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference (LessUp/n-body) runs 1M-particle Barnes-Hut at
25 FPS (= 25 Verlet steps/s) on an RTX 3080 (BASELINE.md). The timed loop
is a lax.scan of full Verlet steps inside ONE device program, matching the
reference's one-update-per-frame semantics (src/main.cpp:184-192).

Env knobs: NBODY_BENCH_SMALL=1 → 100K-particle quick smoke;
NBODY_BENCH_METHOD ∈ {barnes-hut, spatial-hash, direct-n2};
NBODY_BENCH_N overrides the particle count.
"""

import json
import os
import time

import jax


def main():
    import jax.numpy as jnp

    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.forces import make_force_fn, make_sorted_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_multi_step,
        make_sorted_multi_step,
    )
    from nbody_tpu.types import ForceMethod, SimulationConfig, SphericalDistParams

    # Headline: the NORTH-STAR config — 1M-particle Barnes-Hut (the
    # reference's flagship benchmark, BASELINE.md: 25 FPS on RTX 3080).
    # Honest regression tracking: this is the hardest cell, not the most
    # flattering one. The full measured matrix for every method/N lives
    # in BENCHMARKS.md; override via env to reproduce any cell.
    small = os.environ.get("NBODY_BENCH_SMALL") == "1"
    method = ForceMethod.parse(
        os.environ.get("NBODY_BENCH_METHOD", "barnes-hut")
    )
    default_n = 100_000 if small else 1_000_000
    n = int(os.environ.get("NBODY_BENCH_N", default_n))
    # Reference steps/s on RTX 3080 (BASELINE.md). N outside the published
    # table has no baseline → vs_baseline is emitted as null, not a crash.
    baseline = {
        (ForceMethod.BARNES_HUT, 1_000_000): 25.0,
        (ForceMethod.BARNES_HUT, 100_000): 60.0,
        (ForceMethod.BARNES_HUT, 10_000): 120.0,
        (ForceMethod.SPATIAL_HASH, 1_000_000): 60.0,
        (ForceMethod.SPATIAL_HASH, 100_000): 90.0,
        (ForceMethod.SPATIAL_HASH, 10_000): 120.0,
        (ForceMethod.DIRECT_N2, 1_000_000): 1.0,
        (ForceMethod.DIRECT_N2, 100_000): 10.0,
        (ForceMethod.DIRECT_N2, 10_000): 60.0,
    }.get((method, n))

    config = SimulationConfig(
        particle_count=n,
        force_method=method,
        bh_max_level=6 if n > 300_000 else 5,
        dt=1e-3,
    )

    # NBODY_BENCH_SCENE=sparse → uniform cube at ~1 particle/unit³ (the
    # density regime where the reference's published 1M-hash 60 FPS is
    # physically reachable on its own hardware — BENCHMARKS.md "density
    # note"); default = the reference app's dense spherical scene.
    scene = os.environ.get("NBODY_BENCH_SCENE", "dense")
    if scene == "sparse":
        from nbody_tpu.models.distributions import init_uniform
        from nbody_tpu.types import UniformDistParams

        if method == ForceMethod.SPATIAL_HASH:
            # Exactness regime (cell_size = cutoff): every pair within
            # the cutoff is found — the honest configuration for a
            # published number (with cell < cutoff BOTH the reference
            # and this engine silently skip pairs beyond one cell).
            # Density ~1/unit³ ⇒ ~8 particles per 2-unit cell: the
            # regime the tiles engine auto-selects on.
            config = config.replace(spatial_hash_cell_size=2.0)
        half = max(10.0, float(n) ** (1.0 / 3.0)) / 2.0
        state = init_uniform(
            jax.random.PRNGKey(42),
            n,
            UniformDistParams(
                min_bounds=(-half, -half, -half),
                max_bounds=(half, half, half),
            ),
        )
    else:
        state = init_spherical(
            jax.random.PRNGKey(42), n, SphericalDistParams(radius=10.0)
        )
    # pos_hint: lets hash_engine=auto resolve window-vs-tiles from the
    # actual scene density (ops/spatial_hash.hash_engine_params).
    force_fn = make_force_fn(config, pos_hint=state.pos)
    state = jax.jit(lambda s: initialize_forces(s, force_fn))(state)
    state.block_until_ready()

    # enough steps that the ~250ms tunnel dispatch latency amortizes away
    # (at 1M, 5 steps measured 4.0 steps/s for a true 8.5 — the fixed
    # dispatch+readback overhead needs ≥3 s of device work to vanish)
    steps = 200 if n <= 10_000 else (50 if n <= 100_000 else 30)
    # Sorted-state stepping (NBODY_BENCH_SORTED=0 opts out): the BH tiles
    # engine steps in its internal cell-sorted order across the scan,
    # deleting the per-step unsort gather (ops/integrator.py).
    sorted_force = (
        make_sorted_force_fn(config, pos_hint=state.pos)
        if os.environ.get("NBODY_BENCH_SORTED") != "0"
        else None
    )
    # Amortized re-sort cadence (NBODY_BENCH_RESORT, default 1 = re-sort
    # every step, the reference's semantics): cadence > 1 takes
    # frozen-grid steps between re-sorts (make_resort_multi_step) and is
    # OPT-IN because its accuracy is scene-dependent — on this violent
    # cold-collapse headline scene ~1.8% of rows change cells after ONE
    # dt=1e-3 step (99.7% after 16; scripts/profile_r4d.py s0), so
    # cadence-8 measurably diverges. The headline number stays honest at
    # cadence 1; use the staleness audit before publishing cadence runs.
    resort = int(os.environ.get("NBODY_BENCH_RESORT", "1"))
    # Audit-driven table-resident stepping (NBODY_BENCH_STALE_FRAC > 0):
    # integration state lives in the sweep kernel's slot layout between
    # re-sorts (ops/table_step.py) and the staleness audit runs BEFORE
    # each step's force, so no above-threshold frozen step is ever taken
    # — the safe-by-construction form of the cadence machinery.
    stale_frac = float(os.environ.get("NBODY_BENCH_STALE_FRAC", "0"))
    # Exact incremental re-sort (NBODY_BENCH_REPAIR=1): re-home only the
    # rows whose cell changed each step (ops/table_step.
    # make_table_repair_multi_step) — no staleness approximation; full
    # rebuild on audit/cadence triggers. The honest way to amortize the
    # sort on gentle scenes.
    repair = os.environ.get("NBODY_BENCH_REPAIR") == "1"
    table_p = None
    if stale_frac > 0.0 or repair:
        from nbody_tpu.ops.forces import make_table_step_params

        table_p = make_table_step_params(config, pos_hint=state.pos)
    if table_p is not None and repair:
        from nbody_tpu.ops.table_step import make_table_repair_multi_step

        multi = jax.jit(
            make_table_repair_multi_step(
                table_p, config.dt, steps,
                max_cadence=resort if resort > 1 else 64,
            )
        )
    elif table_p is not None:
        from nbody_tpu.ops.table_step import make_table_adaptive_multi_step

        multi = jax.jit(
            make_table_adaptive_multi_step(
                table_p, config.dt, steps,
                max_stale_frac=stale_frac,
                max_cadence=resort if resort > 1 else 16,
            )
        )
    elif sorted_force is None:
        multi = jax.jit(make_multi_step(force_fn, config.dt, steps))
    elif (
        resort > 1
        and hasattr(sorted_force, "frozen")
        and n < (1 << 24)
    ):
        from nbody_tpu.ops.integrator import make_resort_multi_step

        multi = jax.jit(
            make_resort_multi_step(sorted_force, config.dt, steps, resort)
        )
    else:
        multi = jax.jit(make_sorted_multi_step(sorted_force, config.dt, steps))
    # warm-up compile; the scalar readback defeats async dispatch layers
    # that under-report on block_until_ready (observed through the axon
    # relay), so timings below include a real device round-trip.
    out = multi(state)
    float(out.time)
    # timed: best of 3, each rep FROM THE INITIAL STATE — the
    # reference's benchmark flow times steps 0..N from init
    # (src/main.cpp:335-416), and on the violent cold-collapse scene
    # that window is also where the physics stays in-contract
    # (k-slot overflow 316 rows at step 1 → 2.6K at step 16, vs 257K
    # by step 32 once the core has collapsed — profile_r5h.py ovf).
    # Chaining reps past collapse, as the r2-r4 harness did, times an
    # out-of-contract regime and also inflates per-chunk window loops.
    wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = multi(state)
        checksum = float(jnp.sum(out.pos[0]))
        wall = min(wall, time.perf_counter() - t0)
    assert checksum == checksum  # not NaN
    assert bool(jnp.isfinite(out.pos).all())

    steps_per_sec = steps / wall
    print(
        json.dumps(
            {
                "metric": f"steps_per_sec_{n // 1000}k_{method.cli_name}",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": (
                    round(steps_per_sec / baseline, 4)
                    if baseline is not None
                    else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
