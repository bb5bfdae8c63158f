"""Standalone benchmark harness.

TPU-native counterpart of the reference's `nbody_benchmarks` binary
(reference: benchmarks/benchmark_main.cpp): a registry of named
benchmarks, CLI `--benchmark --particle-count --iterations --output
--list`, JSON `BenchmarkRunRecord` output with per-phase breakdowns.

Registered benchmarks (same five as the reference, benchmark_main.cpp:
203-239):
  serialization.round_trip   (host-only)
  force.direct_n2
  force.barnes_hut           (with build/far/near phase breakdown)
  force.spatial_hash
  integration.velocity_verlet

Timing discipline for TPU-over-tunnel: each measured region runs inside
one jitted program where possible, and a scalar device→host readback
closes every timing bracket (async dispatch otherwise under-reports).

Usage:
  python benchmarks/benchmark_main.py --list
  python benchmarks/benchmark_main.py --benchmark force.direct_n2 \
      --particle-count 4096 --iterations 5 --output out.json
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

# runnable as a script from anywhere: repo root on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

DEFAULT_N = 4096       # reference: benchmark_main.cpp:18-23
DEFAULT_ITERATIONS = 5


def _sync_scalar(x) -> float:
    """Force completion with a D2H readback."""
    return float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


def _setup(n):
    from nbody_tpu.models import init_spherical
    from nbody_tpu.types import SphericalDistParams

    return init_spherical(
        jax.random.PRNGKey(42), n, SphericalDistParams(radius=10.0)
    )


def bench_serialization(n, iters, record):
    import numpy as np

    from nbody_tpu.state import SimulationState
    from nbody_tpu.utils.serialization import Serializer

    rng = np.random.default_rng(0)
    state = SimulationState(
        pos=rng.standard_normal((n, 3)).astype(np.float32),
        vel=rng.standard_normal((n, 3)).astype(np.float32),
        mass=np.ones(n, np.float32),
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        buf = io.BytesIO()
        Serializer.save(buf, state)
        buf.seek(0)
        Serializer.load(buf)
    wall = time.perf_counter() - t0
    record.metrics["wall_time_ms_per_round_trip"] = wall * 1e3 / iters
    record.metrics["mb_per_sec"] = (
        2 * iters * (n * 28 + 56) / wall / 1e6
    )


def _bench_force(force_fn, n, iters, record):
    s = _setup(n)

    def chain(p):
        def body(c, _):
            a = force_fn(c, s.mass)
            return c + 0.0 * a, None
        out, _ = jax.lax.scan(body, p, None, length=iters)
        return out

    f = jax.jit(chain)
    _sync_scalar(f(s.pos))  # compile
    t0 = time.perf_counter()
    _sync_scalar(f(s.pos))
    wall = time.perf_counter() - t0
    record.metrics["wall_time_ms_per_step"] = wall * 1e3 / iters
    record.metrics["evals_per_sec"] = iters / wall


def bench_direct(n, iters, record):
    from nbody_tpu.ops.forces import make_force_fn
    from nbody_tpu.types import ForceMethod, SimulationConfig

    cfg = SimulationConfig(particle_count=n, force_method=ForceMethod.DIRECT_N2)
    _bench_force(make_force_fn(cfg), n, iters, record)


def bench_barnes_hut(n, iters, record):
    from nbody_tpu.ops.barnes_hut import (
        _near_field,
        barnes_hut_forces,
        build_pyramid,
        far_field_grid,
        theta_to_ws,
    )

    levels = 6 if n >= 200_000 else 5
    record.params["levels"] = str(levels)
    _bench_force(
        lambda p, m: barnes_hut_forces(p, m, 1.0, 0.1, 0.5, levels=levels),
        n,
        iters,
        record,
    )

    # per-phase breakdown (reference: benchmark_main.cpp:203-211)
    s = _setup(n)
    ws = theta_to_ws(0.5)

    def phase(name, fn):
        f = jax.jit(fn)
        _sync_scalar(f(s.pos))
        t0 = time.perf_counter()
        _sync_scalar(f(s.pos))
        record.metrics[f"phase.{name}_ms"] = (time.perf_counter() - t0) * 1e3

    phase("build", lambda p: build_pyramid(p, s.mass, levels).masses[levels])
    phase(
        "build_far",
        lambda p: far_field_grid(
            build_pyramid(p, s.mass, levels), ws, 1.0, 0.1, levels
        )[0],
    )


def bench_spatial_hash(n, iters, record):
    from nbody_tpu.ops.forces import make_force_fn
    from nbody_tpu.types import ForceMethod, SimulationConfig

    cfg = SimulationConfig(
        particle_count=n, force_method=ForceMethod.SPATIAL_HASH
    )
    _bench_force(make_force_fn(cfg), n, iters, record)


def bench_verlet(n, iters, record):
    from nbody_tpu.ops.forces import make_force_fn
    from nbody_tpu.ops.integrator import initialize_forces, make_multi_step
    from nbody_tpu.types import ForceMethod, SimulationConfig

    cfg = SimulationConfig(particle_count=n, force_method=ForceMethod.DIRECT_N2)
    force_fn = make_force_fn(cfg)
    state = jax.jit(lambda s: initialize_forces(s, force_fn))(_setup(n))
    multi = jax.jit(make_multi_step(force_fn, cfg.dt, iters))
    _sync_scalar(multi(state).pos)
    t0 = time.perf_counter()
    _sync_scalar(multi(state).pos)
    wall = time.perf_counter() - t0
    record.metrics["wall_time_ms_per_step"] = wall * 1e3 / iters
    record.metrics["steps_per_sec"] = iters / wall


REGISTRY = {
    "serialization.round_trip": (bench_serialization, "cpu"),
    "force.direct_n2": (bench_direct, "direct-n2"),
    "force.barnes_hut": (bench_barnes_hut, "barnes-hut"),
    "force.spatial_hash": (bench_spatial_hash, "spatial-hash"),
    "integration.velocity_verlet": (bench_verlet, "direct-n2"),
}


def main(argv=None):
    from nbody_tpu.utils.profiling import (
        BenchmarkRunRecord,
        consume_global_phase_snapshot,
        serialize_benchmark_run_records,
    )

    ap = argparse.ArgumentParser(description="nbody-tpu benchmark harness")
    ap.add_argument("--benchmark", action="append", default=None,
                    help="benchmark name (repeatable); default: all")
    ap.add_argument("--particle-count", type=int, default=DEFAULT_N)
    ap.add_argument("--iterations", type=int, default=DEFAULT_ITERATIONS)
    ap.add_argument("--output", default="")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args(argv)

    if args.list:
        for name in REGISTRY:
            print(name)
        return 0

    names = args.benchmark or list(REGISTRY)
    records = []
    for name in names:
        if name not in REGISTRY:
            print(f"unknown benchmark: {name}", file=sys.stderr)
            return 2
        fn, method = REGISTRY[name]
        rec = BenchmarkRunRecord(
            name=name,
            method=method,
            particle_count=args.particle_count,
            iterations=args.iterations,
        )
        consume_global_phase_snapshot()
        fn(args.particle_count, args.iterations, rec)
        rec.attach_phase_snapshot(consume_global_phase_snapshot())
        records.append(rec)

    out = serialize_benchmark_run_records(records)
    print(out)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
