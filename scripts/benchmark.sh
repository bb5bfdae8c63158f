#!/usr/bin/env bash
# Run the benchmark harness. Knobs mirror the reference's
# scripts/benchmark.sh env vars (NBODY_BENCHMARK_PARTICLES / _ITERATIONS).
set -euo pipefail
cd "$(dirname "$0")/.."
PARTICLES="${NBODY_BENCHMARK_PARTICLES:-4096}"
ITERATIONS="${NBODY_BENCHMARK_ITERATIONS:-5}"
exec python benchmarks/benchmark_main.py \
  --particle-count "$PARTICLES" --iterations "$ITERATIONS" "$@"
