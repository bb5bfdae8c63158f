"""Observability tests (reference: tests/test_performance_observability.cpp).

PhaseProfiler accumulation, scoped phases, snapshot drain semantics,
BenchmarkRunRecord JSON schema.
"""

import json
import time

from nbody_tpu.utils.profiling import (
    BenchmarkRunRecord,
    PhaseProfiler,
    consume_global_phase_snapshot,
    get_global_profiler,
    profile_phase,
    serialize_benchmark_run_records,
    set_profiling_enabled,
)


class TestPhaseProfiler:
    def test_accumulates(self):
        p = PhaseProfiler()
        p.record("force.direct_n2", 2.0)
        p.record("force.direct_n2", 3.0)
        p.record("integrator.velocity_verlet", 1.0)
        snap = p.snapshot()
        assert snap["force.direct_n2"].total_ms == 5.0
        assert snap["force.direct_n2"].samples == 2
        assert snap["integrator.velocity_verlet"].samples == 1

    def test_consume_drains(self):
        p = PhaseProfiler()
        p.record("x", 1.0)
        snap = p.consume()
        assert snap["x"].samples == 1
        assert p.snapshot() == {}

    def test_scoped_phase_times(self):
        p = PhaseProfiler()
        with profile_phase("sleepy", profiler=p):
            time.sleep(0.01)
        snap = p.snapshot()
        assert snap["sleepy"].total_ms >= 9.0
        assert snap["sleepy"].samples == 1

    def test_global_profiler_and_drain(self):
        consume_global_phase_snapshot()
        with profile_phase("g.phase"):
            pass
        snap = consume_global_phase_snapshot()
        assert "g.phase" in snap
        assert consume_global_phase_snapshot() == {}

    def test_disabled_profiling_is_noop(self):
        consume_global_phase_snapshot()
        set_profiling_enabled(False)
        try:
            with profile_phase("hidden"):
                pass
        finally:
            set_profiling_enabled(True)
        assert "hidden" not in get_global_profiler().snapshot()

    def test_sync_values_blocked(self):
        import jax.numpy as jnp

        p = PhaseProfiler()
        x = jnp.arange(1000.0)
        with profile_phase("with_sync", x * 2, profiler=p):
            pass
        assert p.snapshot()["with_sync"].samples == 1


class TestBenchmarkRunRecord:
    def test_json_schema(self):
        rec = BenchmarkRunRecord(
            name="force.direct_n2",
            method="direct-n2",
            particle_count=4096,
            iterations=5,
            metrics={"wall_time_ms_per_step": 1.5},
            params={"dt": "0.001"},
        )
        p = PhaseProfiler()
        p.record("force.direct_n2", 7.5)
        rec.attach_phase_snapshot(p.snapshot())
        doc = json.loads(serialize_benchmark_run_records([rec]))
        runs = doc["benchmark_runs"]
        assert len(runs) == 1
        r = runs[0]
        assert r["name"] == "force.direct_n2"
        assert r["method"] == "direct-n2"
        assert r["particle_count"] == 4096
        assert r["iterations"] == 5
        assert r["metrics"]["wall_time_ms_per_step"] == 1.5
        assert r["params"]["dt"] == "0.001"
        assert r["phase_timings"]["force.direct_n2"]["total_ms"] == 7.5
        assert r["phase_timings"]["force.direct_n2"]["samples"] == 1

    def test_multiple_records(self):
        recs = [
            BenchmarkRunRecord("a", "direct-n2", 10, 1),
            BenchmarkRunRecord("b", "barnes-hut", 20, 2),
        ]
        doc = json.loads(serialize_benchmark_run_records(recs))
        assert [r["name"] for r in doc["benchmark_runs"]] == ["a", "b"]


class TestStreamIntegrity:
    def test_point_stream_verify(self):
        """reference: verifyDataIntegrity (cuda_gl_interop.cpp:188-211)."""
        from nbody_tpu import ParticleSystem, SimulationConfig
        from nbody_tpu.render.stream import PointStream

        sys_ = ParticleSystem()
        sys_.initialize(SimulationConfig(particle_count=100))
        stream = PointStream(sys_)
        assert stream.verify_data_integrity()
        sys_.update()
        assert stream.verify_data_integrity()

    def test_decimation(self):
        from nbody_tpu import ParticleSystem, SimulationConfig
        from nbody_tpu.render.stream import PointStream

        sys_ = ParticleSystem()
        sys_.initialize(SimulationConfig(particle_count=1000))
        stream = PointStream(sys_, max_points=100)
        snap = stream.latest()
        assert snap.positions.shape[0] <= 100
