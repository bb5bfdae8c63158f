"""Phase-scoped profiling and JSON benchmark records.

TPU-native counterpart of the reference's performance observability layer
(reference: include/nbody/performance_observability.hpp:16-74,
src/utils/performance_observability.cpp:54-163). Same surface:

  * a mutex-guarded global ``PhaseProfiler`` accumulating (total_ms, samples)
    per named phase;
  * a ``profile_phase(name)`` context manager (RAII ScopedPhaseProfile
    analogue) — on JAX the closing edge calls ``jax.block_until_ready`` on
    registered values so async dispatch doesn't hide device time;
  * ``BenchmarkRunRecord`` serialized to the same JSON schema
    (performance_observability.hpp:47-55) so downstream tooling reads both;
  * ``consume_global_phase_snapshot()`` draining the profiler between runs.

Profiling is enabled by default (the reference compiles it out unless
NBODY_ENABLE_PROFILING; here the cost is nanoseconds per phase and can be
disabled via ``set_profiling_enabled(False)`` or NBODY_TPU_PROFILING=0).
Deep traces: ``jax.profiler.trace`` integrates separately (see docs).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import threading
import time
from typing import Any, Dict, List, Optional

_ENABLED = os.environ.get("NBODY_TPU_PROFILING", "1") != "0"


def set_profiling_enabled(enabled: bool) -> None:
    global _ENABLED
    _ENABLED = enabled


def profiling_enabled() -> bool:
    return _ENABLED


@dataclasses.dataclass
class PhaseStats:
    total_ms: float = 0.0
    samples: int = 0


class PhaseProfiler:
    """Accumulates named phase durations under a lock
    (reference: performance_observability.cpp:54-69)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._phases: Dict[str, PhaseStats] = {}

    def record(self, name: str, ms: float) -> None:
        with self._lock:
            st = self._phases.setdefault(name, PhaseStats())
            st.total_ms += ms
            st.samples += 1

    def snapshot(self) -> Dict[str, PhaseStats]:
        with self._lock:
            return {
                k: PhaseStats(v.total_ms, v.samples)
                for k, v in self._phases.items()
            }

    def consume(self) -> Dict[str, PhaseStats]:
        """Drain and return (reference: consumeGlobalPhaseSnapshot,
        performance_observability.cpp:159-163)."""
        with self._lock:
            snap = self._phases
            self._phases = {}
            return snap

    def reset(self) -> None:
        with self._lock:
            self._phases = {}


_GLOBAL = PhaseProfiler()


def get_global_profiler() -> PhaseProfiler:
    return _GLOBAL


def consume_global_phase_snapshot() -> Dict[str, PhaseStats]:
    return _GLOBAL.consume()


@contextlib.contextmanager
def profile_phase(name: str, *sync_values, profiler: Optional[PhaseProfiler] = None):
    """Context manager timing a named phase.

    Any ``sync_values`` (arrays/pytrees) are blocked on before the clock
    stops, so asynchronous XLA dispatch is charged to the right phase.
    """
    if not _ENABLED:
        yield
        return
    prof = profiler or _GLOBAL
    t0 = time.perf_counter()
    try:
        # Deep-trace integration: when a jax.profiler.trace is active
        # (app --trace DIR), the same phase names annotate the host
        # timeline so the JSON records and the Perfetto view line up.
        # TraceAnnotation is ~free when no trace is running.
        import jax.profiler

        with jax.profiler.TraceAnnotation(name):
            yield
    except ImportError:  # pragma: no cover — jax always present in prod
        yield
    finally:
        if sync_values:
            import jax

            jax.block_until_ready(sync_values)
        prof.record(name, (time.perf_counter() - t0) * 1e3)


@dataclasses.dataclass
class BenchmarkRunRecord:
    """One benchmark run, JSON-schema-compatible with the reference
    (reference: performance_observability.hpp:47-55, writer cpp:102-153)."""

    name: str
    method: str
    particle_count: int
    iterations: int
    metrics: Dict[str, float] = dataclasses.field(default_factory=dict)
    params: Dict[str, str] = dataclasses.field(default_factory=dict)
    phase_timings: Dict[str, Dict[str, float]] = dataclasses.field(
        default_factory=dict
    )

    def attach_phase_snapshot(self, snapshot: Dict[str, PhaseStats]) -> None:
        for name, st in sorted(snapshot.items()):
            self.phase_timings[name] = {
                "total_ms": st.total_ms,
                "samples": st.samples,
                "mean_ms": st.total_ms / max(st.samples, 1),
            }

    def to_dict(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "method": self.method,
            "particle_count": self.particle_count,
            "iterations": self.iterations,
            "metrics": self.metrics,
            "params": self.params,
            "phase_timings": self.phase_timings,
        }


def serialize_benchmark_run_records(records: List[BenchmarkRunRecord]) -> str:
    """reference: serializeBenchmarkRunRecords
    (performance_observability.cpp:102-153) — hand-built JSON there, json
    module here; same shape: {"benchmark_runs": [...]}"""
    return json.dumps(
        {"benchmark_runs": [r.to_dict() for r in records]}, indent=2
    )
