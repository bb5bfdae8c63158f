"""Utilities: serialization, HDF5 interchange, profiling, benchmark records."""

from nbody_tpu.utils.serialization import Serializer
from nbody_tpu.utils.profiling import (
    BenchmarkRunRecord,
    PhaseProfiler,
    consume_global_phase_snapshot,
    get_global_profiler,
    profile_phase,
)

__all__ = [
    "Serializer",
    "BenchmarkRunRecord",
    "PhaseProfiler",
    "consume_global_phase_snapshot",
    "get_global_profiler",
    "profile_phase",
]
