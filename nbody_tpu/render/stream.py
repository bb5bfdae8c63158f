"""Async device→host point stream.

TPU-native replacement for the reference's CUDA↔GL zero-copy interop
(reference: src/render/cuda_gl_interop.cpp:63-211,
include/nbody/cuda_gl_interop.hpp:14-118). A TPU cannot share buffers with
a display API, so the equivalent seam is a double-buffered asynchronous
device→host copy: each ``request()`` kicks off a non-blocking
``jax.device_get``-style fetch (via ``jax.Array.copy_to_host_async``) of an
optionally decimated snapshot; ``latest()`` returns the most recent
completed one. The simulation never blocks on the renderer.

``verify_data_integrity`` mirrors the reference's readback check
(cuda_gl_interop.cpp:188-211).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from nbody_tpu.system import ParticleSystem
from nbody_tpu.utils.profiling import profile_phase


@dataclasses.dataclass
class PointSnapshot:
    positions: np.ndarray  # (M, 3) float32
    velocities: np.ndarray  # (M, 3) float32
    sim_time: float
    frame_id: int


class PointStream:
    """Double-buffered device→host particle stream."""

    def __init__(self, system: ParticleSystem, max_points: int = 2_000_000):
        self._system = system
        self._max_points = max_points
        self._pending = None  # (pos_dev, vel_dev, time, frame)
        self._latest: PointSnapshot | None = None
        self._frame = 0

    def _decimate(self, arr):
        n = arr.shape[0]
        if n <= self._max_points:
            return arr
        stride = -(-n // self._max_points)
        return arr[::stride]

    def request(self) -> None:
        """Start an async fetch of the current state (non-blocking)."""
        with profile_phase("interop.update"):
            state = self._system.state
            pos = self._decimate(state.pos)
            vel = self._decimate(state.vel)
            try:
                pos.copy_to_host_async()
                vel.copy_to_host_async()
            except Exception:
                pass  # backends without async copy fall back to sync get
            self._pending = (pos, vel, self._system.simulation_time, self._frame)
            self._frame += 1

    def latest(self) -> PointSnapshot:
        """Resolve the most recent requested snapshot (blocks only on the
        already-in-flight copy, not on the simulation)."""
        if self._pending is None:
            self.request()
        pos, vel, t, frame = self._pending
        snap = PointSnapshot(
            positions=np.asarray(pos),
            velocities=np.asarray(vel),
            sim_time=t,
            frame_id=frame,
        )
        self._latest = snap
        self._pending = None
        return snap

    def verify_data_integrity(self) -> bool:
        """Readback equals device state (reference:
        cuda_gl_interop.cpp:188-211)."""
        snap = self.latest()
        state = self._system.state
        pos = self._decimate(state.pos)
        return bool(
            np.allclose(snap.positions, np.asarray(pos), atol=1e-6)
        )
