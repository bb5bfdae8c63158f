"""Color mapping for particle rendering.

TPU-native counterpart of the reference ColorMapper + fragment-shader
gradients (reference: include/nbody/camera.hpp ColorMapper:110-128,
src/render/renderer.cpp:39-77): three modes —
DEPTH (warm → cool with camera distance), VELOCITY (blue → red with speed),
DENSITY (proxy gradient). Vectorized NumPy; used by both the host renderer
and tests (no GL context needed, mirroring test_color_mapping.cpp).
"""

from __future__ import annotations

import numpy as np

from nbody_tpu.types import ColorMode

# Gradient endpoints (match the reference shader's palette intent:
# renderer.cpp:52-72).
_WARM = np.array([1.0, 0.65, 0.3])
_COOL = np.array([0.3, 0.45, 1.0])
_SLOW = np.array([0.2, 0.35, 1.0])
_FAST = np.array([1.0, 0.25, 0.15])
_SPARSE = np.array([0.25, 0.65, 0.35])
_DENSE = np.array([1.0, 0.95, 0.4])


def _lerp(a: np.ndarray, b: np.ndarray, t: np.ndarray) -> np.ndarray:
    t = np.clip(t, 0.0, 1.0)[:, None]
    return a[None, :] * (1.0 - t) + b[None, :] * t


def _normalize(v: np.ndarray) -> np.ndarray:
    lo, hi = float(np.min(v)), float(np.max(v))
    if hi - lo < 1e-12:
        return np.zeros_like(v)
    return (v - lo) / (hi - lo)


class ColorMapper:
    """Host-side gradient mapping (reference: camera.hpp:110-128)."""

    def __init__(self, mode: ColorMode = ColorMode.DEPTH):
        self.mode = mode

    def map_depth(self, view_z: np.ndarray) -> np.ndarray:
        """Close = warm, far = cool (reference shader depth branch)."""
        return _lerp(_WARM, _COOL, _normalize(view_z))

    def map_velocity(self, velocities: np.ndarray) -> np.ndarray:
        """Slow = blue, fast = red (reference shader velocity branch)."""
        speed = np.linalg.norm(velocities, axis=-1)
        return _lerp(_SLOW, _FAST, _normalize(speed))

    def map_density(self, density_proxy: np.ndarray) -> np.ndarray:
        return _lerp(_SPARSE, _DENSE, _normalize(density_proxy))

    def __call__(
        self,
        view_z: np.ndarray,
        velocities: np.ndarray,
        density: np.ndarray | None = None,
    ) -> np.ndarray:
        if self.mode == ColorMode.VELOCITY:
            return self.map_velocity(velocities)
        if self.mode == ColorMode.DENSITY:
            d = density if density is not None else np.zeros_like(view_z)
            return self.map_density(d)
        return self.map_depth(view_z)
