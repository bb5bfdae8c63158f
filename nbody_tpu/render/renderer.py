"""Software point-sprite renderer.

TPU-native counterpart of the reference's GL point-sprite pipeline
(reference: src/render/renderer.cpp:16-232). The GLSL vertex/fragment pair
becomes a vectorized NumPy rasterizer with the same visual semantics:
perspective point size ``point_size / max(view_z, 0.1)``
(renderer.cpp:16-35), circular sprites with soft edges, additive alpha
blending, and the three ColorMapper modes. Output is an (H, W, 3) float
image; ``save_png`` writes frames (the window/swapchain role).

A C++ rasterizer (native/rasterizer.cpp) accelerates the splat loop when
built; this module transparently falls back to pure NumPy.
"""

from __future__ import annotations

import numpy as np

from nbody_tpu.render.camera import Camera
from nbody_tpu.render.color import ColorMapper
from nbody_tpu.types import ColorMode, RenderConfig


class PointRenderer:
    """reference: Renderer (renderer.hpp:27, renderer.cpp:94-232)."""

    def __init__(
        self,
        config: RenderConfig = RenderConfig(),
        camera: Camera | None = None,
    ):
        self.config = config
        self.camera = camera or Camera()
        self.camera.aspect = config.window_width / config.window_height
        self.color_mapper = ColorMapper(config.color_mode)
        self._native = None
        try:
            from nbody_tpu.native import rasterizer as _native_raster

            self._native = _native_raster if _native_raster.available() else None
        except Exception:
            self._native = None

    def set_color_mode(self, mode: ColorMode) -> None:
        """reference: Renderer::setColorMode."""
        self.config = RenderConfig(
            window_width=self.config.window_width,
            window_height=self.config.window_height,
            point_size=self.config.point_size,
            color_mode=mode,
            show_stats=self.config.show_stats,
        )
        self.color_mapper.mode = mode

    def on_resize(self, width: int, height: int) -> None:
        """reference: Renderer::onResize."""
        self.config = RenderConfig(
            window_width=width,
            window_height=height,
            point_size=self.config.point_size,
            color_mode=self.config.color_mode,
            show_stats=self.config.show_stats,
        )
        self.camera.aspect = width / height
        self.camera._dirty()

    def render(
        self, positions: np.ndarray, velocities: np.ndarray | None = None
    ) -> np.ndarray:
        """Rasterize points → (H, W, 3) float32 image in [0, 1]."""
        w, h = self.config.window_width, self.config.window_height
        img = np.zeros((h, w, 3), np.float32)
        n = positions.shape[0]
        if n == 0:
            return img
        positions = np.asarray(positions, np.float64)
        if velocities is None:
            velocities = np.zeros_like(positions)

        ndc, view_z, in_front = self.camera.project(positions)
        vis = (
            in_front
            & (np.abs(ndc[:, 0]) < 1.2)
            & (np.abs(ndc[:, 1]) < 1.2)
        )
        if not vis.any():
            return img
        ndc, view_z = ndc[vis], view_z[vis]
        colors = self.color_mapper(view_z, np.asarray(velocities)[vis])

        # pixel coords; GL-style y-up → image y-down
        px = (ndc[:, 0] * 0.5 + 0.5) * (w - 1)
        py = (1.0 - (ndc[:, 1] * 0.5 + 0.5)) * (h - 1)
        # perspective point size (reference: renderer.cpp:16-35)
        size = self.config.point_size * 30.0 / np.maximum(view_z, 0.1)
        size = np.clip(size, 0.5, 16.0)

        if self._native is not None:
            self._native.splat(img, px, py, size, colors)
            return np.clip(img, 0.0, 1.0)

        # NumPy fallback: splat points binned by integer radius. Semantics
        # match the native path exactly (rounded centers, out-of-bounds
        # pixels skipped, quadratic falloff).
        ix = np.round(px).astype(np.int64)
        iy = np.round(py).astype(np.int64)
        r_int = np.maximum(1, np.round(size * 0.5).astype(np.int64))
        for r in np.unique(r_int):
            sel = r_int == r
            sx, sy, sc = ix[sel], iy[sel], colors[sel]
            alpha = min(1.0, 1.5 / (r * r))
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    d2 = dx * dx + dy * dy
                    if d2 > r * r:
                        continue
                    fall = alpha * (1.0 - 0.6 * d2 / max(r * r, 1))
                    ux = sx + dx
                    uy = sy + dy
                    ok = (ux >= 0) & (ux < w) & (uy >= 0) & (uy < h)
                    np.add.at(img, (uy[ok], ux[ok]), sc[ok] * fall)
        return np.clip(img, 0.0, 1.0)

    @staticmethod
    def save_png(img: np.ndarray, path: str) -> None:
        from PIL import Image

        Image.fromarray((img * 255).astype(np.uint8)).save(path)
