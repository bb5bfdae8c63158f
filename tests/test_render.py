"""Render math tests — no display needed
(reference: tests/test_camera.cpp, tests/test_color_mapping.cpp,
tests/test_ui_panel.cpp, cuda_gl_interop verifyDataIntegrity).
"""

import numpy as np
import pytest

from nbody_tpu.render.camera import Camera
from nbody_tpu.render.color import ColorMapper
from nbody_tpu.render.renderer import PointRenderer
from nbody_tpu.render.ui import UIPanel
from nbody_tpu.types import ColorMode, ForceMethod, RenderConfig


class TestCamera:
    def test_orbit_preserves_distance(self):
        cam = Camera(distance=50.0)
        d0 = np.linalg.norm(cam.position - cam.target)
        cam.rotate(0.5, 0.2)
        d1 = np.linalg.norm(cam.position - cam.target)
        assert abs(d0 - d1) < 1e-9

    def test_gimbal_clamp(self):
        cam = Camera()
        cam.rotate(0.0, 100.0)
        assert cam.elevation < np.pi / 2
        cam.rotate(0.0, -200.0)
        assert cam.elevation > -np.pi / 2

    def test_zoom_clamped(self):
        cam = Camera(distance=50.0)
        for _ in range(200):
            cam.zoom(1.0)
        assert cam.distance >= 1.0
        for _ in range(400):
            cam.zoom(-1.0)
        assert cam.distance <= 1000.0

    def test_reset(self):
        cam = Camera(distance=50.0, azimuth=0.1, elevation=0.2)
        cam.rotate(1.0, 0.3)
        cam.zoom(2.0)
        cam.pan(10, 20)
        cam.reset()
        assert cam.distance == 50.0
        assert cam.azimuth == 0.1
        np.testing.assert_allclose(cam.target, [0, 0, 0])

    def test_view_matrix_maps_target_to_axis(self):
        """Target lands on the -z axis in view space."""
        cam = Camera(distance=10.0, azimuth=0.7, elevation=0.4,
                     target=(1.0, 2.0, 3.0))
        hom = np.array([1.0, 2.0, 3.0, 1.0])
        v = cam.view_matrix @ hom
        assert abs(v[0]) < 1e-9 and abs(v[1]) < 1e-9
        assert abs(v[2] + 10.0) < 1e-9

    def test_project_center(self):
        cam = Camera(distance=10.0, azimuth=0.0, elevation=0.0)
        ndc, view_z, in_front = cam.project(np.array([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(ndc[0], [0.0, 0.0], atol=1e-9)
        assert in_front[0]
        assert abs(view_z[0] - 10.0) < 1e-9

    def test_behind_camera_masked(self):
        cam = Camera(distance=5.0, azimuth=0.0, elevation=0.0)
        behind = cam.position + (cam.position - cam.target)
        _, _, in_front = cam.project(behind[None, :])
        assert not in_front[0]


class TestColorMapper:
    def test_depth_endpoints(self):
        """Gradient endpoints (reference: test_color_mapping.cpp)."""
        cm = ColorMapper(ColorMode.DEPTH)
        c = cm.map_depth(np.array([0.0, 100.0]))
        assert c[0, 0] > c[0, 2]  # close = warm (red>blue)
        assert c[1, 2] > c[1, 0]  # far = cool

    def test_velocity_endpoints(self):
        cm = ColorMapper(ColorMode.VELOCITY)
        v = np.array([[0.0, 0, 0], [100.0, 0, 0]])
        c = cm.map_velocity(v)
        assert c[0, 2] > c[0, 0]  # slow = blue
        assert c[1, 0] > c[1, 2]  # fast = red

    def test_colors_in_range(self):
        cm = ColorMapper()
        c = cm(np.linspace(0, 10, 50), np.zeros((50, 3)))
        assert (c >= 0).all() and (c <= 1).all()

    def test_constant_input_no_nan(self):
        cm = ColorMapper()
        c = cm.map_depth(np.full(10, 3.0))
        assert np.isfinite(c).all()


class TestRenderer:
    def test_renders_visible_points(self):
        r = PointRenderer(RenderConfig(window_width=160, window_height=90))
        pts = np.zeros((100, 3))
        img = r.render(pts)
        assert img.shape == (90, 160, 3)
        assert img.max() > 0  # something was drawn
        assert img.min() >= 0 and img.max() <= 1

    def test_empty_scene(self):
        r = PointRenderer(RenderConfig(window_width=64, window_height=64))
        img = r.render(np.zeros((0, 3)))
        assert img.max() == 0

    def test_offscreen_points_not_drawn(self):
        r = PointRenderer(RenderConfig(window_width=64, window_height=64))
        img = r.render(np.full((10, 3), 1e6))
        assert img.max() == 0

    def test_native_matches_numpy(self):
        from nbody_tpu.native import rasterizer

        if not rasterizer.available():
            pytest.skip("native rasterizer not built")
        cfg = RenderConfig(window_width=120, window_height=80)
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((500, 3)) * 5
        r_native = PointRenderer(cfg)
        assert r_native._native is not None
        img_native = r_native.render(pts)
        r_numpy = PointRenderer(cfg)
        r_numpy._native = None
        img_numpy = r_numpy.render(pts)
        np.testing.assert_allclose(img_native, img_numpy, atol=1e-5)


class TestUIPanel:
    def test_flag_handshake(self):
        """reference: tests/test_ui_panel.cpp flag logic."""
        p = UIPanel()
        assert not p.consume_pause_clicked()
        p.click_pause()
        assert p.consume_pause_clicked()
        assert not p.consume_pause_clicked()  # consumed

    def test_method_change_handshake(self):
        p = UIPanel()
        assert p.consume_method_change() is None
        p.select_method(ForceMethod.BARNES_HUT)
        assert p.consume_method_change() == ForceMethod.BARNES_HUT
        assert p.consume_method_change() is None

    def test_visibility_toggle(self):
        p = UIPanel()
        assert p.visible
        p.toggle_visibility()
        assert not p.visible
        assert p.render_text() == ""
        p.toggle_visibility()
        p.set_stats(fps=60.0, particle_count=1000, method="direct-n2")
        text = p.render_text()
        assert "60.0" in text and "1000" in text and "direct-n2" in text

    def test_frame_time_derived(self):
        p = UIPanel()
        p.set_stats(fps=50.0)
        assert abs(p.stats.frame_time_ms - 20.0) < 1e-9


class TestTerminalView:
    """Live terminal raster (render/terminal.py — the headless-host
    analogue of the reference's GLFW window, src/main.cpp:307-331)."""

    def _view(self, w=40, h=12):
        import io

        from nbody_tpu.render.terminal import TerminalView

        return TerminalView(width=w, height=h, out=io.StringIO())

    def test_raster_bins_points(self):
        import numpy as np

        tv = self._view()
        # a point straight down the view axis projects to ndc (0, 0)
        center = np.zeros((1, 3), np.float32)
        grid = tv.raster(np.repeat(center, 7, axis=0))
        assert grid.shape == (24, 40)
        assert grid.sum() == 7
        ys, xs = np.nonzero(grid)
        assert len(ys) == 1  # all seven land in one cell

    def test_raster_culls_behind_camera(self):
        import numpy as np

        tv = self._view()
        behind = np.asarray(tv.camera.position) * 2.0  # behind the eye
        assert tv.raster(behind[None, :].astype(np.float32)).sum() == 0

    def test_compose_contract(self):
        import re

        import numpy as np

        tv = self._view()
        pts = np.random.RandomState(0).normal(0, 5, (2000, 3)).astype(
            np.float32
        )
        s = tv.compose(pts, "stats here")
        lines = s.split("\n")
        assert len(lines) == tv.height + 1  # raster rows + stats line
        plain = re.sub(r"\x1b\[[0-9;]*[A-Za-z]", "", lines[0])
        assert len(plain) == tv.width
        assert "stats here" in lines[-1]

    def test_draw_redraws_in_place(self):
        import numpy as np

        tv = self._view()
        pts = np.zeros((3, 3), np.float32)
        tv.draw(pts, "f1")
        first = tv.out.getvalue()
        assert "\x1b[2J" in first  # initial clear
        tv.draw(pts, "f2")
        assert tv.out.getvalue().count("\x1b[2J") == 1  # home-only after
        tv.close()
        assert "\x1b[?25h" in tv.out.getvalue()  # cursor restored
