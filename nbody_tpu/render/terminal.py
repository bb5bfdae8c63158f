"""Live terminal view — the TPU-host analogue of the reference's GLFW
window (reference: src/main.cpp:307-331 runs an on-screen GL window with
an ImGui stats panel; a TPU host is headless, so the live surface here is
the terminal itself).

Renders the point cloud through the SAME Camera projection the PNG
renderer uses (render/camera.py — glm-convention matrices), bins it to a
character raster, and redraws IN PLACE with ANSI cursor control: a
256-color density heat map (half-block glyphs give 2 vertical pixels per
character row) plus the UIPanel's stats line. No curses dependency — one
escape-coded string per frame, written atomically.
"""

from __future__ import annotations

import sys

import numpy as np

from nbody_tpu.render.camera import Camera

# 256-color "inferno-like" ramp for density (dark → bright).
_RAMP = (16, 53, 90, 126, 162, 198, 204, 210, 216, 222, 228, 231)
_HOME = "\x1b[H"
_CLEAR = "\x1b[2J"
_HIDE = "\x1b[?25l"
_SHOW = "\x1b[?25h"
_RESET = "\x1b[0m"


class TerminalView:
    """ANSI live view: density raster + stats, redrawn in place."""

    def __init__(
        self,
        camera: Camera | None = None,
        width: int = 100,
        height: int = 36,
        out=None,
    ):
        self.camera = camera or Camera(distance=45.0, azimuth=0.7,
                                       elevation=0.75)
        self.width = int(width)
        self.height = int(height)  # character rows (2 cells each)
        self.out = out if out is not None else sys.stdout
        self._first = True

    # -- rasterization ----------------------------------------------------

    def raster(self, positions: np.ndarray) -> np.ndarray:
        """(N, 3) world points → (2·height, width) density counts."""
        pts = np.asarray(positions, np.float32)
        h2 = 2 * self.height
        grid = np.zeros((h2, self.width), np.int32)
        if pts.size == 0:
            return grid
        ndc, _z, in_front = self.camera.project(pts)
        ndc = ndc[in_front]
        on = (np.abs(ndc[:, 0]) <= 1.0) & (np.abs(ndc[:, 1]) <= 1.0)
        ndc = ndc[on]
        if ndc.shape[0] == 0:
            return grid
        xs = np.clip(
            ((ndc[:, 0] + 1.0) * 0.5 * (self.width - 1)).astype(np.int32),
            0, self.width - 1,
        )
        ys = np.clip(
            ((1.0 - ndc[:, 1]) * 0.5 * (h2 - 1)).astype(np.int32),
            0, h2 - 1,
        )
        np.add.at(grid, (ys, xs), 1)
        return grid

    def compose(self, positions: np.ndarray, stats: str = "") -> str:
        """One frame as a string (ANSI colors + trailing stats line)."""
        grid = self.raster(positions)
        peak = max(int(grid.max()), 1)
        # log scale: terminal dynamic range is tiny vs a 1M-point core
        lv = (np.log1p(grid) / np.log1p(peak) * (len(_RAMP) - 1)).astype(
            np.int32
        )
        top, bot = lv[0::2], lv[1::2]
        occ_t, occ_b = grid[0::2] > 0, grid[1::2] > 0
        lines = []
        for r in range(self.height):
            row = []
            prev = None
            for c in range(self.width):
                t_on, b_on = bool(occ_t[r, c]), bool(occ_b[r, c])
                if not (t_on or b_on):
                    code = ("bg",)
                    ch = " "
                elif t_on and b_on:
                    code = (_RAMP[top[r, c]], _RAMP[bot[r, c]])
                    ch = "▀"  # upper half block: fg=top, bg=bottom
                elif t_on:
                    code = (_RAMP[top[r, c]], None)
                    ch = "▀"
                else:
                    code = (_RAMP[bot[r, c]], None)
                    ch = "▄"  # lower half block
                if code != prev:
                    if code == ("bg",):
                        row.append(_RESET)
                    elif code[1] is None:
                        row.append(f"\x1b[0m\x1b[38;5;{code[0]}m")
                    else:
                        row.append(
                            f"\x1b[38;5;{code[0]}m\x1b[48;5;{code[1]}m"
                        )
                    prev = code
                row.append(ch)
            row.append(_RESET)
            lines.append("".join(row))
        lines.append(stats[: self.width].ljust(self.width))
        return "\n".join(lines)

    # -- live redraw -------------------------------------------------------

    def draw(self, positions: np.ndarray, stats: str = "") -> None:
        frame = self.compose(positions, stats)
        prefix = (_CLEAR + _HIDE) if self._first else ""
        self._first = False
        self.out.write(prefix + _HOME + frame + "\n")
        self.out.flush()

    def close(self) -> None:
        if not self._first:
            self.out.write(_SHOW + _RESET + "\n")
            self.out.flush()
