"""Application shell: wiring CLI → simulation → benchmark/render loops.

TPU-native counterpart of the reference Application
(reference: src/main.cpp:30-435). The GLFW window/event loop becomes a
headless step loop with optional host-side frame rendering (there is no GL
on a TPU host; see nbody_tpu.render); benchmark mode reproduces the
reference's flow exactly: init → optional import → timed N-step loop →
optional export → BenchmarkRunRecord JSON to stdout/file with phase
timings (main.cpp:335-416).
"""

from __future__ import annotations

import json
import sys
import time

from nbody_tpu.cli import AppCliOptions
from nbody_tpu.system import ParticleSystem
from nbody_tpu.utils.profiling import (
    BenchmarkRunRecord,
    consume_global_phase_snapshot,
    serialize_benchmark_run_records,
)


# Key → action mapping (reference: src/main.cpp:265-305 key callbacks):
# Space pause/resume, r reset, 1/2/3 force method, c color mode cycle,
# p panel toggle (F1 in the reference), q/Esc quit. The reference's mouse
# orbit + scroll zoom (main.cpp:307-331) become keyboard camera controls
# on the headless host: h/l orbit azimuth, j/k orbit elevation, +/- zoom,
# 0 camera reset — same Camera.rotate/zoom math either way.
_CAM_STEP = 0.15  # radians per keypress (≈ a 40 px mouse drag)
KEY_ACTIONS = {
    " ": "toggle_pause",
    "r": "reset",
    "1": "method:direct-n2",
    "2": "method:barnes-hut",
    "3": "method:spatial-hash",
    "c": "cycle_color",
    "p": "toggle_panel",
    "h": "camera:orbit:-1:0",
    "l": "camera:orbit:1:0",
    "j": "camera:orbit:0:-1",
    "k": "camera:orbit:0:1",
    "+": "camera:zoom:1",
    "=": "camera:zoom:1",
    "-": "camera:zoom:-1",
    "0": "camera:reset",
    "q": "quit",
    "\x1b": "quit",
}


def apply_camera_action(camera, action: str) -> bool:
    """Apply a ``camera:...`` action string to a Camera; returns True if
    the action was a camera action (pure, testable without a TTY —
    reference analogue: the GLFW cursor/scroll callbacks, main.cpp:307-331).
    """
    if camera is None or not action or not action.startswith("camera:"):
        return False
    parts = action.split(":")
    if parts[1] == "orbit":
        camera.rotate(float(parts[2]) * _CAM_STEP, float(parts[3]) * _CAM_STEP)
    elif parts[1] == "zoom":
        camera.zoom(float(parts[2]))
    elif parts[1] == "reset":
        camera.reset()
    return True


def key_to_action(key: str):
    """Pure mapping so the control surface is testable without a TTY."""
    return KEY_ACTIONS.get(key.lower() if key != "\x1b" else key)


def _poll_keys():
    """Non-blocking read of pending single-key inputs from stdin (POSIX)."""
    import select

    keys = []
    try:
        while select.select([sys.stdin], [], [], 0)[0]:
            ch = sys.stdin.read(1)
            if not ch:
                break
            keys.append(ch)
    except (OSError, ValueError):
        pass
    return keys


class Application:
    """reference: src/main.cpp Application class."""

    def __init__(self, options: AppCliOptions):
        self.options = options
        self.system = ParticleSystem()

    # ---- top-level dispatch (reference: Application::run, main.cpp:47-81)

    def run(self) -> int:
        o = self.options
        if o.debug_nans:
            # closest analogue to the reference's debug-build device-sync
            # error checks (SURVEY.md §5.2): fail at the first NaN.
            import jax

            jax.config.update("jax_debug_nans", True)
        if o.list_algorithms:
            from nbody_tpu.ops.forces import list_algorithms

            print("Available force methods:")
            for name, desc in list_algorithms():
                print(f"  {name:14s} {desc}")
            return 0

        if o.show_diagnostics:
            self._print_diagnostics()
            return 0

        if o.benchmark_mode:
            return self.run_benchmark_mode()

        return self.run_interactive()

    def _print_diagnostics(self) -> None:
        import jax

        import nbody_tpu

        print(f"nbody-tpu {nbody_tpu.__version__}")
        print(f"jax {jax.__version__}, backend: {jax.default_backend()}")
        for d in jax.devices():
            print(f"  device: {d}")
        try:
            stats = jax.devices()[0].memory_stats() or {}
            if "bytes_limit" in stats:
                print(f"  memory limit: {stats['bytes_limit'] / 2**30:.1f} GiB")
        except Exception:
            pass
        from nbody_tpu.utils.hdf5_io import HAVE_HDF5

        print(f"hdf5 support: {HAVE_HDF5}")

    # ---- shared init (reference: main.cpp:344-359) ------------------------

    def _initialize_system(self) -> None:
        o = self.options
        self.system.initialize(o.to_config())
        if o.import_path:
            if o.import_path.endswith((".h5", ".hdf5")):
                from nbody_tpu.utils.hdf5_io import HDF5IO

                self.system.set_state(HDF5IO.import_from_file(o.import_path))
            else:
                self.system.load_state(o.import_path)

    def _export_if_requested(self) -> None:
        o = self.options
        if not o.export_path:
            return
        if o.export_format == "hdf5" or o.export_path.endswith((".h5", ".hdf5")):
            from nbody_tpu.utils.hdf5_io import HDF5IO

            HDF5IO.export_to_file(o.export_path, self.system.get_state())
        else:
            self.system.save_state(o.export_path)

    # ---- benchmark mode (reference: runBenchmarkMode, main.cpp:335-416) ---

    def run_benchmark_mode(self) -> int:
        o = self.options
        self._initialize_system()
        consume_global_phase_snapshot()  # drain profiler (main.cpp:361)

        # Fused chunks: one device program per chunk instead of one
        # dispatch per step (through the TPU tunnel a dispatch costs
        # ~250 ms — a per-step loop is dispatch-bound, not physics-bound;
        # same timing discipline as bench.py). Chunk bounded so any one
        # program stays well under the TPU worker's long-program limit.
        chunk = max(1, min(o.benchmark_steps, 50))
        # equal chunks only: a different tail size would recompile INSIDE
        # the timed loop; we round the step count up and report it
        n_chunks = -(-o.benchmark_steps // chunk)
        steps = n_chunks * chunk
        # warm-up: one chunk to pay XLA compilation outside the timed loop
        self.system.run_steps(chunk)
        self.system.block_until_ready()

        # Deep traces (--trace DIR): jax.profiler around the timed loop —
        # the TPU-native analogue of the reference's documented nsys/ncu
        # workflow (docs/architecture/performance.md:287-318). Phase names
        # from utils/profiling annotate the host timeline via
        # TraceAnnotation; open DIR in Perfetto / XProf.
        if o.trace_dir:
            import jax.profiler

            trace_ctx = jax.profiler.trace(o.trace_dir)
        else:
            import contextlib

            trace_ctx = contextlib.nullcontext()
        with trace_ctx:
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                self.system.run_steps(chunk)
            self.system.block_until_ready()
            wall = time.perf_counter() - t0

        self._export_if_requested()

        record = BenchmarkRunRecord(
            name="app.benchmark",
            method=o.force_method.cli_name,
            particle_count=o.particle_count,
            iterations=steps,
            metrics={
                "wall_time_ms": wall * 1e3,
                "wall_time_ms_per_step": wall * 1e3 / steps,
                "steps_per_sec": steps / wall,
            },
            params={
                "dt": str(o.dt),
                "G": str(o.G),
                "softening": str(o.softening),
                "theta": str(o.barnes_hut_theta),
                "cell_size": str(o.spatial_hash_cell_size),
                "cutoff": str(o.spatial_hash_cutoff),
                "init": o.init_distribution.name.lower(),
                "devices": str(o.devices),
                "resort_every": str(o.resort_every),
                "resort_stale_frac": str(o.resort_stale_frac),
            },
        )
        record.attach_phase_snapshot(consume_global_phase_snapshot())
        out = serialize_benchmark_run_records([record])
        print(out)
        if o.benchmark_output_path:
            with open(o.benchmark_output_path, "w") as f:
                f.write(out + "\n")
        return 0

    # ---- interactive/render loop (reference: mainLoop, main.cpp:156-221) --

    def run_interactive(self) -> int:
        o = self.options
        self._initialize_system()

        from nbody_tpu.render.ui import UIPanel

        # The panel state machine always runs (it is pure flag logic, no
        # GL): keyboard controls SET its flags, the frame loop CONSUMES
        # them — the same producer/consumer handshake the reference wires
        # between ImGui buttons and the main loop (main.cpp:195-216).
        panel = UIPanel()
        renderer = None
        live_view = None
        stream = None
        camera = None
        if o.render or o.live:
            from nbody_tpu.render import Camera
            from nbody_tpu.render.stream import PointStream

            # 3/4 view: disks and spheres both read well
            camera = Camera(distance=45.0, azimuth=0.7, elevation=0.75)
            stream = PointStream(self.system)
            if o.render:
                from nbody_tpu.render import PointRenderer

                renderer = PointRenderer(camera=camera)
            if o.live:
                # Live display on a headless TPU host: ANSI in-place
                # terminal raster (the reference's GLFW window analogue,
                # main.cpp:307-331).
                from nbody_tpu.render.terminal import TerminalView

                live_view = TerminalView(camera=camera)

        steps = o.steps if o.steps > 0 else 1000
        fps_t0 = time.perf_counter()
        fps_frames = 0
        self._stats_line = ""
        interactive_tty = sys.stdin.isatty()
        color_modes = list(__import__("nbody_tpu.types", fromlist=["ColorMode"]).ColorMode)
        color_idx = 0
        for frame in range(steps):
            # keyboard controls (reference: main.cpp:265-305) — routed
            # through the panel flags where the reference has buttons
            if interactive_tty:
                for key in _poll_keys():
                    action = key_to_action(key)
                    if action == "quit":
                        self.system.block_until_ready()
                        if live_view is not None:
                            live_view.close()
                        self._export_if_requested()
                        print(json.dumps({"steps": frame, "quit": True}))
                        return 0
                    if action == "toggle_pause":
                        panel.click_pause()
                    elif action == "reset":
                        panel.click_reset()
                    elif action and action.startswith("method:"):
                        from nbody_tpu.types import ForceMethod

                        panel.select_method(
                            ForceMethod.parse(action.split(":", 1)[1])
                        )
                    elif action == "cycle_color" and renderer is not None:
                        color_idx = (color_idx + 1) % len(color_modes)
                        renderer.set_color_mode(color_modes[color_idx])
                    elif action == "toggle_panel":
                        panel.toggle_visibility()
                    elif action and action.startswith("camera:"):
                        apply_camera_action(camera, action)
            # consume the panel's flag handshake (reference: main.cpp
            # polls uiPanel state before stepping, main.cpp:195-216)
            if panel.consume_pause_clicked():
                if self.system.is_paused:
                    self.system.resume()
                else:
                    self.system.pause()
            if panel.consume_reset_clicked():
                self.system.reset()
            new_method = panel.consume_method_change()
            if new_method is not None:
                self.system.set_force_method(new_method)
            self.system.update()
            fps_frames += 1
            if stream is not None:
                # Pipelined readback: resolve LAST frame's async copy
                # (it overlapped with this frame's update), then kick off
                # this frame's — the double buffer actually overlaps
                # device compute instead of syncing every frame.
                snap = stream.latest() if frame > 0 else None
                stream.request()
                if snap is not None:
                    if renderer is not None:
                        img = renderer.render(snap.positions, snap.velocities)
                        if o.render_output:
                            import os

                            os.makedirs(o.render_output, exist_ok=True)
                            renderer.save_png(
                                img,
                                f"{o.render_output}/frame_{snap.frame_id:05d}.png",
                            )
                    if live_view is not None:
                        live_view.draw(snap.positions, self._stats_line)
            now = time.perf_counter()
            if now - fps_t0 >= 1.0:  # per-second stats (main.cpp:161-178)
                self.system.block_until_ready()
                fps = fps_frames / (now - fps_t0)
                line = (
                    f"t={self.system.simulation_time:.3f} "
                    f"N={self.system.particle_count} "
                    f"{o.force_method.cli_name} {fps:.1f} steps/s"
                )
                if panel is not None:
                    panel.set_stats(
                        fps=fps,
                        particle_count=self.system.particle_count,
                        method=o.force_method.cli_name,
                        sim_time=self.system.simulation_time,
                    )
                self._stats_line = line
                if live_view is None:  # the live raster carries its own
                    print(line, file=sys.stderr)
                fps_t0, fps_frames = now, 0

        self.system.block_until_ready()
        if live_view is not None:
            live_view.close()
        self._export_if_requested()
        if self.system.particle_count <= 100_000:
            energy = self.system.compute_total_energy()
            energy_kind = "exact"
        else:
            # O(N²) exact PE is too slow at scale; report the unbiased
            # sampled estimate instead of nothing (ops/integrator.py).
            from nbody_tpu.ops.integrator import sampled_total_energy

            energy = float(
                sampled_total_energy(
                    self.system.state,
                    self.system.config.G,
                    self.system.config.softening,
                )
            )
            energy_kind = "sampled"
        summary = {
            "steps": steps,
            "final_time": self.system.simulation_time,
            "total_energy": energy,
            "energy_kind": energy_kind,
        }
        print(json.dumps(summary))
        return 0
