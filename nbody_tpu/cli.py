"""CLI parsing and the application entry point.

TPU-native counterpart of the reference's flag system and application shell
(reference: include/nbody/app_cli.hpp:8-29, src/core/app_cli.cpp:49-177,
src/main.cpp:335-416 benchmark mode). Same flag surface:

  --particles N --method NAME --dt V --gravity V --softening V --theta V
  --cell-size V --cutoff V --benchmark --benchmark-steps N
  --benchmark-output P --export P --export-format FMT --import P
  --list-algorithms --diagnostics --help  + bare positional count

plus TPU-build extensions: --init DIST, --seed N, --render, --render-output,
--devices N (shard over a mesh), --steps (interactive step cap).
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import List, Optional

from nbody_tpu.errors import ValidationError
from nbody_tpu.types import ForceMethod, InitDistribution, SimulationConfig


@dataclasses.dataclass
class AppCliOptions:
    """reference: app_cli.hpp:8-26."""

    particle_count: int = 10_000
    force_method: ForceMethod = ForceMethod.DIRECT_N2
    init_distribution: InitDistribution = InitDistribution.SPHERICAL
    dt: float = 1e-3
    G: float = 1.0
    softening: float = 0.1
    barnes_hut_theta: float = 0.5
    spatial_hash_cell_size: float = 1.0
    spatial_hash_cutoff: float = 2.0
    seed: int = 42
    benchmark_mode: bool = False
    benchmark_steps: int = 100
    benchmark_output_path: str = ""
    export_path: str = ""
    export_format: str = "checkpoint"
    import_path: str = ""
    list_algorithms: bool = False
    show_diagnostics: bool = False
    show_help: bool = False
    render: bool = False
    render_output: str = ""
    devices: int = 1
    steps: int = 0  # 0 = run until interrupted (interactive)
    debug_nans: bool = False  # NaN tracing (SURVEY.md §5.2 analogue)

    def to_config(self) -> SimulationConfig:
        return SimulationConfig(
            particle_count=self.particle_count,
            init_distribution=self.init_distribution,
            force_method=self.force_method,
            dt=self.dt,
            G=self.G,
            softening=self.softening,
            barnes_hut_theta=self.barnes_hut_theta,
            spatial_hash_cell_size=self.spatial_hash_cell_size,
            spatial_hash_cutoff=self.spatial_hash_cutoff,
            seed=self.seed,
            shard_devices=self.devices,
        )


def _parse_int(value: str, flag: str) -> int:
    try:
        return int(value)
    except ValueError:
        raise ValidationError(f"Invalid numeric value for {flag}: {value}")


def _parse_float(value: str, flag: str) -> float:
    try:
        return float(value)
    except ValueError:
        raise ValidationError(f"Invalid numeric value for {flag}: {value}")


def parse_app_cli_options(argv: List[str]) -> AppCliOptions:
    """Parse argv (no program name) — reference: app_cli.cpp:49-151."""
    o = AppCliOptions()
    i = 0

    def need_value(flag: str) -> str:
        nonlocal i
        i += 1
        if i >= len(argv):
            raise ValidationError(f"Missing value for {flag}")
        return argv[i]

    while i < len(argv):
        a = argv[i]
        if a in ("--help", "-h"):
            o.show_help = True
        elif a == "--particles":
            o.particle_count = _parse_int(need_value(a), a)
        elif a == "--method":
            o.force_method = ForceMethod.parse(need_value(a))
        elif a == "--init":
            o.init_distribution = InitDistribution.parse(need_value(a))
        elif a == "--dt":
            o.dt = _parse_float(need_value(a), a)
        elif a == "--gravity":
            o.G = _parse_float(need_value(a), a)
        elif a == "--softening":
            o.softening = _parse_float(need_value(a), a)
        elif a == "--theta":
            o.barnes_hut_theta = _parse_float(need_value(a), a)
        elif a == "--cell-size":
            o.spatial_hash_cell_size = _parse_float(need_value(a), a)
        elif a == "--cutoff":
            o.spatial_hash_cutoff = _parse_float(need_value(a), a)
        elif a == "--seed":
            o.seed = _parse_int(need_value(a), a)
        elif a == "--benchmark":
            o.benchmark_mode = True
        elif a == "--benchmark-steps":
            o.benchmark_steps = _parse_int(need_value(a), a)
            o.benchmark_mode = True
        elif a == "--benchmark-output":
            o.benchmark_output_path = need_value(a)
            o.benchmark_mode = True
        elif a == "--export":
            o.export_path = need_value(a)
        elif a == "--export-format":
            o.export_format = need_value(a)
        elif a == "--import":
            o.import_path = need_value(a)
        elif a == "--list-algorithms":
            o.list_algorithms = True
        elif a == "--diagnostics":
            o.show_diagnostics = True
        elif a == "--render":
            o.render = True
        elif a == "--render-output":
            o.render_output = need_value(a)
            o.render = True
        elif a == "--devices":
            o.devices = _parse_int(need_value(a), a)
        elif a == "--debug-nans":
            o.debug_nans = True
        elif a == "--steps":
            o.steps = _parse_int(need_value(a), a)
        elif a.startswith("-"):
            raise ValidationError(f"Unknown argument: {a}")
        else:
            o.particle_count = _parse_int(a, "particle count")
        i += 1

    # parse-time validation (reference: app_cli.cpp:133-148)
    from nbody_tpu.errors import (
        validate_particle_count,
        validate_softening,
        validate_theta,
        validate_time_step,
    )

    validate_particle_count(o.particle_count)
    validate_time_step(o.dt)
    validate_softening(o.softening)
    validate_theta(o.barnes_hut_theta)
    if o.G <= 0:
        raise ValidationError("Gravitational constant must be positive")
    if o.spatial_hash_cell_size <= 0:
        raise ValidationError("Spatial hash cell size must be positive")
    if o.spatial_hash_cutoff <= 0:
        raise ValidationError("Spatial hash cutoff must be positive")
    if o.benchmark_steps <= 0:
        raise ValidationError("Benchmark steps must be greater than zero")
    if o.export_format not in ("checkpoint", "hdf5"):
        raise ValidationError(
            f"Unknown export format: {o.export_format} (checkpoint | hdf5)"
        )
    return o


def app_cli_usage() -> str:
    """reference: app_cli.cpp:153-177."""
    return """Usage: nbody-tpu [particle_count] [options]

Simulation options:
  --particles N          Set particle count
  --method NAME          direct-n2 | barnes-hut | spatial-hash
  --init NAME            uniform | spherical | disk | plummer
  --dt VALUE             Set integration time step
  --gravity VALUE        Set gravitational constant
  --softening VALUE      Set softening parameter
  --theta VALUE          Set Barnes-Hut theta
  --cell-size VALUE      Set spatial hash cell size
  --cutoff VALUE         Set spatial hash cutoff radius
  --seed N               Set initializer RNG seed
  --steps N              Step count for interactive/render mode
  --devices N            Shard particles over N devices (mesh)
  --benchmark            Run a non-interactive benchmark and exit
  --benchmark-steps N    Set benchmark update steps
  --benchmark-output P   Write benchmark JSON to path P

Data export/import:
  --export PATH          Export particle state to file
  --export-format FMT    Export format: checkpoint (default) | hdf5
  --import PATH          Import particle state from file

Rendering (host-side point renderer):
  --render               Render frames while stepping
  --render-output DIR    Write PNG frames to DIR

Diagnostics:
  --list-algorithms      List available force methods and exit
  --diagnostics          Output diagnostic information
  --debug-nans           Raise on the first NaN produced on device
  --help                 Show this message
"""


def main(argv: Optional[List[str]] = None) -> int:
    from nbody_tpu.app import Application

    try:
        options = parse_app_cli_options(
            list(sys.argv[1:]) if argv is None else list(argv)
        )
    except ValidationError as e:
        print(f"error: {e}", file=sys.stderr)
        print(app_cli_usage(), file=sys.stderr)
        return 2

    if options.show_help:
        print(app_cli_usage())
        return 0

    try:
        return Application(options).run()
    except ValidationError as e:
        print(f"validation error: {e}", file=sys.stderr)
        return 2
    except KeyboardInterrupt:
        print("\ninterrupted")
        return 130


if __name__ == "__main__":
    sys.exit(main())
