"""CLI tests (reference: tests/test_app_cli.cpp): flag parsing, unknown
flag/method rejection, positional count, export/import options, parse-time
validation, plus end-to-end app runs (benchmark mode, list-algorithms).
"""

import json

import pytest

from nbody_tpu.cli import (
    app_cli_usage,
    main,
    parse_app_cli_options,
)
from nbody_tpu.errors import ValidationError
from nbody_tpu.types import ForceMethod, InitDistribution


class TestParsing:
    def test_defaults(self):
        o = parse_app_cli_options([])
        assert o.particle_count == 10_000
        assert o.force_method == ForceMethod.DIRECT_N2
        assert not o.benchmark_mode

    def test_all_simulation_flags(self):
        o = parse_app_cli_options(
            [
                "--particles", "5000", "--method", "barnes-hut",
                "--dt", "0.01", "--gravity", "2.0", "--softening", "0.2",
                "--theta", "0.7", "--cell-size", "1.5", "--cutoff", "3.0",
                "--init", "disk", "--seed", "7",
            ]
        )
        assert o.particle_count == 5000
        assert o.force_method == ForceMethod.BARNES_HUT
        assert o.dt == 0.01 and o.G == 2.0 and o.softening == 0.2
        assert o.barnes_hut_theta == 0.7
        assert o.spatial_hash_cell_size == 1.5
        assert o.spatial_hash_cutoff == 3.0
        assert o.init_distribution == InitDistribution.DISK
        assert o.seed == 7

    def test_positional_count(self):
        assert parse_app_cli_options(["12345"]).particle_count == 12345

    def test_benchmark_flags(self):
        o = parse_app_cli_options(
            ["--benchmark-steps", "50", "--benchmark-output", "/tmp/x.json"]
        )
        assert o.benchmark_mode
        assert o.benchmark_steps == 50
        assert o.benchmark_output_path == "/tmp/x.json"

    def test_export_import(self):
        o = parse_app_cli_options(
            ["--export", "a.nbody", "--export-format", "hdf5",
             "--import", "b.h5"]
        )
        assert o.export_path == "a.nbody"
        assert o.export_format == "hdf5"
        assert o.import_path == "b.h5"

    def test_unknown_flag_rejected(self):
        with pytest.raises(ValidationError, match="Unknown argument"):
            parse_app_cli_options(["--frobnicate"])

    def test_unknown_method_rejected(self):
        with pytest.raises(ValidationError, match="Unknown force method"):
            parse_app_cli_options(["--method", "magic"])

    def test_missing_value_rejected(self):
        with pytest.raises(ValidationError, match="Missing value"):
            parse_app_cli_options(["--particles"])

    def test_bad_numeric_rejected(self):
        with pytest.raises(ValidationError, match="Invalid numeric"):
            parse_app_cli_options(["--particles", "lots"])

    @pytest.mark.parametrize(
        "argv",
        [
            ["--particles", "0"],
            ["--dt", "-1"],
            ["--dt", "2.0"],
            ["--theta", "5"],
            ["--gravity", "-1"],
            ["--cell-size", "0"],
            ["--cutoff", "-2"],
            ["--benchmark-steps", "0"],
            ["--export-format", "xml"],
        ],
    )
    def test_parse_time_validation(self, argv):
        with pytest.raises(ValidationError):
            parse_app_cli_options(argv)

    def test_usage_mentions_all_flags(self):
        usage = app_cli_usage()
        for flag in (
            "--particles", "--method", "--dt", "--gravity", "--softening",
            "--theta", "--cell-size", "--cutoff", "--benchmark",
            "--benchmark-steps", "--benchmark-output", "--export",
            "--export-format", "--import", "--list-algorithms",
            "--diagnostics", "--help",
        ):
            assert flag in usage


class TestDistParams:
    """Distribution parameters plumb CLI -> config -> initializer
    (reference: include/nbody/types.hpp:343-382 param structs)."""

    def test_disk_radius_reaches_config(self):
        from nbody_tpu.types import DiskDistParams

        o = parse_app_cli_options(
            ["--init", "disk", "--radius", "25", "--thickness", "0.5",
             "--rotation-speed", "2.0"]
        )
        cfg = o.to_config()
        assert isinstance(cfg.dist_params, DiskDistParams)
        assert cfg.dist_params.radius == 25.0
        assert cfg.dist_params.thickness == 0.5
        assert cfg.dist_params.rotation_speed == 2.0

    def test_uniform_bounds_and_center_vec3(self):
        from nbody_tpu.types import UniformDistParams

        o = parse_app_cli_options(
            ["--init", "uniform", "--min-bounds", "-1,-2,-3",
             "--max-bounds", "1,2,3"]
        )
        cfg = o.to_config()
        assert isinstance(cfg.dist_params, UniformDistParams)
        assert cfg.dist_params.min_bounds == (-1.0, -2.0, -3.0)
        assert cfg.dist_params.max_bounds == (1.0, 2.0, 3.0)

    def test_default_params_stay_none(self):
        assert parse_app_cli_options(["--init", "disk"]).to_config().dist_params is None

    def test_inapplicable_flag_rejected(self):
        with pytest.raises(ValidationError, match="does not apply"):
            parse_app_cli_options(["--init", "spherical", "--thickness", "1"])

    def test_bad_vec3_rejected(self):
        with pytest.raises(ValidationError, match="X,Y,Z"):
            parse_app_cli_options(["--init", "uniform", "--min-bounds", "1,2"])

    @pytest.mark.parametrize(
        "argv",
        [
            ["--radius", "-1"],
            ["--init", "disk", "--thickness", "0"],
            ["--min-mass", "2", "--max-mass", "1"],
            ["--init", "uniform", "--min-bounds", "1,1,1",
             "--max-bounds", "0,2,2"],
        ],
    )
    def test_param_validation(self, argv):
        with pytest.raises(ValidationError):
            parse_app_cli_options(argv)

    def test_radius_reaches_particles(self):
        """--init disk --radius: particles actually land in the wider disk."""
        import numpy as np

        from nbody_tpu.models.distributions import init_from_config

        o = parse_app_cli_options(
            ["--particles", "512", "--init", "disk", "--radius", "30"]
        )
        state = init_from_config(o.to_config())
        r = np.linalg.norm(np.asarray(state.pos)[:, :2], axis=1)
        assert r.max() > 10.0  # beyond the default radius
        assert r.max() <= 30.0 + 1e-4

    def test_mismatched_params_type_rejected(self):
        from nbody_tpu.models.distributions import init_from_config
        from nbody_tpu.types import DiskDistParams, SimulationConfig

        cfg = SimulationConfig(
            particle_count=16, dist_params=DiskDistParams()
        )  # init is SPHERICAL by default
        with pytest.raises(ValidationError, match="does not match"):
            init_from_config(cfg)


class TestAppEndToEnd:
    def test_help_exits_zero(self, capsys):
        assert main(["--help"]) == 0
        assert "Usage" in capsys.readouterr().out

    def test_bad_flag_exits_two(self, capsys):
        assert main(["--nope"]) == 2
        assert "error" in capsys.readouterr().err

    def test_list_algorithms(self, capsys):
        assert main(["--list-algorithms"]) == 0
        out = capsys.readouterr().out
        assert "direct-n2" in out and "barnes-hut" in out and "spatial-hash" in out

    def test_diagnostics(self, capsys):
        assert main(["--diagnostics"]) == 0
        assert "backend" in capsys.readouterr().out

    def test_benchmark_mode_emits_json(self, capsys, tmp_path):
        out_path = str(tmp_path / "bench.json")
        rc = main(
            ["--particles", "500", "--benchmark-steps", "5",
             "--benchmark-output", out_path]
        )
        assert rc == 0
        doc = json.loads(capsys.readouterr().out)
        runs = doc["benchmark_runs"]
        assert len(runs) == 1
        rec = runs[0]
        assert rec["method"] == "direct-n2"
        assert rec["particle_count"] == 500
        assert rec["iterations"] == 5
        assert rec["metrics"]["steps_per_sec"] > 0
        with open(out_path) as f:
            assert json.load(f) == doc

    def test_trace_flag_parses(self):
        o = parse_app_cli_options(["--trace", "/tmp/tracedir"])
        assert o.trace_dir == "/tmp/tracedir"
        assert parse_app_cli_options([]).trace_dir == ""

    def test_benchmark_trace_writes_profile(self, capsys, tmp_path):
        """--trace DIR wraps the benchmark loop in jax.profiler.trace and
        leaves a loadable trace behind (SURVEY §5.1 TPU equivalent of the
        reference's documented nsys workflow, performance.md:287-318)."""
        trace_dir = tmp_path / "trace"
        rc = main(
            ["--particles", "300", "--benchmark-steps", "3",
             "--trace", str(trace_dir)]
        )
        assert rc == 0
        capsys.readouterr()
        dumped = list(trace_dir.rglob("*"))
        assert any(p.is_file() for p in dumped), "trace dir is empty"

    def test_benchmark_export_roundtrip(self, capsys, tmp_path):
        ckpt = str(tmp_path / "state.nbody")
        assert main(
            ["--particles", "300", "--benchmark-steps", "3",
             "--export", ckpt]
        ) == 0
        capsys.readouterr()
        assert main(
            ["--particles", "300", "--benchmark-steps", "3",
             "--import", ckpt]
        ) == 0


class TestKeyControls:
    """Key→action surface (reference: main.cpp:265-305 key callbacks)."""

    def test_mapping(self):
        from nbody_tpu.app import key_to_action

        assert key_to_action(" ") == "toggle_pause"
        assert key_to_action("r") == "reset"
        assert key_to_action("R") == "reset"
        assert key_to_action("1") == "method:direct-n2"
        assert key_to_action("2") == "method:barnes-hut"
        assert key_to_action("3") == "method:spatial-hash"
        assert key_to_action("c") == "cycle_color"
        assert key_to_action("p") == "toggle_panel"
        assert key_to_action("q") == "quit"
        assert key_to_action("\x1b") == "quit"
        assert key_to_action("z") is None

    def test_camera_keys(self):
        """Live-view camera controls (reference: mouse orbit + scroll
        zoom, main.cpp:307-331 → h/j/k/l/+/-/0 on the headless host)."""
        from nbody_tpu.app import apply_camera_action, key_to_action
        from nbody_tpu.render.camera import Camera

        cam = Camera(distance=50.0, azimuth=0.0, elevation=0.3)
        assert apply_camera_action(cam, key_to_action("l"))
        assert cam.azimuth > 0.0
        assert apply_camera_action(cam, key_to_action("k"))
        assert cam.elevation > 0.3
        assert apply_camera_action(cam, key_to_action("+"))
        assert cam.distance < 50.0
        assert apply_camera_action(cam, key_to_action("-"))
        assert apply_camera_action(cam, key_to_action("0"))
        assert (cam.distance, cam.azimuth, cam.elevation) == (50.0, 0.0, 0.3)
        # non-camera actions and a missing camera are no-ops
        assert not apply_camera_action(cam, "reset")
        assert not apply_camera_action(None, "camera:zoom:1")


def test_debug_nans_enables_checking():
    """--debug-nans flips jax_debug_nans before any device work
    (docs/specs/simulation-control.md: Numerical Fault Reporting)."""
    import jax

    from nbody_tpu.app import Application
    from nbody_tpu.cli import parse_app_cli_options

    assert not jax.config.jax_debug_nans
    opts = parse_app_cli_options(["--debug-nans", "--list-algorithms"])
    try:
        assert Application(opts).run() == 0
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)
