"""`--devices` wired end-to-end: ParticleSystem/CLI on the fake 8-device
mesh (VERDICT r3 item 2 — the flag must drive real sharded execution, with
physics allclose vs single-device). The reference is single-GPU; the seam
analogue is its strategy construction (particle_system.cpp:85).
"""

import json

import jax
import numpy as np
import pytest

from nbody_tpu.cli import main
from nbody_tpu.system import ParticleSystem
from nbody_tpu.types import ForceMethod, SimulationConfig


@pytest.fixture(autouse=True)
def _need_eight_devices():
    assert len(jax.devices()) >= 8, "conftest should fake 8 CPU devices"


def _run(devices: int, n: int = 256, steps: int = 5) -> ParticleSystem:
    sys_ = ParticleSystem()
    sys_.initialize(
        SimulationConfig(
            particle_count=n, dt=1e-3, shard_devices=devices, seed=7
        )
    )
    sys_.run_steps(steps)
    return sys_


class TestShardedSystem:
    def test_initialize_builds_mesh(self):
        sys_ = _run(8, steps=0)
        assert sys_.is_sharded
        assert sys_.mesh.devices.size == 8
        assert sys_.diagnostics()["shard_devices"] == 8

    def test_run_steps_matches_single_device(self):
        """The multi-chip product path (pad → shard → SPMD fused
        multi-step) is physics-equivalent to --devices 1."""
        s8 = _run(8)
        s1 = _run(1)
        assert not s1.is_sharded
        np.testing.assert_allclose(
            s8.positions(), s1.positions(), atol=1e-5
        )
        np.testing.assert_allclose(
            s8.velocities(), s1.velocities(), atol=1e-5
        )

    def test_update_matches_single_device(self):
        """Per-step update() (the interactive path) is also sharded."""
        s8 = _run(8, steps=0)
        s1 = _run(1, steps=0)
        for _ in range(3):
            s8.update()
            s1.update()
        np.testing.assert_allclose(
            s8.positions(), s1.positions(), atol=1e-5
        )

    def test_padding_is_invisible(self):
        """Non-divisible N pads internally with zero-mass rows; every
        public surface reports logical N."""
        sys_ = _run(8, n=250)
        assert sys_.particle_count == 250
        assert sys_.positions().shape == (250, 3)
        assert sys_.state.n == 256  # padded internal state
        snap = sys_.get_state()
        assert snap.particle_count == 250

    def test_energy_matches_single_device(self):
        s8 = _run(8, n=250, steps=2)
        s1 = _run(1, n=250, steps=2)
        e8 = s8.compute_total_energy()
        e1 = s1.compute_total_energy()
        assert abs(e8 - e1) / abs(e1) < 1e-4
        ke8 = s8.compute_kinetic_energy()
        ke1 = s1.compute_kinetic_energy()
        assert abs(ke8 - ke1) <= 1e-5 * max(1.0, abs(ke1))

    def test_checkpoint_roundtrip_sharded(self, tmp_path):
        """save/load work sharded; the file holds logical N only."""
        path = str(tmp_path / "sharded.nbody")
        s8 = _run(8, n=250, steps=2)
        s8.save_state(path)
        fresh = ParticleSystem()
        fresh._config = SimulationConfig(shard_devices=8)
        fresh.set_state(
            __import__(
                "nbody_tpu.utils.serialization", fromlist=["Serializer"]
            ).Serializer.load(path)
        )
        assert fresh.is_sharded
        assert fresh.particle_count == 250
        np.testing.assert_allclose(
            fresh.positions(), s8.positions(), atol=1e-6
        )

    def test_reset_stays_sharded(self):
        s8 = _run(8, steps=2)
        s8.reset()
        assert s8.is_sharded
        assert s8.particle_count == 256

    def test_audit_matches_single_device(self):
        """The overflow audit runs on a sharded system and counts exactly
        what the single-device audit counts for the same config/state."""
        cfg = dict(
            particle_count=256,
            force_method=ForceMethod.SPATIAL_HASH,
            hash_max_grid_dim=8,
            seed=7,
        )
        s8 = ParticleSystem()
        s8.initialize(SimulationConfig(shard_devices=8, **cfg))
        s1 = ParticleSystem()
        s1.initialize(SimulationConfig(shard_devices=1, **cfg))
        a8 = s8.audit_short_range()
        a1 = s1.audit_short_range()
        assert a8["method"] == "spatial-hash"
        assert a8 == a1


class TestShardedCli:
    def test_devices_benchmark_end_to_end(self, capsys, tmp_path):
        """`nbody-tpu --devices 8 --benchmark` runs the sharded path and
        emits the benchmark record (the r3 dead-flag defect)."""
        out_path = str(tmp_path / "bench.json")
        rc = main(
            [
                "--particles", "256", "--devices", "8",
                "--benchmark-steps", "4", "--benchmark-output", out_path,
            ]
        )
        assert rc == 0
        doc = json.loads(capsys.readouterr().out)
        rec = doc["benchmark_runs"][0]
        assert rec["particle_count"] == 256
        assert rec["metrics"]["steps_per_sec"] > 0
        assert rec["params"]["devices"] == "8"

    def test_devices_benchmark_matches_single(self, capsys, tmp_path):
        """--devices 8 and --devices 1 produce the same physics through
        the FULL CLI surface (benchmark → export → reimport compare)."""
        p8 = str(tmp_path / "s8.nbody")
        p1 = str(tmp_path / "s1.nbody")
        for dev, path in ((8, p8), (1, p1)):
            rc = main(
                [
                    "--particles", "250", "--devices", str(dev),
                    "--benchmark-steps", "3", "--export", path,
                ]
            )
            assert rc == 0
            capsys.readouterr()
        from nbody_tpu.utils.serialization import Serializer

        a = Serializer.load(p8)
        b = Serializer.load(p1)
        np.testing.assert_allclose(a.pos, b.pos, atol=1e-5)
        np.testing.assert_allclose(a.vel, b.vel, atol=1e-5)

    def test_too_many_devices_rejected(self, capsys):
        rc = main(["--particles", "64", "--devices", "4096", "--benchmark"])
        assert rc == 2
        assert "devices" in capsys.readouterr().err.lower()
