"""Product wiring of table-resident stepping (ops/forces.
make_table_step_params + the ParticleSystem.run_steps table branch).

The table engine itself is contract-tested in tests/test_table_step.py;
these tests pin the SELECTION logic (config → TableParams bridge) and
the facade integration (run_steps picks the table path and its physics
matches row-space stepping). Reference seam: the strategy factory
createForceCalculator (force_spatial_hash.cu:380-401) — engine
selection is config-driven, never caller-spelled.
"""

import jax
import numpy as np
import pytest

from nbody_tpu.ops.forces import make_table_step_params
from nbody_tpu.types import ForceMethod, SimulationConfig


def _bh_cfg(**kw):
    kw.setdefault("particle_count", 512)
    kw.setdefault("force_method", ForceMethod.BARNES_HUT)
    kw.setdefault("bh_max_level", 3)
    return SimulationConfig(**kw)


class TestBridge:
    def test_cpu_backend_gets_none(self):
        # off-TPU the table path would run interpret kernels — the
        # bridge declines and callers keep row-space stepping
        assert make_table_step_params(_bh_cfg(), backend="cpu") is None

    def test_bh_tiles_maps_config(self):
        tp = make_table_step_params(_bh_cfg(), backend="tpu")
        assert tp is not None and tp.mode == "bh"
        assert tp.d == 8 and (1 << tp.levels) == tp.d
        cfg = _bh_cfg()
        assert tp.G == cfg.G and tp.softening == cfg.softening

    def test_direct_n2_gets_none(self):
        cfg = SimulationConfig(
            particle_count=512, force_method=ForceMethod.DIRECT_N2
        )
        assert make_table_step_params(cfg, backend="tpu") is None

    def test_oversize_n_gets_none(self):
        cfg = _bh_cfg(particle_count=1 << 24)
        assert make_table_step_params(cfg, backend="tpu") is None

    def test_hash_tiles_maps_config(self):
        n = 4096
        cfg = SimulationConfig(
            particle_count=n, force_method=ForceMethod.SPATIAL_HASH,
            spatial_hash_cell_size=2.0, spatial_hash_cutoff=2.0,
            hash_engine="tiles",
        )
        half = 8.0
        rng = np.random.default_rng(0)
        pos = rng.uniform(-half, half, (n, 3)).astype(np.float32)
        tp = make_table_step_params(cfg, backend="tpu", pos_hint=pos)
        assert tp is not None and tp.mode == "hash"
        assert tp.cutoff2 == pytest.approx(4.0)
        assert tp.cell_size == pytest.approx(2.0)


@pytest.mark.slow
class TestRunStepsTableBranch:
    def test_run_steps_table_matches_row_space(self, monkeypatch):
        """run_steps with resort_stale_frac > 0 routes through the
        table-adaptive driver and tracks plain row-space stepping."""
        from nbody_tpu import ops
        from nbody_tpu.ops.table_step import bh_table_params
        from nbody_tpu.system import ParticleSystem
        from nbody_tpu.types import InitDistribution

        # the bridge declines on CPU; force interpret-mode params so the
        # facade branch is exercised hermetically
        monkeypatch.setattr(
            ops.forces,
            "make_table_step_params",
            lambda config, **kw: bh_table_params(
                G=config.G, softening=config.softening,
                theta=config.barnes_hut_theta,
                levels=config.bh_max_level, near_k=8, side_cap=64,
                impl="pallas_interpret",
            ),
        )
        cfg = _bh_cfg(
            init_distribution=InitDistribution.SPHERICAL,
            resort_stale_frac=0.05,
            resort_every=4,
        )
        sys_t = ParticleSystem()
        sys_t.initialize(cfg)
        sys_t.run_steps(3)
        out = sys_t.get_state()

        cfg_row = _bh_cfg(init_distribution=InitDistribution.SPHERICAL)
        sys_r = ParticleSystem()
        sys_r.initialize(cfg_row)
        sys_r.run_steps(3)
        ref = sys_r.get_state()

        scale = float(np.max(np.abs(np.asarray(ref.pos)))) or 1.0
        np.testing.assert_allclose(
            np.asarray(out.pos), np.asarray(ref.pos), atol=1e-5 * scale
        )
        assert bool(jax.numpy.isfinite(out.vel).all())
