"""Table-resident frozen-grid stepping contracts (ops/table_step.py).

The round-5 scale path keeps integration state in the sweep kernel's
plane-major slot layout between re-sorts (no sort / placement / pickup on
frozen steps). These tests pin its equivalence to the row-space cadence
machinery (ops/integrator.make_resort_multi_step) on the interpret-mode
Pallas pipeline — the same seam discipline as tests/test_frozen_grid.py.
Hardware truth: scripts/profile_r5a.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.models.distributions import init_spherical, init_uniform
from nbody_tpu.ops.barnes_hut import make_barnes_hut_forces_sorted
from nbody_tpu.ops.integrator import (
    initialize_forces,
    make_resort_multi_step,
)
from nbody_tpu.ops.spatial_hash import make_spatial_hash_forces_sorted
from nbody_tpu.ops.table_step import (
    TableParams,
    bh_table_params,
    hash_table_params,
    make_table_adaptive_multi_step,
    make_table_multi_step,
)
from nbody_tpu.types import (
    ForceMethod,
    SimulationConfig,
    SphericalDistParams,
    UniformDistParams,
)

DT = 1e-3
N = 512


def _init(state, sf):
    return jax.jit(
        lambda s: initialize_forces(
            s, lambda p, m: sf(p, m)[0][jnp.argsort(sf(p, m)[2])]
        )
    )(state)


class TestValidation:
    """Cheap (no pipeline compile): parameter contracts."""

    def test_bad_mode_raises(self):
        p = TableParams(mode="nope", d=8, k=8, G=1.0, softening=0.1,
                        ws=1, impl="pallas_interpret")
        with pytest.raises(ValueError, match="mode"):
            make_table_multi_step(p, DT, 2)

    def test_bh_needs_pow2_grid(self):
        p = TableParams(mode="bh", d=24, k=8, G=1.0, softening=0.1,
                        ws=1, impl="pallas_interpret", levels=3)
        with pytest.raises(ValueError):
            make_table_multi_step(p, DT, 2)

    def test_bad_cadence_and_frac(self):
        p = bh_table_params(levels=3, near_k=8, impl="pallas_interpret")
        with pytest.raises(ValueError, match="resort_every"):
            make_table_multi_step(p, DT, 2, 0)
        with pytest.raises(ValueError, match="max_stale_frac"):
            make_table_adaptive_multi_step(p, DT, 2, max_stale_frac=2.0)

    def test_unfused_config_rejected(self):
        # XLA impl has no fused tiles path → no table contract
        p = TableParams(mode="bh", d=8, k=8, G=1.0, softening=0.1,
                        ws=1, impl="xla", levels=3)
        with pytest.raises(ValueError, match="fused"):
            make_table_multi_step(p, DT, 2)


@pytest.mark.slow
class TestTableVsRowSpace:
    """Table-resident stepping == row-space cadence stepping (the already
    contract-tested machinery), including re-sorts, frozen runs, the
    overflow side buffer, and the tag-restored readout order."""

    def test_bh_cadence_matches_row_space(self):
        cfg = SimulationConfig(
            particle_count=N, force_method=ForceMethod.BARNES_HUT,
            bh_max_level=3, dt=DT,
        )
        state = init_spherical(
            jax.random.PRNGKey(3), N, SphericalDistParams(radius=5.0)
        )
        sf = make_barnes_hut_forces_sorted(cfg)
        state = _init(state, sf)
        # side_cap small but >0 so the side-buffer path is live
        p = bh_table_params(levels=3, near_k=8, side_cap=64,
                            impl="pallas_interpret")
        # cadence 3 over 5 steps: entry sort + frozen run + mid re-sort
        row = jax.jit(make_resort_multi_step(sf, DT, 5, 3))(state)
        tab = jax.jit(make_table_multi_step(p, DT, 5, 3))(state)
        np.testing.assert_array_equal(
            np.asarray(row.pos), np.asarray(tab.pos)
        )  # drift arithmetic is bit-identical by design
        scale = float(jnp.max(jnp.abs(row.vel)))
        np.testing.assert_allclose(
            np.asarray(row.vel), np.asarray(tab.vel),
            atol=1e-6 * scale,  # moments summation order differs
        )
        assert bool(jnp.isfinite(tab.acc).all())

    def test_hash_cadence_matches_row_space(self):
        cfg = SimulationConfig(
            particle_count=N, force_method=ForceMethod.SPATIAL_HASH,
            spatial_hash_cell_size=2.0, spatial_hash_cutoff=2.0, dt=DT,
        )
        state = init_uniform(
            jax.random.PRNGKey(4), N,
            UniformDistParams(min_bounds=(-6.0,) * 3,
                              max_bounds=(6.0,) * 3),
        )
        hf = make_spatial_hash_forces_sorted(cfg, np.asarray(state.pos))
        assert hf is not None and hasattr(hf, "frozen")
        state = _init(state, hf)
        p = hash_table_params(cutoff=2.0, cell_size=2.0, d=8, k=8,
                              side_cap=64, impl="pallas_interpret")
        row = jax.jit(make_resort_multi_step(hf, DT, 5, 3))(state)
        tab = jax.jit(make_table_multi_step(p, DT, 5, 3))(state)
        np.testing.assert_array_equal(
            np.asarray(row.pos), np.asarray(tab.pos)
        )
        scale = float(jnp.max(jnp.abs(row.vel))) or 1.0
        np.testing.assert_allclose(
            np.asarray(row.vel), np.asarray(tab.vel), atol=1e-6 * scale
        )

    def test_bh_adaptive_runs_and_traces(self):
        """Adaptive driver: audits BEFORE the force, re-sorts on trip or
        cadence cap, stays finite, restores row order."""
        cfg = SimulationConfig(
            particle_count=N, force_method=ForceMethod.BARNES_HUT,
            bh_max_level=3, dt=DT,
        )
        state = init_spherical(
            jax.random.PRNGKey(5), N, SphericalDistParams(radius=5.0)
        )
        sf = make_barnes_hut_forces_sorted(cfg)
        state = _init(state, sf)
        p = bh_table_params(levels=3, near_k=8, side_cap=64,
                            impl="pallas_interpret")
        multi = jax.jit(make_table_adaptive_multi_step(
            p, DT, 6, max_stale_frac=0.0, max_cadence=4, with_trace=True
        ))
        out, (stales, resorts) = multi(state)
        assert bool(jnp.isfinite(out.pos).all())
        # threshold 0 → any crossing triggers; trace shape = n_steps-1
        assert np.asarray(resorts).shape == (5,)
        # mass is permutation-restored exactly
        np.testing.assert_array_equal(
            np.asarray(out.mass), np.asarray(state.mass)
        )

    def test_beyond_cap_overflow_degrades_to_own_cell(self):
        """Rows past BOTH the k slots and the side capacity read slot
        k-1 of their OWN cell (bounded, documented degradation) — the
        r5f hardware runs showed the old idx_ext default teleported
        them to cell (0,0,0), building an unphysical point mass there
        on collapsing scenes (side overflow >> side_cap)."""
        from nbody_tpu.ops.table_step import (
            _entry,
            table_to_particle_state,
        )
        from nbody_tpu.state import ParticleState

        n = 128
        k = 8
        key = jax.random.PRNGKey(7)
        # 96 particles jammed into one off-origin corner region (ONE
        # cell at d=8), the other 32 spread wide so the grid spans
        # [-8, 8]^3 and the cluster cell is far from cell (0,0,0).
        cluster = 6.0 + 0.1 * jax.random.uniform(
            key, (96, 3), dtype=jnp.float32
        )
        spread = jax.random.uniform(
            jax.random.PRNGKey(8), (32, 3), minval=-8.0, maxval=8.0,
            dtype=jnp.float32,
        )
        pos = jnp.concatenate([cluster, spread])
        state = ParticleState(
            pos=pos, vel=jnp.zeros((n, 3), jnp.float32),
            acc=jnp.zeros((n, 3), jnp.float32),
            mass=jnp.ones((n,), jnp.float32),
            time=jnp.float32(0.0),
        )
        # k=8 slots + side_cap=4: >= 84 cluster rows beyond capacity
        p = bh_table_params(levels=3, near_k=k, side_cap=4,
                            impl="pallas_interpret")
        ts = jax.jit(lambda s: _entry(s, DT, p))(state)
        assert int(ts.side_over) > 0  # audit sees the beyond-cap rows
        out = jax.jit(
            lambda t: table_to_particle_state(t, n, p)
        )(ts)
        assert bool(jnp.isfinite(out.pos).all())
        # Beyond-cap cluster rows must still read a CLUSTER row's state
        # (own cell, slot k-1) — not a row near the grid origin corner.
        clus_out = out.pos[:96]
        d_clus = jnp.linalg.norm(clus_out - 6.05, axis=-1)
        assert float(jnp.max(d_clus)) < 2.5  # within the cluster cell

    def test_repair_matches_cad1_with_movers(self):
        """Repair stepping (exact incremental re-homing) tracks the
        re-sort-every-step trajectory on a scene with real cell
        crossings, and restores masses/order exactly."""
        from nbody_tpu.ops.table_step import make_table_repair_multi_step

        cfg = SimulationConfig(
            particle_count=N, force_method=ForceMethod.BARNES_HUT,
            bh_max_level=3, dt=DT,
        )
        state = init_spherical(
            jax.random.PRNGKey(9), N, SphericalDistParams(radius=5.0)
        )
        # hot scene: random velocities large enough that a few percent
        # of rows cross cells every step
        vel = 60.0 * jax.random.normal(
            jax.random.PRNGKey(10), (N, 3), dtype=jnp.float32
        )
        state = dataclasses.replace(state, vel=vel)
        sf = make_barnes_hut_forces_sorted(cfg)
        state = _init(state, sf)
        p = bh_table_params(levels=3, near_k=8, side_cap=64,
                            impl="pallas_interpret")
        tab = jax.jit(make_table_multi_step(p, DT, 6, 1))(state)
        rep, (stales, rebuilt) = jax.jit(make_table_repair_multi_step(
            p, DT, 6, repair_cap=512, max_cadence=64, with_trace=True
        ))(state)
        assert int(np.asarray(stales).max()) > 0  # movers were live
        assert not bool(np.asarray(rebuilt).any())  # pure repair run
        scale = float(jnp.max(jnp.abs(tab.pos)))
        np.testing.assert_allclose(
            np.asarray(tab.pos), np.asarray(rep.pos),
            atol=1e-4 * scale,  # frozen-geometry far field differs
        )
        np.testing.assert_array_equal(
            np.asarray(rep.mass), np.asarray(state.mass)
        )
        assert bool(jnp.isfinite(rep.vel).all())

    def test_repair_rebuild_trigger(self):
        """Mover counts beyond repair_cap force a full rebuild (beyond
        the compaction capacity movers would be dropped — the rebuild is
        mandatory), and the run stays finite and order-restoring."""
        from nbody_tpu.ops.table_step import make_table_repair_multi_step

        cfg = SimulationConfig(
            particle_count=N, force_method=ForceMethod.BARNES_HUT,
            bh_max_level=3, dt=DT,
        )
        state = init_spherical(
            jax.random.PRNGKey(11), N, SphericalDistParams(radius=5.0)
        )
        vel = 600.0 * jax.random.normal(
            jax.random.PRNGKey(12), (N, 3), dtype=jnp.float32
        )
        state = dataclasses.replace(state, vel=vel)
        sf = make_barnes_hut_forces_sorted(cfg)
        state = _init(state, sf)
        p = bh_table_params(levels=3, near_k=8, side_cap=64,
                            impl="pallas_interpret")
        rep, (stales, rebuilt) = jax.jit(make_table_repair_multi_step(
            p, DT, 5, repair_cap=128, max_cadence=64, with_trace=True
        ))(state)
        assert bool(np.asarray(rebuilt).any())
        assert bool(jnp.isfinite(rep.pos).all())
        np.testing.assert_array_equal(
            np.asarray(rep.mass), np.asarray(state.mass)
        )
