"""Frozen-grid (amortized re-sort) stepping contracts.

The TPU scale path re-sorts particles by cell every step; at small dt the
sort is near-identity, so ops/integrator.make_resort_multi_step re-sorts
every k-th step and runs the engines' FROZEN form between
(ops/sorted_window.FrozenGridMeta). The reference re-sorts every step
(Thrust, force_barnes_hut.cu:276-280) — the cadence is a TPU-build
extension; these tests pin its equivalence and error contracts.
Everything runs the interpret-mode Pallas pipeline on CPU (small N,
shallow grids — compile budget).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Compile-heavy (every case builds interpret-mode multi-step programs —
# ~1-2 min each on a 1-core box): excluded from the default run, CI runs
# them in the slow job. The frozen path's hardware truth lives in
# scripts/profile_r4d/r5a.py.
pytestmark = pytest.mark.slow

from nbody_tpu.models.distributions import init_spherical, init_uniform
from nbody_tpu.ops.barnes_hut import (
    barnes_hut_forces_frozen,
    barnes_hut_forces_sorted,
    make_barnes_hut_forces_sorted,
)
from nbody_tpu.ops.integrator import (
    initialize_forces,
    make_adaptive_multi_step,
    make_resort_multi_step,
    make_sorted_multi_step,
)
from nbody_tpu.ops.spatial_hash import (
    make_spatial_hash_forces_sorted,
    spatial_hash_forces_tiles_frozen,
    spatial_hash_forces_tiles_sorted,
)
from nbody_tpu.types import (
    ForceMethod,
    SimulationConfig,
    SphericalDistParams,
    UniformDistParams,
)

BH_KW = dict(levels=3, near_k=8, multipole_order=2,
             near_impl="pallas_interpret")
HASH_KW = dict(cutoff=2.0, cell_size=2.0, d=8, k=8,
               impl="pallas_interpret")


@pytest.fixture(scope="module")
def sphere():
    return init_spherical(
        jax.random.PRNGKey(3), 512, SphericalDistParams(radius=5.0)
    )


@pytest.fixture(scope="module")
def cube():
    return init_uniform(
        jax.random.PRNGKey(4), 512,
        UniformDistParams(min_bounds=(-6.0,) * 3, max_bounds=(6.0,) * 3),
    )


class TestFrozenForceEquivalence:
    def test_bh_frozen_fresh_meta_bitwise(self, sphere):
        """With a just-built meta (no motion), the frozen pipeline is the
        SAME pipeline — outputs must match the sorted engine bitwise."""
        acc, psort, order, meta = barnes_hut_forces_sorted(
            sphere.pos, sphere.mass, 1.0, 0.1, 0.5,
            with_grid_meta=True, **BH_KW,
        )
        accf = barnes_hut_forces_frozen(
            psort, meta, 1.0, 0.1, 0.5, **BH_KW
        )
        np.testing.assert_array_equal(np.asarray(acc), np.asarray(accf))

    def test_hash_frozen_fresh_meta_bitwise(self, cube):
        acc, psort, order, meta = spatial_hash_forces_tiles_sorted(
            cube.pos, cube.mass, 1.0, 0.1, with_grid_meta=True, **HASH_KW
        )
        accf = spatial_hash_forces_tiles_frozen(
            psort, meta, 1.0, 0.1, **HASH_KW
        )
        np.testing.assert_array_equal(np.asarray(acc), np.asarray(accf))

    def test_bh_audit_counts_boundary_crossers(self, sphere):
        """No motion → 0 stale; forced motion → the audit counts exactly
        the rows whose cell id changed under the frozen binning."""
        _, psort, _, meta = barnes_hut_forces_sorted(
            sphere.pos, sphere.mass, 1.0, 0.1, 0.5,
            with_grid_meta=True, **BH_KW,
        )
        _, stale0 = barnes_hut_forces_frozen(
            psort, meta, 1.0, 0.1, 0.5, with_audit=True, **BH_KW
        )
        assert int(stale0) == 0
        moved = psort.at[:, :3].add(
            0.3 * jax.random.normal(jax.random.PRNGKey(9), (512, 3))
        )
        _, stale1 = barnes_hut_forces_frozen(
            moved, meta, 1.0, 0.1, 0.5, with_audit=True, **BH_KW
        )
        d = 1 << BH_KW["levels"]
        cs = jnp.clip(
            ((moved[:, :3] - meta.lo) / meta.cell).astype(jnp.int32),
            0, d - 1,
        )
        ids_now = (cs[:, 0] * d + cs[:, 1]) * d + cs[:, 2]
        expect = int(jnp.sum(ids_now != meta.ids))
        assert int(stale1) == expect > 0

    def test_frozen_small_motion_close_to_resorted(self, sphere):
        """One dt of motion: frozen force ≈ freshly re-sorted force (the
        stale rows are boundary ties; everyone else is identical)."""
        acc, psort, order, meta = barnes_hut_forces_sorted(
            sphere.pos, sphere.mass, 1.0, 0.1, 0.5,
            with_grid_meta=True, **BH_KW,
        )
        vel = 0.05 * jax.random.normal(jax.random.PRNGKey(5), (512, 3))
        moved = psort.at[:, :3].add(1e-3 * vel)
        accf = barnes_hut_forces_frozen(moved, meta, 1.0, 0.1, 0.5, **BH_KW)
        acc2 = barnes_hut_forces_sorted(
            moved[:, :3], moved[:, 3], 1.0, 0.1, 0.5, **BH_KW
        )[0]
        # acc2 is in the NEW sorted order; map frozen output there
        order2 = barnes_hut_forces_sorted(
            moved[:, :3], moved[:, 3], 1.0, 0.1, 0.5, **BH_KW
        )[2]
        scale = float(jnp.max(jnp.abs(acc2)))
        np.testing.assert_allclose(
            np.asarray(accf[order2]), np.asarray(acc2),
            atol=2e-3 * scale,
        )


def _bh_config():
    return SimulationConfig(
        particle_count=512, force_method=ForceMethod.BARNES_HUT,
        bh_max_level=3, dt=1e-3,
    )


def _init_sorted(state, sf):
    return initialize_forces(
        state, lambda p, m: sf(p, m)[0][jnp.argsort(sf(p, m)[2])]
    )


class TestResortMultiStep:
    def test_cadence_one_is_sorted_multi_step(self, sphere):
        sf = make_barnes_hut_forces_sorted(_bh_config())
        s = _init_sorted(sphere, sf)
        a = jax.jit(make_sorted_multi_step(sf, 1e-3, 6))(s)
        b = jax.jit(make_resort_multi_step(sf, 1e-3, 6, 1))(s)
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
        np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))

    def test_cadence_physics_close(self, sphere):
        """resort_every=3 over 7 steps (remainder chunk included) tracks
        the every-step integration to ~f32 noise."""
        sf = make_barnes_hut_forces_sorted(_bh_config())
        s = _init_sorted(sphere, sf)
        a = jax.jit(make_resort_multi_step(sf, 1e-3, 7, 1))(s)
        b = jax.jit(make_resort_multi_step(sf, 1e-3, 7, 3))(s)
        pscale = float(jnp.max(jnp.abs(a.pos)))
        np.testing.assert_allclose(
            np.asarray(a.pos), np.asarray(b.pos), atol=1e-5 * pscale
        )
        assert float(a.time) == pytest.approx(float(b.time))

    def test_hash_tiles_cadence(self, cube):
        cfg = SimulationConfig(
            particle_count=512, force_method=ForceMethod.SPATIAL_HASH,
            spatial_hash_cell_size=2.0, spatial_hash_cutoff=2.0,
            hash_engine="tiles", hash_max_grid_dim=8, hash_tile_k=8,
            dt=1e-3,
        )
        sf = make_spatial_hash_forces_sorted(cfg)
        assert hasattr(sf, "frozen"), "tiles factory must expose frozen"
        s = _init_sorted(cube, sf)
        a = jax.jit(make_resort_multi_step(sf, 1e-3, 6, 1))(s)
        b = jax.jit(make_resort_multi_step(sf, 1e-3, 6, 3))(s)
        pscale = float(jnp.max(jnp.abs(a.pos))) or 1.0
        np.testing.assert_allclose(
            np.asarray(a.pos), np.asarray(b.pos), atol=1e-5 * pscale
        )

    def test_system_run_steps_cadence_matches(self):
        """--resort-every flows through the facade: run_steps with
        cadence 3 tracks cadence 1 (the default) through
        ParticleSystem (system.py run_steps dispatch)."""
        from nbody_tpu.system import ParticleSystem

        def run(cadence):
            sys_ = ParticleSystem()
            sys_.initialize(SimulationConfig(
                particle_count=256, force_method=ForceMethod.SPATIAL_HASH,
                spatial_hash_cell_size=2.0, spatial_hash_cutoff=2.0,
                hash_engine="tiles", hash_max_grid_dim=8, hash_tile_k=8,
                dt=1e-3, seed=11, resort_every=cadence,
            ))
            sys_.run_steps(6)
            return sys_.positions()

        a, b = run(1), run(3)
        scale = float(np.max(np.abs(a))) or 1.0
        np.testing.assert_allclose(a, b, atol=1e-5 * scale)

    def test_missing_contract_raises(self):
        def bare(pos, mass, extra=None):  # pragma: no cover - never runs
            raise AssertionError

        with pytest.raises(ValueError, match="frozen-grid contract"):
            make_resort_multi_step(bare, 1e-3, 4, 2)

    def test_bad_cadence_raises(self):
        sf = make_barnes_hut_forces_sorted(_bh_config())
        with pytest.raises(ValueError, match="resort_every"):
            make_resort_multi_step(sf, 1e-3, 4, 0)


class TestAdaptiveMultiStep:
    """Audit-driven re-sort (ops/integrator.make_adaptive_multi_step):
    the fixed-cadence machinery with staleness as the trigger."""

    def test_max_cadence_one_is_every_step(self, sphere):
        """max_cadence=1 must reproduce cadence-1 stepping bitwise."""
        sf = make_barnes_hut_forces_sorted(_bh_config())
        s = _init_sorted(sphere, sf)
        a = jax.jit(make_resort_multi_step(sf, 1e-3, 5, 1))(s)
        b = jax.jit(make_adaptive_multi_step(
            sf, 1e-3, 5, max_stale_frac=0.0, max_cadence=1))(s)
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
        np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))

    def test_stale_never_triggers_is_fixed_cadence(self, sphere):
        """max_stale_frac=1 (staleness never triggers) reproduces the
        fixed max_cadence up to ulp: the adaptive path's always-on
        audit fuses slightly differently than the unaudited frozen form
        (measured 8/1536 elements at 1 ulp)."""
        sf = make_barnes_hut_forces_sorted(_bh_config())
        s = _init_sorted(sphere, sf)
        a = jax.jit(make_resort_multi_step(sf, 1e-3, 7, 3))(s)
        b = jax.jit(make_adaptive_multi_step(
            sf, 1e-3, 7, max_stale_frac=1.0, max_cadence=3))(s)
        pscale = float(jnp.max(jnp.abs(a.pos)))
        vscale = float(jnp.max(jnp.abs(a.vel))) or 1.0
        np.testing.assert_allclose(
            np.asarray(a.pos), np.asarray(b.pos), atol=1e-6 * pscale)
        np.testing.assert_allclose(
            np.asarray(a.vel), np.asarray(b.vel), atol=1e-5 * vscale)
        assert float(a.time) == float(b.time)

    def test_trace_resorts_when_stale_exceeds(self, sphere):
        """With a tiny threshold, a frozen step whose audit crosses it
        forces the NEXT step to re-sort (the documented one-step lag);
        every re-sorted step reports stale 0."""
        sf = make_barnes_hut_forces_sorted(_bh_config())
        s = _init_sorted(sphere, sf)
        # Hot velocities so staleness accrues within a few steps.
        import dataclasses

        s = dataclasses.replace(s, vel=s.vel + 50.0 * jax.random.normal(
            jax.random.PRNGKey(8), s.vel.shape, dtype=s.vel.dtype))
        out, (stales, resorts) = jax.jit(make_adaptive_multi_step(
            sf, 1e-3, 8, max_stale_frac=1e-4, max_cadence=64,
            with_trace=True))(s)
        stales = np.asarray(stales)
        resorts = np.asarray(resorts)
        assert bool(jnp.all(jnp.isfinite(out.pos)))
        cap = int(1e-4 * 512)
        # audit(i) > cap  =>  step i+1 re-sorted
        for i in range(len(stales) - 1):
            if stales[i] > cap:
                assert resorts[i + 1], (i, stales, resorts)
        assert np.all(stales[resorts] == 0)
        assert resorts.any(), (stales, resorts)

    def test_adaptive_tracks_every_step_physics(self, sphere):
        sf = make_barnes_hut_forces_sorted(_bh_config())
        s = _init_sorted(sphere, sf)
        a = jax.jit(make_resort_multi_step(sf, 1e-3, 6, 1))(s)
        b = jax.jit(make_adaptive_multi_step(
            sf, 1e-3, 6, max_stale_frac=0.005, max_cadence=4))(s)
        pscale = float(jnp.max(jnp.abs(a.pos)))
        np.testing.assert_allclose(
            np.asarray(a.pos), np.asarray(b.pos), atol=1e-5 * pscale
        )

    def test_facade_stale_frac_dispatch(self):
        """resort_stale_frac flows through ParticleSystem.run_steps and
        stays close to the every-step default."""
        from nbody_tpu.system import ParticleSystem

        def run(frac):
            sys_ = ParticleSystem()
            sys_.initialize(SimulationConfig(
                particle_count=256, force_method=ForceMethod.SPATIAL_HASH,
                spatial_hash_cell_size=2.0, spatial_hash_cutoff=2.0,
                hash_engine="tiles", hash_max_grid_dim=8, hash_tile_k=8,
                dt=1e-3, seed=11, resort_stale_frac=frac,
            ))
            sys_.run_steps(6)
            return sys_.positions()

        a, b = run(0.0), run(0.01)
        scale = float(np.max(np.abs(a))) or 1.0
        np.testing.assert_allclose(a, b, atol=1e-5 * scale)

    def test_bad_params_raise(self):
        sf = make_barnes_hut_forces_sorted(_bh_config())
        with pytest.raises(ValueError, match="max_stale_frac"):
            make_adaptive_multi_step(sf, 1e-3, 4, max_stale_frac=1.5)
        with pytest.raises(ValueError, match="max_cadence"):
            make_adaptive_multi_step(sf, 1e-3, 4, max_cadence=0)
