"""ParticleSystem facade tests (reference: facade behavior in
src/core/particle_system.cpp; pause/resume freeze property from
tests/test_serialization.cpp).
"""

import numpy as np
import pytest

from nbody_tpu import (
    ForceMethod,
    InitDistribution,
    ParticleSystem,
    SimulationConfig,
    ValidationError,
)


@pytest.fixture
def small_system():
    sys_ = ParticleSystem()
    # Small grids: the default bh_max_level=6 (64³ pyramid) costs ~3 min
    # of CPU compile per method-switch; resolution is irrelevant to the
    # facade semantics under test.
    sys_.initialize(
        SimulationConfig(
            particle_count=200, seed=7, bh_max_level=3, hash_max_grid_dim=16
        )
    )
    return sys_


def test_requires_initialize():
    s = ParticleSystem()
    with pytest.raises(ValidationError):
        s.update()
    with pytest.raises(ValidationError):
        _ = s.particle_count


def test_initialize_computes_forces(small_system):
    acc = np.asarray(small_system.state.acc)
    assert np.isfinite(acc).all()
    assert np.abs(acc).max() > 0  # initial forces are populated


def test_update_advances_time(small_system):
    t0 = small_system.simulation_time
    small_system.update()
    assert small_system.simulation_time > t0


def test_pause_resume_freeze(small_system):
    """Pause freezes state exactly (reference: pause/resume property,
    test_serialization.cpp)."""
    small_system.update()
    small_system.pause()
    snap = small_system.get_state()
    small_system.update()
    small_system.update()
    assert small_system.get_state() == snap
    small_system.resume()
    small_system.update()
    assert small_system.get_state() != snap


def test_reset_restores_initial(small_system):
    first = small_system.positions().copy()
    for _ in range(5):
        small_system.update()
    small_system.reset()
    np.testing.assert_allclose(small_system.positions(), first, atol=1e-6)
    assert small_system.simulation_time == 0.0


def test_set_force_method_live(small_system):
    for method in (
        ForceMethod.SPATIAL_HASH,
        ForceMethod.BARNES_HUT,
        ForceMethod.DIRECT_N2,
    ):
        small_system.set_force_method(method)
        small_system.update()
        assert np.isfinite(small_system.positions()).all()


def test_setters_validate(small_system):
    with pytest.raises(ValidationError):
        small_system.set_time_step(-1.0)
    with pytest.raises(ValidationError):
        small_system.set_gravitational_constant(0.0)
    with pytest.raises(ValidationError):
        small_system.set_theta(3.0)
    small_system.set_softening(0.2)
    assert small_system.config.softening == 0.2


def test_state_round_trip_via_file(tmp_path, small_system):
    for _ in range(3):
        small_system.update()
    path = str(tmp_path / "sys.nbody")
    small_system.save_state(path)
    other = ParticleSystem()
    other.load_state(path)
    assert other.get_state() == small_system.get_state()
    # both continue stepping identically (same force method/params)
    small_system.update()
    other.update()
    np.testing.assert_allclose(
        other.positions(), small_system.positions(), atol=1e-5
    )


def test_energy_queries(small_system):
    ke = small_system.compute_kinetic_energy()
    pe = small_system.compute_potential_energy()
    te = small_system.compute_total_energy()
    assert np.isfinite([ke, pe, te]).all()
    assert abs(te - (ke + pe)) < 1e-3
    assert pe < 0  # gravity is attractive


def test_set_state_reroutes_params(small_system):
    snap = small_system.get_state()
    snap.G = 3.0
    snap.force_method = ForceMethod.SPATIAL_HASH
    small_system.set_state(snap)
    assert small_system.config.G == 3.0
    assert small_system.config.force_method == ForceMethod.SPATIAL_HASH
    small_system.update()


def test_plummer_init_runs():
    sys_ = ParticleSystem()
    sys_.initialize(
        SimulationConfig(
            particle_count=300, init_distribution=InitDistribution.PLUMMER
        )
    )
    sys_.update()
    assert np.isfinite(sys_.positions()).all()


def test_run_steps_matches_update(small_system):
    """Fused run_steps == repeated update (same physics, one program),
    including the sorted-stepping path when the engine has the contract,
    and the jit cache invalidates on strategy rebuild."""
    import copy

    sys2 = ParticleSystem()
    sys2.initialize(small_system.config)
    for _ in range(4):
        small_system.update()
    sys2.run_steps(4)
    np.testing.assert_allclose(
        np.asarray(sys2.state.pos),
        np.asarray(small_system.state.pos),
        rtol=2e-5, atol=2e-6,
    )
    assert abs(sys2.simulation_time - small_system.simulation_time) < 1e-9

    # paused → no-op
    sys2.pause()
    t = sys2.simulation_time
    sys2.run_steps(3)
    assert sys2.simulation_time == t
    sys2.resume()

    # live method switch rebuilds the fused program (hash engine)
    sys2.set_force_method(ForceMethod.SPATIAL_HASH)
    small_system.set_force_method(ForceMethod.SPATIAL_HASH)
    for _ in range(3):
        small_system.update()
    sys2.run_steps(3)
    np.testing.assert_allclose(
        np.asarray(sys2.state.pos),
        np.asarray(small_system.state.pos),
        rtol=2e-5, atol=2e-6,
    )

    # alternating chunk sizes (render cadence vs benchmark cadence) keep
    # BOTH compiled programs cached — no recompile ping-pong on the hot
    # public API (the method switch above cleared the cache, so {3}
    # is the current content)
    assert set(sys2._multi_cache) == {3}
    sys2.run_steps(2)
    assert set(sys2._multi_cache) == {2, 3}
