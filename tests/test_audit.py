"""Short-range audit API tests (reference: verifyCellAssignment /
verifyMassConservation host audits)."""

from nbody_tpu import ForceMethod, ParticleSystem, SimulationConfig


def test_hash_audit_clean():
    s = ParticleSystem()
    s.initialize(
        SimulationConfig(
            particle_count=2000, force_method=ForceMethod.SPATIAL_HASH
        )
    )
    audit = s.audit_short_range()
    assert audit["method"] == "spatial-hash"
    assert audit["overflow"] == 0
    # hash_engine=auto resolves from the concrete density: the default
    # 2000-particle spherical scene is sparse (~1/cell) → tiles engine
    assert audit["engine"] == "tiles"
    assert audit["tile_k"] == 8


def test_hash_audit_window_engine():
    s = ParticleSystem()
    s.initialize(
        SimulationConfig(
            particle_count=2000,
            force_method=ForceMethod.SPATIAL_HASH,
            hash_engine="window",
        )
    )
    audit = s.audit_short_range()
    assert audit["engine"] == "window"
    assert audit["overflow"] == 0
    assert audit["window"] >= 512


def test_bh_audit_clean():
    s = ParticleSystem()
    s.initialize(
        SimulationConfig(
            particle_count=2000,
            force_method=ForceMethod.BARNES_HUT,
            bh_max_level=4,
        )
    )
    audit = s.audit_short_range()
    assert audit["method"] == "barnes-hut"
    assert audit["overflow"] == 0


def test_direct_audit_trivial():
    s = ParticleSystem()
    s.initialize(SimulationConfig(particle_count=500))
    assert s.audit_short_range()["overflow"] == 0


def test_bh_audit_uses_production_engine_params():
    """The audit must measure the configuration production actually runs:
    its reported engine/k come from the SAME bh_engine_params helper the
    force factory uses — for both sides of the occupancy split."""
    from nbody_tpu.ops.barnes_hut import bh_engine_params

    # tiles regime: low occupancy
    cfg = SimulationConfig(
        particle_count=2000,
        force_method=ForceMethod.BARNES_HUT,
        bh_max_level=4,
    )
    p = bh_engine_params(cfg)
    assert p["near_engine"] == "tiles"
    s = ParticleSystem()
    s.initialize(cfg)
    audit = s.audit_short_range()
    assert audit["near_engine"] == "tiles"
    assert audit["near_k"] == p["near_k"]

    # window regime: occupancy > 24 selects the sorted-window engine
    cfg_w = SimulationConfig(
        particle_count=20000,
        force_method=ForceMethod.BARNES_HUT,
        bh_max_level=2,
    )
    pw = bh_engine_params(cfg_w)
    assert pw["near_engine"] == "window"
    sw = ParticleSystem()
    sw.initialize(cfg_w)
    audit_w = sw.audit_short_range()
    assert audit_w["near_engine"] == "window"
    assert audit_w["window"] == pw["window"]
