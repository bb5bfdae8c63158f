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
