"""Validation tests (reference: tests/test_validation.cpp).

Every validator accepts valid input and raises ValidationError on invalid,
including NaN/Inf fuzzing.
"""

import math

import pytest

from nbody_tpu import (
    ForceMethod,
    SimulationConfig,
    ValidationError,
    validate_config,
    validate_particle_count,
    validate_softening,
    validate_theta,
    validate_time_step,
)


class TestParticleCount:
    def test_valid(self):
        for n in (1, 100, 10_000, 100_000_000):
            validate_particle_count(n)

    def test_zero_rejected(self):
        with pytest.raises(ValidationError):
            validate_particle_count(0)

    def test_negative_rejected(self):
        with pytest.raises(ValidationError):
            validate_particle_count(-5)

    def test_over_cap_rejected(self):
        with pytest.raises(ValidationError):
            validate_particle_count(100_000_001)


class TestTimeStep:
    def test_valid(self):
        for dt in (1e-6, 1e-3, 0.5, 1.0):
            validate_time_step(dt)

    @pytest.mark.parametrize("dt", [0.0, -1e-3, 1.0001, math.nan, math.inf, -math.inf])
    def test_invalid(self, dt):
        with pytest.raises(ValidationError):
            validate_time_step(dt)


class TestSoftening:
    def test_valid(self):
        for eps in (0.0, 0.1, 100.0):
            validate_softening(eps)

    @pytest.mark.parametrize("eps", [-0.1, math.nan, math.inf])
    def test_invalid(self, eps):
        with pytest.raises(ValidationError):
            validate_softening(eps)


class TestTheta:
    def test_valid(self):
        for theta in (0.0, 0.5, 2.0):
            validate_theta(theta)

    @pytest.mark.parametrize("theta", [-0.1, 2.1, math.nan, math.inf])
    def test_invalid(self, theta):
        with pytest.raises(ValidationError):
            validate_theta(theta)


class TestConfig:
    def test_default_valid(self):
        validate_config(SimulationConfig())

    def test_bad_G(self):
        with pytest.raises(ValidationError):
            validate_config(SimulationConfig(G=0.0))
        with pytest.raises(ValidationError):
            validate_config(SimulationConfig(G=math.nan))

    def test_bad_cell_size_only_checked_for_hash(self):
        # Mirrors reference: cell size validated only for SPATIAL_HASH
        # (src/utils/error_handling.cpp:59-70).
        validate_config(
            SimulationConfig(
                force_method=ForceMethod.DIRECT_N2, spatial_hash_cell_size=-1.0
            )
        )
        with pytest.raises(ValidationError):
            validate_config(
                SimulationConfig(
                    force_method=ForceMethod.SPATIAL_HASH,
                    spatial_hash_cell_size=-1.0,
                )
            )

    def test_bad_block_size(self):
        with pytest.raises(ValidationError):
            validate_config(SimulationConfig(block_size=0))
        with pytest.raises(ValidationError):
            validate_config(SimulationConfig(block_size=2048))

    def test_method_parse(self):
        assert ForceMethod.parse("direct-n2") == ForceMethod.DIRECT_N2
        assert ForceMethod.parse("barnes-hut") == ForceMethod.BARNES_HUT
        assert ForceMethod.parse("spatial-hash") == ForceMethod.SPATIAL_HASH
        with pytest.raises(ValidationError):
            ForceMethod.parse("magic")


def test_memory_precheck(monkeypatch):
    """80%-HBM pre-check (docs/specs/quality-attributes.md): a config whose
    state exceeds 80% of device memory is rejected with the estimated vs
    available byte counts; within-budget configs pass."""
    import jax

    from nbody_tpu.errors import (
        ResourceError,
        STATE_BYTES_PER_PARTICLE,
        validate_resource_requirements,
    )

    class FakeDev:
        def __init__(self, limit):
            self._limit = limit

        def memory_stats(self):
            return {"bytes_limit": self._limit}

    # 1M particles need 40 B × 2 = 80 MB; give the device only 50 MB.
    monkeypatch.setattr(
        jax, "local_devices", lambda: [FakeDev(50 * 1024 * 1024)]
    )
    with pytest.raises(ResourceError) as ei:
        validate_resource_requirements(1_000_000)
    assert str(1_000_000 * STATE_BYTES_PER_PARTICLE * 2) in str(ei.value)

    # plenty of memory -> passes
    monkeypatch.setattr(
        jax, "local_devices", lambda: [FakeDev(8 * 1024**3)]
    )
    validate_resource_requirements(1_000_000)

    # backends without memory stats (CPU) silently pass
    class NoStats:
        def memory_stats(self):
            return None

    monkeypatch.setattr(jax, "local_devices", lambda: [NoStats()])
    validate_resource_requirements(100_000_000)
