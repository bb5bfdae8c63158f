"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The whole suite runs without a TPU (mirror of the reference's headless-first
CI philosophy, reference: .github/workflows/ci.yml); multi-chip sharding
tests run against 8 virtual CPU devices.
"""

import os

# Forced (not setdefault): the surrounding environment may point JAX at a
# TPU tunnel; the test suite is deliberately hermetic on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site-installed TPU plugin may have overridden jax_platforms at
# interpreter startup (forcing a multi-minute tunnel handshake on first op);
# the config update wins over both the env var and that override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # allow f64 golden references

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)
