"""Checkpoint round-trip tests (reference: tests/test_serialization.cpp).

Round-trip equality via SimulationState.__eq__, magic rejection,
truncation rejection, particle-count cap, N sweep including 0 and 1,
byte-level header layout pinned to the reference format.
"""

import io
import struct

import numpy as np
import pytest

from nbody_tpu.errors import SerializationError, ValidationError
from nbody_tpu.state import SimulationState
from nbody_tpu.types import ForceMethod
from nbody_tpu.utils.serialization import (
    HEADER_SIZE,
    NBODY_MAGIC,
    NBODY_VERSION,
    Serializer,
    load_bytes,
    save_bytes,
)


def make_state(n, rng, method=ForceMethod.DIRECT_N2):
    return SimulationState(
        pos=rng.standard_normal((n, 3)).astype(np.float32),
        vel=rng.standard_normal((n, 3)).astype(np.float32),
        mass=rng.uniform(0.5, 2.0, n).astype(np.float32),
        simulation_time=1.25,
        dt=2e-3,
        G=1.5,
        softening=0.05,
        force_method=method,
    )


@pytest.mark.parametrize("n", [0, 1, 10, 100, 1000, 10000])
def test_round_trip(n, rng):
    """reference: test_serialization.cpp:30-283 (parametrized N sweep)."""
    state = make_state(n, rng)
    assert load_bytes(save_bytes(state)) == state


@pytest.mark.parametrize(
    "method", [ForceMethod.DIRECT_N2, ForceMethod.BARNES_HUT, ForceMethod.SPATIAL_HASH]
)
def test_method_preserved(method, rng):
    state = make_state(5, rng, method)
    assert load_bytes(save_bytes(state)).force_method == method


def test_file_round_trip(tmp_path, rng):
    state = make_state(128, rng)
    path = str(tmp_path / "ckpt.nbody")
    Serializer.save(path, state)
    assert Serializer.validate_file(path)
    assert Serializer.load(path) == state


def test_header_layout_matches_reference(rng):
    """Byte-level pin: 56-byte header, little-endian, magic 'NBOD'
    (reference: serialization.hpp:36-65 FileHeader struct layout)."""
    state = make_state(3, rng)
    raw = save_bytes(state)
    assert len(raw) == HEADER_SIZE + 7 * 3 * 4
    magic, version = struct.unpack_from("<II", raw, 0)
    assert magic == NBODY_MAGIC == 0x4E424F44
    assert version == NBODY_VERSION == 1
    (count,) = struct.unpack_from("<Q", raw, 8)
    assert count == 3
    t, dt, G, eps = struct.unpack_from("<ffff", raw, 16)
    assert abs(t - 1.25) < 1e-6 and abs(G - 1.5) < 1e-6
    (method,) = struct.unpack_from("<I", raw, 32)
    assert method == 0
    # payload order: pos_x first — check first float equals pos[0,0]
    (first,) = struct.unpack_from("<f", raw, HEADER_SIZE)
    assert abs(first - float(state.pos[0, 0])) < 1e-7


def test_wrong_magic_rejected(rng):
    raw = bytearray(save_bytes(make_state(4, rng)))
    raw[0] ^= 0xFF
    with pytest.raises(SerializationError, match="magic"):
        load_bytes(bytes(raw))


def test_wrong_version_rejected(rng):
    raw = bytearray(save_bytes(make_state(4, rng)))
    struct.pack_into("<I", raw, 4, 99)
    with pytest.raises(SerializationError, match="version"):
        load_bytes(bytes(raw))


def test_truncated_rejected(rng):
    raw = save_bytes(make_state(100, rng))
    with pytest.raises(SerializationError, match="truncated"):
        load_bytes(raw[: len(raw) // 2])
    with pytest.raises(SerializationError, match="truncated"):
        load_bytes(raw[: HEADER_SIZE - 10])


def test_count_cap_rejected():
    header = struct.pack(
        "<IIQffffI4I4x", NBODY_MAGIC, NBODY_VERSION, 200_000_000,
        0.0, 1e-3, 1.0, 0.1, 0, 0, 0, 0, 0,
    )
    with pytest.raises(ValidationError, match="exceeds maximum"):
        load_bytes(header)


def test_validate_stream():
    assert not Serializer.validate_stream(io.BytesIO(b"junk"))


def test_tolerant_equality(rng):
    a = make_state(10, rng)
    b = make_state(10, rng)
    b.pos = a.pos + 5e-7  # inside 1e-6 tolerance
    b.vel = a.vel.copy()
    b.mass = a.mass.copy()
    assert a == b
    b.pos = a.pos + 1e-4
    assert a != b
