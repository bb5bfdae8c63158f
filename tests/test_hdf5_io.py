"""HDF5 interchange tests (reference: tests/test_hdf5_io.cpp:14-139).

Round-trip, validate rejects non-HDF5, 10k-particle export, graceful
behavior when h5py is unavailable.
"""

import numpy as np
import pytest

from nbody_tpu.state import SimulationState
from nbody_tpu.types import ForceMethod
from nbody_tpu.utils.hdf5_io import HAVE_HDF5, HDF5IO

pytestmark = pytest.mark.skipif(not HAVE_HDF5, reason="h5py unavailable")


def make_state(n, rng):
    return SimulationState(
        pos=rng.standard_normal((n, 3)).astype(np.float32),
        vel=rng.standard_normal((n, 3)).astype(np.float32),
        mass=rng.uniform(0.5, 2.0, n).astype(np.float32),
        simulation_time=3.5,
        dt=1e-3,
        G=2.0,
        softening=0.2,
        force_method=ForceMethod.BARNES_HUT,
    )


def test_round_trip(tmp_path, rng):
    state = make_state(256, rng)
    path = str(tmp_path / "out.h5")
    HDF5IO.export_to_file(path, state)
    assert HDF5IO.validate_file(path)
    assert HDF5IO.import_from_file(path) == state


def test_schema_matches_reference(tmp_path, rng):
    """Dataset paths/attrs pinned to the reference schema
    (reference: hdf5_io.hpp:19-30)."""
    import h5py

    state = make_state(8, rng)
    path = str(tmp_path / "schema.h5")
    HDF5IO.export_to_file(path, state)
    with h5py.File(path, "r") as f:
        assert f["particles/position"].shape == (8, 3)
        assert f["particles/velocity"].shape == (8, 3)
        assert f["particles/mass"].shape == (8,)
        meta = f["metadata"].attrs
        assert abs(float(meta["time"]) - 3.5) < 1e-6
        assert int(meta["force_method"]) == int(ForceMethod.BARNES_HUT)
        assert int(meta["particle_count"]) == 8


def test_validate_rejects_non_hdf5(tmp_path):
    path = str(tmp_path / "junk.h5")
    with open(path, "wb") as f:
        f.write(b"not an hdf5 file")
    assert not HDF5IO.validate_file(path)
    from nbody_tpu.errors import SerializationError

    with pytest.raises(SerializationError):
        HDF5IO.import_from_file(path)


def test_large_export(tmp_path, rng):
    """reference: test_hdf5_io.cpp 10k-particle export."""
    state = make_state(10_000, rng)
    path = str(tmp_path / "big.h5")
    HDF5IO.export_to_file(path, state)
    loaded = HDF5IO.import_from_file(path)
    assert loaded.particle_count == 10_000
    assert loaded == state
