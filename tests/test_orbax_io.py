"""Orbax pytree checkpoint tests (TPU-native scale path, SURVEY.md §5.4)."""

import jax
import numpy as np
import pytest

from nbody_tpu.models import init_spherical
from nbody_tpu.utils.orbax_io import (
    HAVE_ORBAX,
    restore_checkpoint,
    save_checkpoint,
)

pytestmark = pytest.mark.skipif(not HAVE_ORBAX, reason="orbax unavailable")


def test_round_trip(tmp_path, key):
    state = init_spherical(key, 256)
    save_checkpoint(str(tmp_path / "ckpt"), state, step=3)
    restored = restore_checkpoint(str(tmp_path / "ckpt"))
    np.testing.assert_allclose(np.asarray(restored.pos), np.asarray(state.pos))
    np.testing.assert_allclose(np.asarray(restored.vel), np.asarray(state.vel))
    np.testing.assert_allclose(np.asarray(restored.mass), np.asarray(state.mass))


def test_restore_specific_step(tmp_path, key):
    k1, k2 = jax.random.split(key)
    s1 = init_spherical(k1, 64)
    s2 = init_spherical(k2, 64)
    save_checkpoint(str(tmp_path / "c"), s1, step=1)
    save_checkpoint(str(tmp_path / "c"), s2, step=2)
    r1 = restore_checkpoint(str(tmp_path / "c"), step=1)
    r2 = restore_checkpoint(str(tmp_path / "c"), step=2)
    np.testing.assert_allclose(np.asarray(r1.pos), np.asarray(s1.pos))
    np.testing.assert_allclose(np.asarray(r2.pos), np.asarray(s2.pos))


def test_missing_checkpoint_raises(tmp_path):
    from nbody_tpu.errors import SerializationError

    with pytest.raises(SerializationError):
        restore_checkpoint(str(tmp_path / "nope"))
