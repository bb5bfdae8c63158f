"""Orbax checkpointing for sharded simulation states.

The binary `.nbody` format (utils/serialization.py) is the
reference-compatible interchange path; this module is the TPU-native
*scale* path (SURVEY.md §5.4 "Orbax/jax.checkpoint-style save of the state
pytree"): asynchronous, sharding-preserving checkpoints of the
``ParticleState`` pytree that restore directly onto a device mesh without
host round-trips — the right tool for multi-chip runs too big to funnel
through one host.

Feature-gated like HDF5: degrades cleanly when orbax is unavailable.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from nbody_tpu.errors import SerializationError
from nbody_tpu.state import ParticleState

try:
    import orbax.checkpoint as ocp

    HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    ocp = None
    HAVE_ORBAX = False


def _require_orbax():
    if not HAVE_ORBAX:
        raise SerializationError(
            "Orbax support unavailable: orbax-checkpoint is not installed"
        )


def save_checkpoint(directory: str, state: ParticleState, step: int = 0) -> None:
    """Write an async-capable pytree checkpoint under ``directory/step``."""
    _require_orbax()
    path = os.path.abspath(directory)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(_to_tree(state)))
        mgr.wait_until_finished()


def restore_checkpoint(
    directory: str,
    step: Optional[int] = None,
    template: Optional[ParticleState] = None,
) -> ParticleState:
    """Restore a checkpoint; with ``template`` the restored arrays adopt its
    shardings (mesh-aware restore for multi-chip resumes)."""
    _require_orbax()
    path = os.path.abspath(directory)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise SerializationError(f"No checkpoints found in {directory}")
        if template is not None:
            target = ocp.args.StandardRestore(_to_tree(template))
            tree = mgr.restore(step, args=target)
        else:
            tree = mgr.restore(step)
    return _from_tree(tree)


def _to_tree(state: ParticleState) -> dict:
    return {
        "pos": state.pos,
        "vel": state.vel,
        "acc": state.acc,
        "mass": state.mass,
        "time": state.time,
    }


def _from_tree(tree: dict) -> ParticleState:
    import jax.numpy as jnp

    return ParticleState(
        pos=jnp.asarray(tree["pos"]),
        vel=jnp.asarray(tree["vel"]),
        acc=jnp.asarray(tree["acc"]),
        mass=jnp.asarray(tree["mass"]),
        time=jnp.asarray(tree["time"]),
    )
