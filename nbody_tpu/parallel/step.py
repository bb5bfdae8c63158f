"""Sharded simulation step + energy.

Builds the full Velocity Verlet step for a particle-sharded state:
kinematic updates are local (elementwise over the sharded axis), forces
come from the ppermute ring (direct), the designed tree/hash paths
(parallel/tree.py: psum-combined pyramid + slab-routed near field) when
the grid divides the mesh, or replicated per-device programs inside
shard_map as the fallback (NOT pjit propagation — see the GSPMD
bitcast+gather hazard note in make_sharded_force_fn), and energies
reduce with psum.
"""

from __future__ import annotations

import warnings
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nbody_tpu.parallel.mesh import PARTICLE_AXIS
from nbody_tpu.parallel.ring import ring_direct_forces
from nbody_tpu.state import ParticleState
from nbody_tpu.types import ForceMethod, SimulationConfig


class ReplicatedFallbackWarning(RuntimeWarning):
    """The sharded force fell back to REPLICATED per-device compute.

    Results stay exact, but every device runs the full single-device
    program — O(N·devices) redundant work, no scaling. Raised so a user
    who configured a mesh learns that the designed distributed path
    (parallel/tree.py) was not selected; fix by choosing a grid that
    divides the mesh (BH: 2^bh_max_level % n_devices == 0; hash:
    hash_max_grid_dim % n_devices == 0)."""


def _tag(force_fn, distribution: str):
    """Annotate the closure with the selected distribution strategy so
    callers (ParticleSystem.diagnostics) can surface it."""
    force_fn.distribution = distribution
    return force_fn


def make_sharded_force_fn(
    config: SimulationConfig, mesh: Mesh, pos_hint=None
) -> Callable:
    """Every branch returns a JITTED closure: a shard_map called outside
    jit falls back to eager per-op dispatch across the mesh (minutes for
    one 8-device CPU force call — measured r3); jit-of-jit is inlined,
    so callers already under jit pay nothing. The returned closure
    carries a ``distribution`` attribute naming the selected strategy
    (``"ring"`` / ``"tree-slabs"`` / ``"hash-slabs"`` /
    ``"replicated-fallback"``); selecting the fallback for a tree/hash
    method emits ``ReplicatedFallbackWarning``."""
    if config.force_method == ForceMethod.DIRECT_N2:

        def force_fn(pos, mass):
            return ring_direct_forces(
                pos, mass, mesh, config.G, config.softening
            )

        return _tag(jax.jit(force_fn), "ring")

    # Hash / BH: the DESIGNED distributed paths (parallel/tree.py —
    # psum-combined pyramid, slab routing, ppermute halo) whenever the
    # grid splits evenly over the mesh; otherwise the single-program
    # path under pjit (XLA's SPMD partitioner inserts the collectives
    # the global sort/scatter imply).
    n_dev = mesh.devices.size
    if config.force_method == ForceMethod.BARNES_HUT:
        d = 1 << config.bh_max_level
        if d % n_dev == 0:
            import math

            from nbody_tpu.parallel.tree import sharded_barnes_hut_forces

            occ = config.particle_count / float(d**3)
            raw = occ + 5.0 * math.sqrt(occ + 1.0)
            near_k = int(min(64, max(8, -(-raw // 8) * 8)))

            def force_fn(pos, mass):
                return sharded_barnes_hut_forces(
                    pos,
                    mass,
                    mesh,
                    config.G,
                    config.softening,
                    config.barnes_hut_theta,
                    levels=config.bh_max_level,
                    near_k=near_k,
                )

            return _tag(jax.jit(force_fn), "tree-slabs")
    elif config.force_method == ForceMethod.SPATIAL_HASH:
        if config.hash_max_grid_dim % n_dev == 0:
            from nbody_tpu.parallel.tree import sharded_spatial_hash_forces

            def force_fn(pos, mass):
                return sharded_spatial_hash_forces(
                    pos,
                    mass,
                    mesh,
                    config.G,
                    config.softening,
                    cutoff=config.spatial_hash_cutoff,
                    cell_size=config.spatial_hash_cell_size,
                    cap=config.hash_max_grid_dim,
                    max_per_cell=config.hash_max_per_cell,
                )

            return _tag(jax.jit(force_fn), "hash-slabs")

    warnings.warn(
        f"sharded {config.force_method.cli_name}: grid does not divide the "
        f"{mesh.devices.size}-device mesh "
        f"(BH d={1 << config.bh_max_level} / hash cap="
        f"{config.hash_max_grid_dim}) — falling back to REPLICATED "
        "per-device compute (exact, but O(N*devices) redundant work, no "
        "scaling). Pick a grid that divides the mesh to get the designed "
        "distributed path.",
        ReplicatedFallbackWarning,
        stacklevel=2,
    )

    from nbody_tpu.ops.forces import make_force_fn

    # pos_hint feeds the same data-dependent engine auto-selection the
    # single-device factory uses (hash window-vs-tiles + grid sizing) —
    # without it the fallback would resolve DIFFERENT engine params than
    # an equivalent single-device run. Pulled to host first: the hint is
    # consumed outside jit by numpy (hash_engine_params).
    if pos_hint is not None:
        import numpy as np

        pos_hint = np.asarray(jax.device_get(pos_hint))
    inner = make_force_fn(config, pos_hint=pos_hint)

    # Fallback: replicated per-device compute inside shard_map — NOT
    # pjit propagation. The sorted engines ride cell ids through an
    # int32→f32 bitcast column in the sort payload
    # (sorted_window.build_sorted_grid), and GSPMD mis-partitions
    # bitcast+permutation-gather: the column comes back ZEROED on
    # sharded inputs (jax 0.9.0, minimal repro in
    # tests/test_parallel.py::test_gspmd_bitcast_gather_hazard) — every
    # rank collapses and the force is silently wrong. Inside shard_map
    # each device runs the FULL single-device program locally (manual
    # SPMD, no partitioner), so results are exact at the cost of
    # redundant compute — acceptable for the fallback (the designed
    # slab/psum paths above cover every grid that divides the mesh).
    rep = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def force_fn(pos, mass):
        acc = rep(pos, mass)
        return jax.lax.with_sharding_constraint(
            acc, jax.sharding.NamedSharding(mesh, P(PARTICLE_AXIS))
        )

    return _tag(jax.jit(force_fn), "replicated-fallback")


def make_sharded_step(config: SimulationConfig, mesh: Mesh, pos_hint=None):
    """Jitted full Verlet step for a sharded ParticleState."""
    from nbody_tpu.ops.integrator import make_verlet_step

    force_fn = make_sharded_force_fn(config, mesh, pos_hint=pos_hint)
    step = make_verlet_step(force_fn, config.dt)
    return jax.jit(step)


def make_sharded_multi_step(
    config: SimulationConfig, mesh: Mesh, n_steps: int, pos_hint=None
):
    """``n_steps`` sharded Verlet steps fused into ONE jitted SPMD program.

    The multi-chip counterpart of ``ops.integrator.make_multi_step``: the
    whole step loop is a single ``lax.scan`` inside one XLA program over
    the mesh, so a benchmark/headless run costs one dispatch per chunk
    instead of one per step (through the TPU tunnel a dispatch is ~250 ms
    — a per-step sharded loop would be dispatch-bound, the exact failure
    mode CLAUDE.md documents). All collectives (ppermute ring / psum
    pyramid / all_to_all slab routing, parallel/tree.py) stay inside the
    scanned body. Seam analogue in the reference: the benchmark loop
    around ``ParticleSystem::update`` (src/main.cpp:361-377), which the
    single-GPU reference never needed to fuse.
    """
    from nbody_tpu.ops.integrator import make_multi_step

    force_fn = make_sharded_force_fn(config, mesh, pos_hint=pos_hint)
    return jax.jit(make_multi_step(force_fn, config.dt, n_steps))


def sharded_energy(
    state: ParticleState,
    mesh: Mesh,
    G: float = 1.0,
    softening: float = 0.1,
):
    """(KE, PE) with ring PE accumulation and psum reductions."""
    axis = PARTICLE_AXIS
    n_dev = mesh.devices.size
    eps2 = softening * softening

    def local(pos_l, vel_l, mass_l):
        ke_l = 0.5 * jnp.sum(mass_l * jnp.sum(vel_l * vel_l, axis=-1))

        def body(step, carry):
            pe, pj, mj = carry
            d = pj[None, :, :] - pos_l[:, None, :]
            r2_raw = jnp.sum(d * d, axis=-1)
            inv = jax.lax.rsqrt(r2_raw + eps2)
            e = mass_l[:, None] * mj[None, :] * inv
            e = jnp.where(r2_raw == 0.0, 0.0, e)
            pe = pe + jnp.sum(e)
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            return (
                pe,
                jax.lax.ppermute(pj, axis, perm),
                jax.lax.ppermute(mj, axis, perm),
            )

        pe0 = jax.lax.pcast(
            jnp.zeros((), pos_l.dtype), PARTICLE_AXIS, to="varying"
        )
        pe_l, _, _ = jax.lax.fori_loop(0, n_dev, body, (pe0, pos_l, mass_l))
        ke = jax.lax.psum(ke_l, axis)
        pe = jax.lax.psum(-0.5 * G * pe_l, axis)
        return ke, pe

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
        )
    )(state.pos, state.vel, state.mass)
