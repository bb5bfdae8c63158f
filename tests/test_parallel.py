"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(conftest sets xla_force_host_platform_device_count=8; the reference has no
counterpart — SURVEY.md §2.5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.models import init_spherical
from nbody_tpu.ops.direct import direct_forces_reference
from nbody_tpu.ops.integrator import (
    initialize_forces,
    kinetic_energy,
    make_verlet_step,
    potential_energy,
)
from nbody_tpu.parallel import (
    make_mesh,
    make_sharded_step,
    ring_direct_forces,
    shard_state,
    sharded_energy,
)
from nbody_tpu.parallel.mesh import pad_to_devices
from nbody_tpu.types import ForceMethod, SimulationConfig, SphericalDistParams


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should fake 8 CPU devices"
    return make_mesh(8)


def test_mesh_has_eight_devices(mesh):
    assert mesh.devices.size == 8


def test_mesh_validation():
    """Requesting more devices than exist raises with both counts
    (docs/specs/sharding.md: Mesh validation)."""
    from nbody_tpu.errors import ValidationError

    with pytest.raises(ValidationError, match="1000"):
        make_mesh(1000)


def test_ring_matches_direct(mesh, key):
    s = init_spherical(key, 512, SphericalDistParams(radius=5.0))
    ref = direct_forces_reference(s.pos, s.mass, 1.0, 0.1)
    sharded = shard_state(s, mesh)
    got = ring_direct_forces(sharded.pos, sharded.mass, mesh, 1.0, 0.1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_sharded_step_matches_single(mesh, key):
    """One sharded Verlet step == one single-device step."""
    s = init_spherical(key, 256, SphericalDistParams(radius=3.0))
    cfg = SimulationConfig(particle_count=256, dt=1e-3)

    def force_fn(pos, mass):
        from nbody_tpu.ops.direct import direct_forces

        return direct_forces(pos, mass, cfg.G, cfg.softening)

    single = make_verlet_step(force_fn, cfg.dt)(
        initialize_forces(s, force_fn)
    )

    sharded0 = shard_state(initialize_forces(s, force_fn), mesh)
    step = make_sharded_step(cfg, mesh)
    sharded1 = step(sharded0)
    np.testing.assert_allclose(
        np.asarray(sharded1.pos), np.asarray(single.pos), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded1.vel), np.asarray(single.vel), atol=1e-5
    )


def test_sharded_energy_matches(mesh, key):
    s = init_spherical(key, 512, SphericalDistParams(radius=4.0))
    sharded = shard_state(s, mesh)
    ke, pe = sharded_energy(sharded, mesh, 1.0, 0.1)
    np.testing.assert_allclose(
        float(ke), float(kinetic_energy(s)), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(pe), float(potential_energy(s.pos, s.mass, 1.0, 0.1)),
        rtol=1e-4,
    )


def test_sharded_hash_step_compiles(mesh, key):
    """Hash force under pjit SPMD partitioning runs on the mesh."""
    s = init_spherical(key, 512, SphericalDistParams(radius=4.0))
    cfg = SimulationConfig(
        particle_count=512,
        force_method=ForceMethod.SPATIAL_HASH,
        hash_max_grid_dim=16,
    )
    sharded = shard_state(s, mesh)
    step = make_sharded_step(cfg, mesh)
    out = step(sharded)
    assert np.isfinite(np.asarray(out.pos)).all()


def test_sharded_bh_step_compiles(mesh, key):
    s = init_spherical(key, 512, SphericalDistParams(radius=4.0))
    cfg = SimulationConfig(
        particle_count=512,
        force_method=ForceMethod.BARNES_HUT,
        bh_max_level=4,
    )
    sharded = shard_state(s, mesh)
    step = make_sharded_step(cfg, mesh)
    out = step(sharded)
    assert np.isfinite(np.asarray(out.pos)).all()


class TestDistributed:
    """Multi-host init helpers (parallel/distributed.py; SURVEY.md §5.8)."""

    def test_single_host_is_noop(self, monkeypatch):
        from nbody_tpu.parallel.distributed import initialize_distributed

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert initialize_distributed() is False

    def test_env_var_drives_initialization(self, monkeypatch):
        from nbody_tpu.parallel import distributed

        calls = {}

        def fake_init(coordinator_address, num_processes, process_id):
            calls.update(
                addr=coordinator_address, np=num_processes, pid=process_id
            )

        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        assert distributed.initialize_distributed(
            num_processes=4, process_id=2
        ) is True
        assert calls == {"addr": "10.0.0.1:1234", "np": 4, "pid": 2}

    def test_already_initialized_is_idempotent(self, monkeypatch):
        from nbody_tpu.parallel import distributed

        def fake_init(**kw):
            raise RuntimeError("Backend already initialized")

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        assert distributed.initialize_distributed(
            coordinator_address="x:1", num_processes=2, process_id=0
        ) is True

    def test_global_device_info(self):
        from nbody_tpu.parallel.distributed import global_device_info

        info = global_device_info()
        assert info["process_count"] == 1
        assert info["global_devices"] >= 8


def test_pad_to_devices(key):
    s = init_spherical(key, 250, SphericalDistParams(radius=3.0))
    padded = pad_to_devices(s, 8)
    assert padded.n == 256
    assert float(padded.mass[250:].sum()) == 0.0


def test_multi_step_energy_drift_sharded(mesh):
    """Physics fidelity survives sharding: 8-device 2-body-ish cluster,
    drift small over 200 steps."""
    from nbody_tpu.models import init_disk
    from nbody_tpu.types import DiskDistParams

    s = init_disk(jax.random.PRNGKey(3), 64, DiskDistParams(radius=3.0))
    cfg = SimulationConfig(particle_count=64, dt=1e-3)

    def force_fn(pos, mass):
        from nbody_tpu.ops.direct import direct_forces

        return direct_forces(pos, mass, 1.0, 0.1)

    s = initialize_forces(s, force_fn)
    sharded = shard_state(s, mesh)
    ke0, pe0 = sharded_energy(sharded, mesh, 1.0, 0.1)
    e0 = float(ke0 + pe0)

    from nbody_tpu.parallel.step import make_sharded_multi_step

    multi = make_sharded_multi_step(cfg, mesh, 200)
    sharded = multi(sharded)
    ke1, pe1 = sharded_energy(sharded, mesh, 1.0, 0.1)
    e1 = float(ke1 + pe1)
    assert abs((e1 - e0) / e0) < 0.01


def test_multi_step_energy_drift_sharded_bh(mesh):
    """Physics fidelity survives the DESIGNED distributed BH path
    (psum moments + slab routing + halo): multi-step drift stays small
    on the 8-device mesh through the LIBRARY fused multi-step
    (make_sharded_multi_step — VERDICT r3 item 4)."""
    s = init_spherical(
        jax.random.PRNGKey(5), 128, SphericalDistParams(radius=3.0)
    )
    cfg = SimulationConfig(
        particle_count=128,
        force_method=ForceMethod.BARNES_HUT,
        bh_max_level=3,
        dt=1e-3,
    )

    from nbody_tpu.parallel.step import (
        make_sharded_force_fn,
        make_sharded_multi_step,
    )

    sharded_force = make_sharded_force_fn(cfg, mesh)
    s = initialize_forces(s, sharded_force)
    sharded = shard_state(s, mesh)
    ke0, pe0 = sharded_energy(sharded, mesh, 1.0, 0.1)
    e0 = float(ke0 + pe0)

    multi = make_sharded_multi_step(cfg, mesh, 50)
    sharded = multi(sharded)
    ke1, pe1 = sharded_energy(sharded, mesh, 1.0, 0.1)
    e1 = float(ke1 + pe1)
    # BH approximation + f32: looser than the direct-force gate, but a
    # blown-up integration fails by orders of magnitude, not 2%.
    assert abs((e1 - e0) / e0) < 0.02


class TestDesignedDistributed:
    """Designed distributed BH/hash (parallel/tree.py): psum-combined
    pyramid + slab-routed near field + ppermute halo. Equivalence is
    allclose vs the single-device engines — not merely isfinite
    (docs/specs/sharding.md). Sizes are compile-budget-tuned: order=1 and
    small k keep the 8-device CPU build under a minute."""

    def test_sharded_bh_matches_single(self, mesh, key):
        from nbody_tpu.ops.barnes_hut import barnes_hut_forces
        from nbody_tpu.parallel.tree import sharded_barnes_hut_forces

        s = init_spherical(key, 512, SphericalDistParams(radius=4.0))
        kw = dict(
            G=1.0, softening=0.1, theta=0.5, levels=3, near_k=8,
            multipole_order=1,
        )
        got, overflow = sharded_barnes_hut_forces(
            s.pos, s.mass, mesh, return_overflow=True, **kw
        )
        want = barnes_hut_forces(s.pos, s.mass, **kw)
        assert int(overflow) == 0
        scale = float(jnp.max(jnp.abs(want)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4 * scale
        )

    def test_sharded_hash_matches_single(self, mesh, key):
        from nbody_tpu.ops.spatial_hash import spatial_hash_forces
        from nbody_tpu.parallel.tree import sharded_spatial_hash_forces

        s = init_spherical(key, 512, SphericalDistParams(radius=4.0))
        got, overflow = sharded_spatial_hash_forces(
            s.pos, s.mass, mesh, G=1.0, softening=0.1, cutoff=1.5,
            cell_size=1.5, cap=8, max_per_cell=16, return_overflow=True,
        )
        want = spatial_hash_forces(
            s.pos, s.mass, G=1.0, softening=0.1, cutoff=1.5,
            cell_size=1.5, cap=8, window=512,
        )
        assert int(overflow) == 0
        scale = float(jnp.max(jnp.abs(want)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4 * scale
        )

    def test_fallback_engine_matches_single(self, mesh, key):
        """When the grid does NOT divide the mesh, the sharded force falls
        back to replicated per-device compute inside shard_map — and must
        match the single-device engine exactly (GSPMD propagation of the
        sorted engines is WRONG, see test_gspmd_bitcast_gather_hazard)."""
        from nbody_tpu.ops.forces import make_force_fn
        from nbody_tpu.parallel.step import make_sharded_force_fn

        s = init_spherical(key, 512, SphericalDistParams(radius=10.0))
        cfg = SimulationConfig(
            particle_count=512,
            force_method=ForceMethod.SPATIAL_HASH,
            hash_max_grid_dim=12,  # 12 % 8 != 0 → fallback path
            hash_engine="tiles",
        )
        sharded = shard_state(s, mesh)
        import warnings as _warnings

        from nbody_tpu.parallel.step import ReplicatedFallbackWarning

        with pytest.warns(ReplicatedFallbackWarning):
            force_fn = make_sharded_force_fn(cfg, mesh, pos_hint=sharded.pos)
        # the fallback is NOT silent: closure self-identifies (surfaced in
        # ParticleSystem.diagnostics as force_distribution)
        assert force_fn.distribution == "replicated-fallback"
        got = force_fn(sharded.pos, sharded.mass)
        want = make_force_fn(cfg, pos_hint=s.pos)(s.pos, s.mass)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )

    def test_designed_paths_selected_without_warning(self, mesh, key):
        """Grids that divide the mesh select the designed distributed
        paths (parallel/tree.py) with NO fallback warning, and the
        closure names the strategy."""
        import warnings as _warnings

        from nbody_tpu.parallel.step import make_sharded_force_fn

        cases = [
            (SimulationConfig(particle_count=128), "ring"),
            (
                SimulationConfig(
                    particle_count=128,
                    force_method=ForceMethod.BARNES_HUT,
                    bh_max_level=3,  # d=8 divides 8 devices
                ),
                "tree-slabs",
            ),
            (
                SimulationConfig(
                    particle_count=128,
                    force_method=ForceMethod.SPATIAL_HASH,
                    hash_max_grid_dim=8,
                ),
                "hash-slabs",
            ),
        ]
        for cfg, want in cases:
            with _warnings.catch_warnings():
                _warnings.simplefilter("error")  # any warning fails
                force_fn = make_sharded_force_fn(cfg, mesh)
            assert force_fn.distribution == want

    def test_routing_overflow_counted(self, mesh, key):
        """Slab-routing capacity overflow is psum-counted, never silent
        (docs/specs/sharding.md: Routing overflow is surfaced)."""
        from nbody_tpu.parallel.tree import sharded_spatial_hash_forces

        s = init_spherical(key, 512, SphericalDistParams(radius=4.0))
        _, overflow = sharded_spatial_hash_forces(
            s.pos, s.mass, mesh, G=1.0, softening=0.1, cutoff=1.5,
            cell_size=1.5, cap=8, max_per_cell=16, capacity=4,
            return_overflow=True,
        )
        # 512 particles over 8 slabs with per-destination capacity 4·8=32
        # rows cannot hold a radius-4 sphere's central slabs.
        assert int(overflow) > 0


def test_gspmd_bitcast_gather_hazard(mesh):
    """Pin the measured GSPMD hazard the fallback design exists for:
    an int32→f32 ``bitcast_convert_type`` column gathered by a sort
    permutation comes back ZEROED when the input is sharded (jax 0.9.0,
    8-device CPU mesh) — the exact shape of build_sorted_grid's id
    column. If this test ever FAILS (i.e. GSPMD starts handling it),
    the replicated-shard_map fallback in parallel/step.py can be
    revisited."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.RandomState(0)
    ids_np = rng.randint(0, 13824, size=256).astype(np.int32)
    ids_sharded = jax.device_put(
        jnp.asarray(ids_np), NamedSharding(mesh, P("p"))
    )

    def roundtrip(ids):
        order = jnp.argsort(ids)
        f = jax.lax.bitcast_convert_type(ids, jnp.float32)[order]
        return jax.lax.bitcast_convert_type(f, jnp.int32)

    good = np.sort(ids_np)
    single = np.asarray(jax.jit(roundtrip)(jnp.asarray(ids_np)))
    np.testing.assert_array_equal(single, good)  # op itself is correct
    sharded = np.asarray(jax.jit(roundtrip)(ids_sharded))
    assert not np.array_equal(sharded, good), (
        "GSPMD now partitions bitcast+gather correctly — the replicated "
        "fallback in make_sharded_force_fn may be removable"
    )
