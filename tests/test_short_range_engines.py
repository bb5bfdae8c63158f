"""Cross-engine equivalence: the two gather-free short-range engines
(sorted-window sweep and dense cell tiles) must agree with each other and
with brute force, including overflow accounting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.models import init_spherical, init_disk
from nbody_tpu.ops.sorted_window import (
    build_sorted_grid,
    window_sweep,
    xy_ball,
)
from nbody_tpu.ops.tile_sweep import tile_near_field
from nbody_tpu.types import DiskDistParams, SphericalDistParams


def brute_near(pos, mass, coords, ws, eps):
    """All pairs whose cells are within Chebyshev distance ws."""
    pos = np.asarray(pos, np.float64)
    mass = np.asarray(mass, np.float64)
    coords = np.asarray(coords)
    cheb = np.abs(coords[None, :, :] - coords[:, None, :]).max(-1)
    d = pos[None, :, :] - pos[:, None, :]
    r2 = (d * d).sum(-1)
    keep = (cheb <= ws) & (r2 > 0)
    w = np.where(keep, mass[None, :] * (r2 + eps * eps) ** -1.5, 0.0)
    return np.einsum("ij,ijd->id", w, d)


def setup(key, n, d, radius=4.0):
    s = init_spherical(key, n, SphericalDistParams(radius=radius))
    lo = jnp.min(s.pos, axis=0)
    hi = jnp.max(s.pos, axis=0)
    cube = jnp.maximum(jnp.max(hi - lo), 1e-6) * 1.00001
    cell = cube / d
    coords = jnp.clip(((s.pos - lo) / cell).astype(jnp.int32), 0, d - 1)
    return s, lo, cell, coords


@pytest.mark.parametrize("ws", [1, 2])
def test_window_engine_matches_brute(key, ws):
    d = 8
    s, lo, cell, coords = setup(key, 300, d)
    grid = build_sorted_grid(s.pos, s.mass, coords, d)

    def pw(r2_raw, mj):
        inv = jax.lax.rsqrt(r2_raw + 0.01)
        return mj * inv * inv * inv

    acc, over = window_sweep(
        grid, d=d, xy_offsets=xy_ball(ws), z_halfwidth=ws,
        pair_weight=pw, window=512, block_size=64,
    )
    assert int(over) == 0
    ref = brute_near(s.pos, s.mass, coords, ws, 0.1)
    np.testing.assert_allclose(np.asarray(acc), ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("ws", [1, 2])
def test_tile_engine_matches_brute(key, ws):
    d = 8
    s, lo, cell, coords = setup(key, 300, d)
    acc, over = tile_near_field(
        s.pos, s.mass, coords, lo, cell,
        d=d, ws=ws, k=32, G=1.0, eps=0.1,
    )
    assert int(over) == 0
    ref = brute_near(s.pos, s.mass, coords, ws, 0.1)
    np.testing.assert_allclose(np.asarray(acc), ref, rtol=1e-3, atol=1e-4)


def test_engines_match_each_other(key):
    d = 16
    s, lo, cell, coords = setup(key, 1000, d)
    grid = build_sorted_grid(s.pos, s.mass, coords, d)

    def pw(r2_raw, mj):
        inv = jax.lax.rsqrt(r2_raw + 0.01)
        return mj * inv * inv * inv

    acc_w, over_w = window_sweep(
        grid, d=d, xy_offsets=xy_ball(1), z_halfwidth=1,
        pair_weight=pw, window=1024, block_size=128,
    )
    acc_t, over_t = tile_near_field(
        s.pos, s.mass, coords, lo, cell, d=d, ws=1, k=32, G=1.0, eps=0.1,
    )
    assert int(over_w) == 0 and int(over_t) == 0
    np.testing.assert_allclose(
        np.asarray(acc_w), np.asarray(acc_t), rtol=1e-4, atol=1e-5
    )


def test_tile_overflow_counted(key):
    """Cells over the slot cap report overflow, never fail silently."""
    pos = jnp.zeros((50, 3), jnp.float32) + jnp.linspace(
        0, 0.001, 50
    )[:, None]
    mass = jnp.ones((50,), jnp.float32)
    coords = jnp.zeros((50, 3), jnp.int32)
    acc, over = tile_near_field(
        pos, mass, coords,
        jnp.zeros(3), jnp.float32(1.0),
        d=4, ws=1, k=8, G=1.0, eps=0.1,
    )
    assert int(over) == 50 - 8
    assert np.isfinite(np.asarray(acc)).all()


def test_window_overflow_counted(key):
    """Too-small window reports misses."""
    d = 8
    s, lo, cell, coords = setup(key, 2000, d, radius=1.0)
    grid = build_sorted_grid(s.pos, s.mass, coords, d)

    def pw(r2_raw, mj):
        return mj * 0.0 + 1.0

    _, over = window_sweep(
        grid, d=d, xy_offsets=xy_ball(1), z_halfwidth=1,
        pair_weight=pw, window=64, block_size=64,
    )
    assert int(over) > 0


# ---------------------------------------------------------------------------
# Spatial-hash tiles engine (sparse-regime): cutoff predicate + selection
# ---------------------------------------------------------------------------


def brute_cutoff(pos, mass, G, eps, cutoff):
    """All-pairs with the hash predicate: RAW r² ≤ cutoff², then soften
    (reference force_spatial_hash.cu:120-139)."""
    pos = np.asarray(pos, np.float64)
    mass = np.asarray(mass, np.float64)
    d = pos[None, :, :] - pos[:, None, :]
    r2 = (d * d).sum(-1)
    keep = (r2 <= cutoff * cutoff) & (r2 > 0)
    w = np.where(keep, mass[None, :] * (r2 + eps * eps) ** -1.5, 0.0)
    return G * np.einsum("ij,ijd->id", w, d)


def _uniform_cube(key, n, side):
    from nbody_tpu.models import init_uniform
    from nbody_tpu.types import UniformDistParams

    h = side / 2.0
    return init_uniform(
        key, n,
        UniformDistParams(min_bounds=(-h, -h, -h), max_bounds=(h, h, h)),
    )


def test_hash_tiles_matches_brute_cutoff(key):
    """Tiles engine == brute force when cell_size ≥ cutoff (the exactness
    regime both hash engines share)."""
    from nbody_tpu.ops.spatial_hash import spatial_hash_forces_tiles

    s = _uniform_cube(key, 400, side=12.0)
    acc, over = spatial_hash_forces_tiles(
        s.pos, s.mass, 1.0, 0.1, cutoff=1.5, cell_size=1.5, d=16, k=16,
        return_overflow=True,
    )
    assert int(over) == 0
    ref = brute_cutoff(s.pos, s.mass, 1.0, 0.1, 1.5)
    np.testing.assert_allclose(np.asarray(acc), ref, rtol=1e-3, atol=1e-4)


def test_hash_engines_match_each_other(key):
    """Window and tiles engines agree on the same scene/physics."""
    from nbody_tpu.ops.spatial_hash import (
        spatial_hash_forces,
        spatial_hash_forces_tiles,
    )

    s = _uniform_cube(key, 1500, side=14.0)
    kw = dict(cutoff=1.5, cell_size=1.5)
    acc_w, over_w = spatial_hash_forces(
        s.pos, s.mass, 1.0, 0.1, cap=16, window=1024, block_size=128,
        return_overflow=True, **kw,
    )
    acc_t, over_t = spatial_hash_forces_tiles(
        s.pos, s.mass, 1.0, 0.1, d=16, k=16, return_overflow=True, **kw,
    )
    assert int(over_w) == 0 and int(over_t) == 0
    np.testing.assert_allclose(
        np.asarray(acc_w), np.asarray(acc_t), rtol=1e-4, atol=1e-5
    )


def test_hash_tiles_momentum_conservation(key):
    from nbody_tpu.ops.spatial_hash import spatial_hash_forces_tiles

    s = _uniform_cube(key, 800, side=10.0)
    acc = spatial_hash_forces_tiles(
        s.pos, s.mass, 1.0, 0.1, cutoff=2.0, cell_size=2.0, d=8, k=32,
    )
    total = np.asarray((acc * s.mass[:, None]).sum(axis=0))
    np.testing.assert_allclose(total, 0.0, atol=1e-3)


def test_hash_engine_params_auto_resolution(key):
    """auto → tiles on a sparse scene, window on a dense one, and the
    density-safe window fallback without a position probe."""
    from nbody_tpu.ops.spatial_hash import hash_engine_params
    from nbody_tpu.types import SimulationConfig

    cfg = SimulationConfig(particle_count=2000, hash_engine="auto")
    # no probe → window
    assert hash_engine_params(cfg)["engine"] == "window"
    # sparse: ~0.25 particles per unit³ cell
    sparse = _uniform_cube(key, 2000, side=20.0)
    p = hash_engine_params(cfg, sparse.pos)
    assert p["engine"] == "tiles"
    assert p["tile_d"] >= 21  # grid covers the box
    assert p["occupancy"] <= 4.0
    # dense: 2000 particles in ~8 cells
    dense = _uniform_cube(key, 2000, side=2.0)
    assert hash_engine_params(cfg, dense.pos)["engine"] == "window"
    # explicit override wins over the probe
    cfg_w = cfg.replace(hash_engine="window")
    assert hash_engine_params(cfg_w, sparse.pos)["engine"] == "window"
    cfg_t = cfg.replace(hash_engine="tiles")
    assert hash_engine_params(cfg_t)["engine"] == "tiles"


def test_facade_auto_engine_and_audit(key):
    """The facade resolves auto from its initial state; the audit reports
    the engine the live force closure actually runs."""
    import nbody_tpu as nb
    from nbody_tpu.types import (
        ForceMethod,
        InitDistribution,
        UniformDistParams,
    )

    cfg = nb.SimulationConfig(
        particle_count=1500,
        force_method=ForceMethod.SPATIAL_HASH,
        init_distribution=InitDistribution.UNIFORM,
        dist_params=UniformDistParams(
            min_bounds=(-8.0, -8.0, -8.0), max_bounds=(8.0, 8.0, 8.0)
        ),
        spatial_hash_cell_size=2.0,
        spatial_hash_cutoff=2.0,
        hash_tile_k=16,  # occ ≈ 2.9 ⇒ Poisson tail past 8 is likely at
        # 512 cells; 16 makes overflow == 0 a safe assertion
    )
    s = nb.ParticleSystem()
    s.initialize(cfg)
    p = s._force_fn.engine_params
    assert p["engine"] == "tiles"  # 1500 particles / 512 cells ≈ 2.9
    audit = s.audit_short_range()
    assert audit["engine"] == "tiles"
    assert audit["overflow"] == 0
    assert audit["tile_k"] == cfg.hash_tile_k
    for _ in range(3):
        s.update()
    assert bool(jnp.isfinite(s._state.pos).all())


def test_light_grid_matches_full(key):
    """The light grid build (with_cell_start=False — sorted_ranks cummax
    + cell_starts_at searchsorted, the large-d³ path) must produce the
    same tile near field as the full segment-index build."""
    from nbody_tpu.ops.sorted_window import (
        cell_starts_at,
        sorted_ranks,
    )

    d = 8
    s, lo, cell, coords = setup(key, 300, d)
    grid_full = build_sorted_grid(s.pos, s.mass, coords, d)
    grid_light = build_sorted_grid(
        s.pos, s.mass, coords, d, with_cell_start=False
    )
    assert grid_light.cell_start is None

    # helper equivalence against the full index
    ids_sorted = (
        grid_full.csort[:, 0] * d + grid_full.csort[:, 1]
    ) * d + grid_full.csort[:, 2]
    ranks_full = (
        jnp.arange(ids_sorted.shape[0], dtype=jnp.int32)
        - grid_full.cell_start[ids_sorted]
    )
    np.testing.assert_array_equal(
        np.asarray(sorted_ranks(ids_sorted)), np.asarray(ranks_full)
    )
    queries = jnp.arange(0, d * d * d + 1, 7, dtype=jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(cell_starts_at(ids_sorted, queries)),
        np.asarray(grid_full.cell_start[queries]),
    )

    # end-to-end: tile near field identical under either grid
    acc_full, over_full = tile_near_field(
        s.pos, s.mass, coords, lo, cell,
        d=d, ws=1, k=32, G=1.0, eps=0.1, grid=grid_full,
    )
    acc_light, over_light = tile_near_field(
        s.pos, s.mass, coords, lo, cell,
        d=d, ws=1, k=32, G=1.0, eps=0.1, grid=grid_light,
    )
    assert int(over_full) == int(over_light) == 0
    np.testing.assert_allclose(
        np.asarray(acc_light), np.asarray(acc_full), rtol=1e-6, atol=1e-7
    )


def test_hash_window_sorted_matches_plain(key):
    """Window-engine sorted contract: spatial_hash_forces_window_sorted
    unsorted by its own permutation == spatial_hash_forces (same windows,
    same predicate), and psort rows == pos/mass rows under order."""
    from nbody_tpu.ops.sorted_window import unsort_rows
    from nbody_tpu.ops.spatial_hash import (
        spatial_hash_forces,
        spatial_hash_forces_window_sorted,
    )

    s = _uniform_cube(key, 1500, side=14.0)
    kw = dict(cutoff=1.5, cell_size=1.5, cap=16, window=1024)
    acc_plain = spatial_hash_forces(
        s.pos, s.mass, 1.0, 0.1, block_size=128, **kw,
    )
    acc_s, psort, order = spatial_hash_forces_window_sorted(
        s.pos, s.mass, 1.0, 0.1, block_size=128, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(unsort_rows(acc_s, order)),
        np.asarray(acc_plain),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(psort[:, :3]), np.asarray(s.pos)[np.asarray(order)]
    )


def test_sorted_factory_covers_both_hash_engines(key):
    """make_spatial_hash_forces_sorted returns a working sorted force for
    BOTH resolved engines, and full sorted stepping matches plain
    stepping on each."""
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_multi_step,
        make_sorted_multi_step,
    )
    from nbody_tpu.ops.spatial_hash import (
        hash_engine_params,
        make_spatial_hash_forces,
        make_spatial_hash_forces_sorted,
    )
    from nbody_tpu.types import ForceMethod, SimulationConfig

    sparse = _uniform_cube(key, 600, side=12.0)
    dense = init_spherical(
        jax.random.PRNGKey(7), 600, SphericalDistParams(radius=1.5)
    )
    for scene, state in (("sparse", sparse), ("dense", dense)):
        cfg = SimulationConfig(
            particle_count=600,
            force_method=ForceMethod.SPATIAL_HASH,
            spatial_hash_cell_size=2.0,
            hash_max_grid_dim=16,
            dt=1e-3,
        )
        p = hash_engine_params(cfg, state.pos)
        expected = "tiles" if scene == "sparse" else "window"
        assert p["engine"] == expected, (scene, p)
        force = make_spatial_hash_forces(cfg, pos_hint=state.pos)
        sorted_force = make_spatial_hash_forces_sorted(cfg, state.pos)
        assert sorted_force is not None
        st = initialize_forces(state, force)
        plain = make_multi_step(force, 1e-3, 3)(st)
        srt = make_sorted_multi_step(sorted_force, 1e-3, 3)(st)
        np.testing.assert_allclose(
            np.asarray(srt.pos), np.asarray(plain.pos),
            rtol=2e-5, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.asarray(srt.vel), np.asarray(plain.vel),
            rtol=2e-5, atol=2e-6,
        )


def test_build_sorted_grid_recomputed_ids(key):
    """The 8-column payload route (``ids_sorted_fn``): dropping the id
    column from the sort payload and recomputing sorted ids from sorted
    positions reproduces the bitcast route exactly when the recompute
    uses the same binning on the same bits, and a deliberately divergent
    recompute is clamped monotone (one-cell-late) instead of breaking
    the engines' non-decreasing-ids contract."""
    n, d = 500, 8
    s = init_spherical(key, n, SphericalDistParams(radius=4.0))
    lo = jnp.min(s.pos, axis=0)
    cell = jnp.max(jnp.max(s.pos, axis=0) - lo) * 1.00001 / d
    coords = jnp.clip(((s.pos - lo) / cell).astype(jnp.int32), 0, d - 1)
    extra = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)

    ref = build_sorted_grid(s.pos, s.mass, coords, d, extra=extra)

    def ids_fn(psort):
        cs = jnp.clip(
            ((psort[:, :3] - lo) / cell).astype(jnp.int32), 0, d - 1
        )
        return (cs[:, 0] * d + cs[:, 1]) * d + cs[:, 2]

    got = build_sorted_grid(
        s.pos, s.mass, coords, d, extra=extra, ids_sorted_fn=ids_fn
    )
    np.testing.assert_array_equal(np.asarray(got.order), np.asarray(ref.order))
    np.testing.assert_array_equal(np.asarray(got.psort), np.asarray(ref.psort))
    np.testing.assert_array_equal(np.asarray(got.extra), np.asarray(ref.extra))
    np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(ref.ids))
    assert (np.diff(np.asarray(got.ids)) >= 0).all()

    # Divergent recompute (a row re-bins low, as an f32 rounding-edge
    # row could): the running max degrades it to one-cell-late, monotone.
    def bad_ids_fn(psort):
        return ids_fn(psort).at[n // 2].set(0)

    clamped = build_sorted_grid(
        s.pos, s.mass, coords, d, extra=extra, ids_sorted_fn=bad_ids_fn
    )
    cids = np.asarray(clamped.ids)
    assert (np.diff(cids) >= 0).all()
    assert cids[n // 2] == np.asarray(ref.ids)[n // 2 - 1]


def test_sorted_multi_step_route_extra_equivalence(key):
    """route_extra=True (payload rides the engine's internal sort gather,
    the hash engines' measured preference) is the same physics as the
    separate payload gather (route_extra=False, Barnes-Hut's preference)."""
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_sorted_multi_step,
    )
    from nbody_tpu.ops.spatial_hash import (
        spatial_hash_forces,
        spatial_hash_forces_window_sorted,
    )

    n, steps, dt = 600, 3, 1e-3
    s = init_spherical(key, n, SphericalDistParams(radius=4.0))

    def force(pos, mass):
        return spatial_hash_forces(
            pos, mass, 1.0, 0.1, cutoff=1.5, cell_size=1.5, cap=16,
            window=2048,
        )

    def sorted_force(pos, mass, extra=None):
        return spatial_hash_forces_window_sorted(
            pos, mass, 1.0, 0.1, cutoff=1.5, cell_size=1.5, cap=16,
            window=2048, block_size=256, extra=extra,
        )

    st = initialize_forces(s, force)
    a = make_sorted_multi_step(sorted_force, dt, steps, route_extra=False)(st)
    b = make_sorted_multi_step(sorted_force, dt, steps, route_extra=True)(st)
    np.testing.assert_array_equal(np.asarray(a.mass), np.asarray(b.mass))
    np.testing.assert_allclose(
        np.asarray(a.pos), np.asarray(b.pos), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(a.vel), np.asarray(b.vel), rtol=1e-6, atol=1e-7
    )
