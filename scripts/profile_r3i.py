"""TPU profile r3i — v5 fused tile layout (slot-major scatter -> one
transpose -> raw-lane masked sweep -> slice3 pickup).

Baseline (r3h, honest Verlet rows): BH sorted Verlet 1M = 116.9 ms/step,
hash sorted Verlet 1M sparse = 81.9 ms/step. The r3h force-only rows
returned sliced outputs which let XLA DCE the pickup — every rung here
reads back a full SUM so nothing is dead.

Measures:
  * piece rungs (sum readbacks): grid build, scatter q-layout, relayout
    transpose, sweep plane kernel, full near chain, far chain
  * pickup A/B: slice3 advanced-index gather vs legacy transpose+row
  * BH FULL sorted force + sorted Verlet multi-step (the headline)
  * hash tiles sorted Verlet on the 1M sparse scene

Usage: python scripts/profile_r3i.py
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 1_000_000
REPS = 10
LEVELS = 6
D = 1 << LEVELS
K = 16
G = 1.0
EPS = 0.1


def bench(name, make_body, reps=REPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    def sync(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return float(jnp.sum(leaf))

    try:
        chk = sync(run(init))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(init))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:52s} {best / reps * 1000:8.2f} ms/iter "
              f"(chk {chk:.4e})", flush=True)
        return best / reps
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:400]}",
              flush=True)
        return None


def mk(rung, ref):
    """Honest rung: output is SUMMED so XLA cannot DCE any of it."""
    def make():
        def body(c, _):
            p = ref * (1 + c[0] * 1e-30)
            out = rung(p)
            s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
            return jnp.full((8,), s * 1e-30), None
        return body, jnp.zeros((8,))
    return make


def main():
    from nbody_tpu.models.distributions import init_spherical, init_uniform
    from nbody_tpu.ops.barnes_hut import _barnes_hut_forces, pyramid_geometry
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas_plane
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import (
        _slot_pickup,
        _slot_pickup_raw,
        tile_near_field,
    )
    from nbody_tpu.types import (
        SimulationConfig,
        ForceMethod,
        SphericalDistParams,
        UniformDistParams,
    )

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    lo, cell = pyramid_geometry(
        jnp.min(pos0, axis=0), jnp.max(pos0, axis=0), LEVELS)
    coords0 = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)

    # ---- pieces (each includes its producers; deltas give the piece) --
    def mk_grid():
        def rung(p):
            gridb = build_sorted_grid(p, mass, coords0, D)
            return (gridb.psort, gridb.cell_start)
        return mk(rung, pos0)

    bench("grid build (payload single gather)", mk_grid())

    # prebuilt inputs for isolated kernel rungs
    grid = build_sorted_grid(pos0, mass, coords0, D)
    ids_sorted = (
        grid.csort[:, 0] * D + grid.csort[:, 1]
    ) * D + grid.csort[:, 2]
    nums = D * D * D
    g_f = 128 // math.gcd(D * K, 128)
    r_chunk = g_f * D * K
    q_cells = r_chunk // K
    rank_sorted = jnp.arange(N, dtype=jnp.int32) - grid.cell_start[ids_sorted]
    dest = jnp.where(rank_sorted < K, ids_sorted * K + rank_sorted, 1 << 24)
    n_chunks = (nums * K) // r_chunk
    car = jnp.arange(n_chunks, dtype=jnp.int32)
    starts = grid.cell_start[(car * r_chunk) // K]
    jax.block_until_ready((grid.psort, dest, starts))

    def mk_scatter():
        def rung(p):
            psort = grid.psort * (1 + p[0, 0] * 1e-30)
            return monotone_scatter_tiles(
                psort, dest, starts, lo, cell,
                k=K, d=D, r=r_chunk, w=640, q=q_cells)
        return mk(rung, pos0)

    bench(f"scatter slot-major q={q_cells} w=640", mk_scatter())

    tiles_cm = monotone_scatter_tiles(
        grid.psort, dest, starts, lo, cell,
        k=K, d=D, r=r_chunk, w=640, q=q_cells)
    jax.block_until_ready(tiles_cm)

    def mk_relayout():
        def rung(t):
            return (
                t.reshape(4, D, D // g_f, K, g_f, D)
                .transpose(1, 0, 3, 2, 4, 5)
                .reshape(D, 4, K, D * D)
            )
        return mk(rung, tiles_cm)

    bench("relayout transpose (4,m)->(d,4,k,d2)", mk_relayout())

    tiles_plane = (
        tiles_cm.reshape(4, D, D // g_f, K, g_f, D)
        .transpose(1, 0, 3, 2, 4, 5)
        .reshape(D, 4, K, D * D)
    )
    jax.block_until_ready(tiles_plane)

    def mk_sweep():
        def rung(t):
            return tile_sweep_pallas_plane(t, k=K, d=D, ws=1, eps=EPS)
        return mk(rung, tiles_plane)

    bench("sweep plane kernel (incl pad)", mk_sweep())

    acc_raw = tile_sweep_pallas_plane(tiles_plane, k=K, d=D, ws=1, eps=EPS)
    jax.block_until_ready(acc_raw)

    def mk_pickup_raw():
        def rung(a):
            return _slot_pickup_raw(
                a, grid, ids_sorted, rank_sorted, D, K, N, G,
                sorted_output=True)
        return mk(rung, acc_raw)

    def mk_pickup_legacy():
        def rung(a):
            l = D * D
            acc_slots = (
                a[:, :, :, :l].reshape(D, 3, K, D, D)
                .transpose(2, 1, 0, 3, 4)
            )
            return _slot_pickup(
                acc_slots, grid, ids_sorted, rank_sorted, K, N, G,
                sorted_output=True)
        return mk(rung, acc_raw)

    bench("pickup slice3 (sorted)", mk_pickup_raw())
    bench("pickup legacy transpose+row (sorted)", mk_pickup_legacy())

    def mk_near_only():
        def rung(p):
            lo2, cell2 = pyramid_geometry(
                jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
            crd = jnp.clip(((p - lo2) / cell2).astype(jnp.int32), 0, D - 1)
            a, over = tile_near_field(
                p, mass, crd, lo2, cell2, d=D, ws=1, k=K, G=G, eps=EPS,
                impl="pallas", sorted_output=True)
            return (a, over)
        return mk(rung, pos0)

    bench("near chain v5 (grid+scatter+sweep+pickup)", mk_near_only())

    def mk_bh_full():
        def rung(p):
            out = _barnes_hut_forces(
                p, mass, G, EPS, 0.5, levels=LEVELS, window=2048,
                near_engine="tiles", near_k=K, multipole_order=2,
                near_impl="pallas", sorted_output=True)
            return out[0]
        return mk(rung, pos0)

    bench("BH FULL sorted force (sum readback)", mk_bh_full())

    # ---- headline: sorted Verlet multi-step ---------------------------
    from nbody_tpu.ops.forces import make_force_fn, make_sorted_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_sorted_multi_step,
    )

    sp = init_uniform(
        jax.random.PRNGKey(42), N,
        UniformDistParams(min_bounds=(-50.0, -50.0, -50.0),
                          max_bounds=(50.0, 50.0, 50.0)))

    for label, cfg_m, st in (
        ("BH", SimulationConfig(
            particle_count=N, force_method=ForceMethod.BARNES_HUT,
            bh_max_level=6, dt=1e-3), state),
        ("hash sparse", SimulationConfig(
            particle_count=N, force_method=ForceMethod.SPATIAL_HASH,
            spatial_hash_cell_size=2.0, spatial_hash_cutoff=2.0,
            dt=1e-3), sp),
    ):
        sf = make_sorted_force_fn(cfg_m, pos_hint=st.pos)
        if sf is None:
            print(f"{label}: no sorted force fn", flush=True)
            continue
        multi = jax.jit(make_sorted_multi_step(sf, 1e-3, 10))
        ff = make_force_fn(cfg_m, pos_hint=st.pos)
        s0 = jax.jit(lambda s, f=ff: initialize_forces(s, f))(st)
        out = multi(s0)
        float(jnp.sum(out.pos[0]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = multi(out)
            float(jnp.sum(out.pos[0]))
            best = min(best, time.perf_counter() - t0)
        print(f"{label} sorted Verlet 1M: {best / 10 * 1000:.2f} ms/step "
              f"= {10 / best:.2f} steps/s", flush=True)


if __name__ == "__main__":
    main()
