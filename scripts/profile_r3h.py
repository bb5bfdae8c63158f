"""TPU profile r3h — light cell_start + retuned sparse hash chain.

r3g found: scatter 8.3 (r=1024/w=640 optimal), relayout +2.5, pickup 8.4,
moments 5.6, grid build 16.2 (BH) / 25.9 (hash d=128), FULL 93.7 — and a
~29 ms gap between FULL and the sum of its pieces. Also: hash tiles at
d=128/k=8/w=256 ran 273 ms (w misses -> XLA fallback scatter every step).

This batch measures:
  * BH grid build + FULL with with_cell_start=False (rank via cummax,
    chunk starts via boundary searchsorted — no d³ scatter-min)
  * FULL bisections (near-only / far-only) to localize the gap
  * the RETUNED sparse hash chain: cell=2 scene grid (d=56, k=16, w=768)
  * a bench-style sorted multi-step at 1M for both methods

Usage: python scripts/profile_r3h.py
"""

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
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def mk(rung, ref):
    def make():
        def body(c, _):
            p = ref * (1 + c[0] * 1e-30)
            out = jnp.ravel(rung(p))[:8]
            return jnp.pad(out, (0, 8 - out.shape[0])), None
        return body, jnp.zeros((8,))
    return make


def main():
    from nbody_tpu.models.distributions import init_spherical, init_uniform
    from nbody_tpu.ops.barnes_hut import (
        _barnes_hut_forces,
        _sorted_finest_moments,
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
        scatter_finest_moments,
    )
    from nbody_tpu.ops.sorted_window import (
        build_sorted_grid,
        cell_starts_at,
        sorted_ranks,
    )
    from nbody_tpu.ops.spatial_hash import (
        hash_engine_params,
        spatial_hash_forces_tiles,
        spatial_hash_forces_tiles_sorted,
    )
    from nbody_tpu.ops.tile_sweep import tile_near_field
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

    # grid build: light vs full segment index
    def mk_grid(light):
        def rung(p):
            g = build_sorted_grid(p, mass, coords0, D,
                                  with_cell_start=not light)
            ids_s = (
                g.csort[:, 0] * D + g.csort[:, 1]
            ) * D + g.csort[:, 2]
            r = sorted_ranks(ids_s)
            st = cell_starts_at(ids_s, jnp.arange(0, D**3, 64))
            return g.psort[0, :3] + r[0] + st[0]
        return mk(rung, pos0)

    bench("BH grid build FULL cell_start", mk_grid(False))
    bench("BH grid build LIGHT (ranks+chunk starts)", mk_grid(True))

    # FULL bisections
    def mk_near_only():
        def rung(p):
            lo2, cell2 = pyramid_geometry(
                jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
            crd = jnp.clip(((p - lo2) / cell2).astype(jnp.int32), 0, D - 1)
            a, _ = tile_near_field(
                p, mass, crd, lo2, cell2, d=D, ws=1, k=K, G=G, eps=EPS,
                impl="pallas", sorted_output=True)
            return a[0]
        return mk(rung, pos0)

    def mk_far_only():
        def rung(p):
            lo2, cell2 = pyramid_geometry(
                jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
            crd = jnp.clip(((p - lo2) / cell2).astype(jnp.int32), 0, D - 1)
            grid = build_sorted_grid(p, mass, crd, D,
                                     with_cell_start=False)
            ids_s = (
                grid.csort[:, 0] * D + grid.csort[:, 1]
            ) * D + grid.csort[:, 2]
            packed_fast, miss = _sorted_finest_moments(
                grid, ids_s, lo2, cell2, D, 2)
            packed = jax.lax.cond(
                miss == 0,
                lambda: packed_fast,
                lambda: scatter_finest_moments(
                    p, mass, crd, lo2, cell2, D, 2),
            )
            pyr = pyramid_from_packed(packed, lo2, cell2, LEVELS, 2)
            a_far, j_far, h_far = far_field_grid(pyr, 1, G, EPS, LEVELS)
            return a_far[0, 0, 0] + j_far[0, 0, 0, :3]
        return mk(rung, pos0)

    bench("BH near-only (grid+scatter+sweep+pickup)", mk_near_only())
    bench("BH far-only (grid+moments+pyramid+taps)", mk_far_only())

    def mk_bh_full(sorted_out):
        def rung(p):
            out = _barnes_hut_forces(
                p, mass, G, EPS, 0.5, levels=LEVELS, window=2048,
                near_engine="tiles", near_k=K, multipole_order=2,
                near_impl="pallas", sorted_output=sorted_out)
            if sorted_out:
                return out[0][0] + out[1][0, :3]
            return out[0]
        return mk(rung, pos0)

    bench("BH FULL (light cell_start)", mk_bh_full(False))
    bench("BH FULL sorted-out (bench force path)", mk_bh_full(True))

    # ---------------- retuned sparse hash (cell = cutoff = 2) ----------
    sp = init_uniform(
        jax.random.PRNGKey(42), N,
        UniformDistParams(min_bounds=(-50.0, -50.0, -50.0),
                          max_bounds=(50.0, 50.0, 50.0)))
    pos_s = jax.device_put(sp.pos)
    mass_s = jax.device_put(sp.mass)
    jax.block_until_ready((pos_s, mass_s))

    cfg = SimulationConfig(
        particle_count=N, force_method=ForceMethod.SPATIAL_HASH,
        spatial_hash_cell_size=2.0, spatial_hash_cutoff=2.0,
    )
    prm = hash_engine_params(cfg, pos_s)
    print(f"hash engine params: {prm}", flush=True)
    HD, HK, HW = prm["tile_d"], prm["tile_k"], prm["build_window"]

    def mk_hash_full():
        def rung(p):
            acc = spatial_hash_forces_tiles(
                p, mass_s, G, EPS, cutoff=2.0, cell_size=2.0,
                d=HD, k=HK, build_window=HW, impl="pallas")
            return acc[0]
        return mk(rung, pos_s)

    def mk_hash_sorted():
        def rung(p):
            acc, ps, order = spatial_hash_forces_tiles_sorted(
                p, mass_s, G, EPS, cutoff=2.0, cell_size=2.0,
                d=HD, k=HK, build_window=HW, impl="pallas")
            return acc[0] + ps[0, :3]
        return mk(rung, pos_s)

    bench(f"hash tiles FULL d={HD} k={HK} w={HW} (unsorted)",
          mk_hash_full())
    bench(f"hash tiles FULL d={HD} k={HK} w={HW} (sorted)",
          mk_hash_sorted())

    # bench-style sorted multi-step (true steps/s at 1M, both methods)
    from nbody_tpu.ops.forces import make_sorted_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_sorted_multi_step,
    )

    for label, cfg_m, st in (
        ("BH", SimulationConfig(
            particle_count=N, force_method=ForceMethod.BARNES_HUT,
            bh_max_level=6, dt=1e-3), state),
        ("hash", cfg, sp),
    ):
        sf = make_sorted_force_fn(cfg_m, pos_hint=st.pos)
        if sf is None:
            print(f"{label}: no sorted force fn", flush=True)
            continue
        multi = jax.jit(make_sorted_multi_step(sf, 1e-3, 10))
        from nbody_tpu.ops.forces import make_force_fn
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
