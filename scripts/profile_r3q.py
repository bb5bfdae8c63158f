"""TPU profile r3q — the r3-restructured BH pipeline, measured.

After: fused moments+counts in the scatter kernel, light grid build
(no cell_start / rank gather — scripts/profile_r3p.py), explicit
nonempty (no cummax), row-major sweep output (no pickup transpose).

Rows (honest sum-readbacks, min of 3 timed scans of REPS):
  q1  light grid build (sort + payload)
  q2  q1 + sorted_ranks + dest + searchsorted starts
  q3  q2 + fused scatter+moments kernel (tiles + moments + counts)
  q4  q3 + pyramid + far taps (far grid ready)
  q5  q4 + sweep row-major (far folded) — no pickup
  q6  full sorted force (= q5 + pickup)        [barnes_hut_forces_sorted]
  q7  full sorted Verlet step (force + glue)
  A/B: q6rm0 — force with row_major pickup DISABLED (XLA transpose path)
Accuracy gate: fused-vs-direct rel RMS at 65536 (same scene family)
must match the r2 operating point (~4e-3 at θ=0.5/order2).

Usage: python scripts/profile_r3q.py
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
G = 1.0
EPS = 0.1
THETA = 0.5
K = 16


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
            out = rung(p)
            s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
            return jnp.full((8,), s * 1e-30), None
        return body, jnp.zeros((8,))
    return make


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        barnes_hut_forces_sorted,
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
        theta_to_ws,
    )
    from nbody_tpu.ops.sorted_window import build_sorted_grid, cell_starts_at
    from nbody_tpu.ops.tile_sweep import tile_build_pallas, tile_sweep_pick
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    vel0 = jax.device_put(state.vel)
    jax.block_until_ready((pos0, mass, vel0))

    ws = theta_to_ws(THETA, order=2)

    def rung_grid(p):
        lo, cell = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(p, mass, coords, D, with_cell_start=False)
        return grid, lo, cell

    bench("q1 light grid (sort+payload)",
          mk(lambda p: (rung_grid(p)[0].psort, rung_grid(p)[0].ids), pos0))

    from nbody_tpu.ops.sorted_window import sorted_ranks

    num_cells = D * D * D
    g_f = 128 // math.gcd(D * K, 128)
    r_chunk = g_f * D * K
    n_chunks = (num_cells * K) // r_chunk

    def rung_prep(p):
        grid, lo, cell = rung_grid(p)
        rank = sorted_ranks(grid.ids)
        dest = jnp.where(rank < K, grid.ids * K + rank, 1 << 24)
        car = jnp.arange(n_chunks, dtype=jnp.int32)
        c0 = (car * r_chunk) // K
        c1 = jnp.minimum(((car + 1) * r_chunk + K - 1) // K, num_cells)
        starts = cell_starts_at(grid.ids, c0)
        ends = cell_starts_at(grid.ids, c1)
        return grid.psort, dest, starts, ends

    bench("q2 q1+ranks+dest+starts", mk(rung_prep, pos0))

    def rung_build(p):
        grid, lo, cell = rung_grid(p)
        tb = tile_build_pallas(
            grid, lo, cell, d=D, k=K, impl="pallas", with_moments=True)
        return tb.tiles_plane, tb.moments, tb.overflow

    bench("q3 q2+fused scatter+moments", mk(rung_build, pos0))

    def rung_far(p):
        grid, lo, cell = rung_grid(p)
        tb = tile_build_pallas(
            grid, lo, cell, d=D, k=K, impl="pallas", with_moments=True)
        packed = tb.moments[:10].T.reshape(D, D, D, 10)
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        a_far, j_far, h_far = far_field_grid(pyr, ws, 1.0, EPS, LEVELS)
        return tb.tiles_plane, a_far, j_far, h_far, tb.overflow

    bench("q4 q3+pyramid+far taps", mk(rung_far, pos0))

    def rung_force(p, sweep_only=False):
        grid, lo, cell = rung_grid(p)
        tb = tile_build_pallas(
            grid, lo, cell, d=D, k=K, impl="pallas", with_moments=True)
        packed = tb.moments[:10].T.reshape(D, D, D, 10)
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        a_far, j_far, h_far = far_field_grid(pyr, ws, 1.0, EPS, LEVELS)
        packed_g = jnp.concatenate([a_far, j_far, h_far], axis=-1)
        far_plane = packed_g.reshape(D, D * D, 19).transpose(0, 2, 1)
        if sweep_only:
            from nbody_tpu.ops.pallas_tile_near import (
                tile_sweep_pallas_plane,
            )

            acc_rm = tile_sweep_pallas_plane(
                tb.tiles_plane, k=K, d=D, ws=ws, eps=EPS,
                far_plane=far_plane, lo=lo, cell=cell, row_major=True)
            return (acc_rm,)
        acc = tile_sweep_pick(
            tb, grid, lo, cell, d=D, ws=ws, k=K, G=G, eps=EPS,
            impl="pallas", sorted_output=True, far_plane=far_plane)
        return acc, grid.psort, grid.order

    bench("q5 q4+sweep row-major (no pickup)",
          mk(lambda p: rung_force(p, sweep_only=True), pos0))
    bench("q6 full sorted force", mk(rung_force, pos0))

    def sorted_force(p, m, extra):
        return barnes_hut_forces_sorted(
            p, m, G, EPS, THETA,
            levels=LEVELS, near_k=K, multipole_order=2, extra=extra,
        )

    from nbody_tpu.ops.integrator import SortedState, sorted_verlet_step

    def rung_step(p):
        s = SortedState(
            pos=p, vel=vel0, acc=jnp.zeros_like(p), mass=mass,
            to_orig=jnp.arange(N, dtype=jnp.int32),
            time=jnp.zeros((), p.dtype),
        )
        out = sorted_verlet_step(s, sorted_force, 1e-3)
        return out.pos, out.vel

    bench("q7 full sorted step (force+glue)", mk(rung_step, pos0))

    # --- accuracy gate at 65536 -----------------------------------------
    # Production-like config: L5/k16 keeps avg occupancy 2 so the k-slot
    # cap's audited overflow stays negligible — earlier gate revisions
    # used L4/k64 (occ 16, dense core >> 64/cell) and measured the
    # overflow drop, not kernel error (rel-RMS O(1), a harness bug).
    NA, LA = 65_536, 5
    sa = init_spherical(
        jax.random.PRNGKey(7), NA, SphericalDistParams(radius=10.0))
    pa = jax.device_put(sa.pos)
    ma = jax.device_put(sa.mass)
    from nbody_tpu.ops.barnes_hut import _barnes_hut_forces
    from nbody_tpu.ops.direct import direct_forces

    ref_acc = jax.jit(lambda p: direct_forces(p, ma, G, EPS))(pa)
    ref_acc.block_until_ready()
    ref_norm = float(jnp.sqrt(jnp.mean(jnp.sum(ref_acc**2, -1))))
    acc = _barnes_hut_forces(
        pa, ma, G, EPS, THETA, levels=LA, window=2048,
        near_engine="tiles", near_k=16, multipole_order=2,
        near_impl="pallas",
    )
    err = float(jnp.sqrt(jnp.mean(jnp.sum((acc - ref_acc) ** 2, -1))))
    print(f"accuracy fused@65K/L5/k16 rel-RMS = {err / ref_norm:.3e} "
          f"(θ=0.5 operating point ~4-5e-3)", flush=True)


if __name__ == "__main__":
    main()
