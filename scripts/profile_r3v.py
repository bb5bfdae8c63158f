"""TPU profile r3v — pre-sweep chain bisection + cell-major pickup A/B.

After the r3u round (force 31.3 ms, full step 37.1 at 1M/L6/k16) the
budget estimates say sort ~9, pickup ~7.3, pyramid+far ~6, scatter ~4,
sweep ~3. This script measures the rungs precisely and A/Bs two ideas:

  v0  ctrl: barnes_hut_forces_sorted (expect ~30 with csort skipped)
  v1  sort only: light build_sorted_grid (no cell_start, no csort)
  v1b multi-operand lax.sort alternative (sort 6 operands directly —
      no argsort+payload-gather round trip)
  v2  v1 + fused tile/moments scatter build
  v3  v2 + pyramid_from_packed + far_field_grid (isolates moments→far)
  v4  v3 + far-seeded sweep (chain through sweep, no pickup)
  v5  v4 + CELL-MAJOR pickup table transpose to (d³, 3k) — the
      (d³k, 3) production table pads minor 3→128 lanes (2.1 GB write at
      1M/k16); (d³, 48) pads 48→128 (134 MB)
  v6  v5 + row gather (N, 48) + 3 masked-lane reductions + fused
      overflow rows == a full alternative pickup
  v7  full step via make_sorted_multi_step (packed vel_tag carry)

Equivalence: v6 vs the production pickup must match bitwise.

Usage: python scripts/profile_r3v.py
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
G = 1.0
EPS = 0.1
THETA = 0.5
K = 16
DT = 1e-3


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
        print(f"{name:58s} {best / reps * 1000:8.2f} ms/iter "
              f"(chk {chk:.4e})", flush=True)
        return best / reps
    except Exception as e:  # noqa: BLE001
        print(f"{name:58s} FAILED: {type(e).__name__}: {str(e)[:300]}",
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
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_sorted_multi_step,
    )
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas_plane
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import tile_build_pallas
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    ws = theta_to_ws(THETA, order=2)
    kslots = D * D * D * K

    def rung_sort(p):
        lo, cell = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(
            p, mass, coords, D, with_cell_start=False, with_csort=False)
        return grid, lo, cell

    def rung_sort_multi(p):
        """lax.sort of 6 operands — no argsort + payload gather."""
        lo, cell = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
        ids = ((coords[:, 0] * D + coords[:, 1]) * D
               + coords[:, 2]).astype(jnp.int32)
        iota = jnp.arange(N, dtype=jnp.int32)
        out = jax.lax.sort(
            (ids, iota, p[:, 0], p[:, 1], p[:, 2], mass),
            dimension=0, num_keys=1,
        )
        return out

    def rung_build(p):
        grid, lo, cell = rung_sort(p)
        tb = tile_build_pallas(
            grid, lo, cell, d=D, k=K, impl="pallas", with_moments=True)
        return grid, lo, cell, tb

    def rung_far(p):
        grid, lo, cell, tb = rung_build(p)
        packed = tb.moments[:10].T.reshape(D, D, D, 10)
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        a_far, j_far, h_far = far_field_grid(
            pyr, ws, 1.0, EPS, LEVELS, impl="pallas")
        packed_g = jnp.concatenate([a_far, j_far, h_far], axis=-1)
        far_plane = packed_g.reshape(D, D * D, 19).transpose(0, 2, 1)
        return grid, lo, cell, tb, a_far, far_plane

    def rung_sweep(p):
        grid, lo, cell, tb, a_far, far_plane = rung_far(p)
        acc_raw = tile_sweep_pallas_plane(
            tb.tiles_plane, k=K, d=D, ws=ws, eps=EPS,
            far_plane=far_plane, lo=lo, cell=cell)
        return acc_raw, a_far, grid, tb.rank_sorted

    l = D * D

    def table_cellmajor(acc_raw):
        # (x, ch, slot, y, z) -> (x, y, z, slot, ch) -> (d³, 3K)
        return (
            acc_raw[:, :, :, :l]
            .reshape(D, 3, K, D, D)
            .transpose(0, 3, 4, 2, 1)
            .reshape(D * D * D, 3 * K)
        )

    def pickup_cellmajor(acc_raw, a_far, grid, rank):
        tbl = table_cellmajor(acc_raw)
        far_rows = jnp.pad(a_far.reshape(D**3, 3), ((0, 0), (0, 3 * K - 3)))
        table = jnp.concatenate([tbl, far_rows], axis=0)
        idx = jnp.where(rank < K, grid.ids, D**3 + grid.ids)
        rank_read = jnp.where(rank < K, rank, 0)
        g = table[idx]                                   # (N, 3K)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * K), 1)
        base = (3 * rank_read)[:, None]
        out = [
            jnp.sum(jnp.where(lane == base + c, g, 0.0), axis=1)
            for c in range(3)
        ]
        return G * jnp.stack(out, axis=-1)

    bench("v0 ctrl barnes_hut_forces_sorted", mk(
        lambda p: barnes_hut_forces_sorted(
            p, mass, G, EPS, THETA, levels=LEVELS, near_k=K,
            multipole_order=2, near_impl="pallas")[0], pos0))
    bench("v1 sort only (light grid)", mk(
        lambda p: rung_sort(p)[0].psort, pos0))
    bench("v1b multi-operand lax.sort", mk(rung_sort_multi, pos0))
    bench("v2 v1+scatter build (tiles+moments)", mk(
        lambda p: rung_build(p)[3].tiles_plane, pos0))
    bench("v3 v2+pyramid+far grids", mk(
        lambda p: rung_far(p)[5], pos0))
    bench("v4 v3+far-seeded sweep (no pickup)", mk(
        lambda p: rung_sweep(p)[0], pos0))
    bench("v5 v4+cell-major (d3,3K) table", mk(
        lambda p: table_cellmajor(rung_sweep(p)[0]), pos0))
    bench("v6 v5+masked-lane pickup (full alt pickup)", mk(
        lambda p: pickup_cellmajor(*rung_sweep(p)), pos0))

    # v7: full step headline via the packed carry
    def mk_step():
        kw = dict(levels=LEVELS, near_k=K, multipole_order=2,
                  near_impl="pallas")

        def sorted_force_fn(p, m, extra=None):
            return barnes_hut_forces_sorted(p, m, G, EPS, THETA, **kw)

        multi = make_sorted_multi_step(sorted_force_fn, DT, REPS)

        def body(st, _):
            return multi(st), None

        def force_fn(p, m):
            return barnes_hut_forces_sorted(p, m, G, EPS, THETA, **kw)[0]

        st0 = initialize_forces(state, lambda p, m: force_fn(p, m))
        return body, st0

    # one "iter" of the scan is REPS steps: report per step
    t = bench("v7 10x sorted_multi_step (packed vel_tag)", mk_step, reps=1)
    if t is not None:
        print(f"   per-step: {t / REPS * 1000:.2f} ms "
              f"({REPS / t:.2f} steps/s)", flush=True)

    # equivalence: cell-major pickup vs production force
    prod = jax.jit(lambda p: barnes_hut_forces_sorted(
        p, mass, G, EPS, THETA, levels=LEVELS, near_k=K,
        multipole_order=2, near_impl="pallas")[0])(pos0)
    alt = jax.jit(lambda p: pickup_cellmajor(*rung_sweep(p)))(pos0)
    md = float(jnp.max(jnp.abs(prod - alt)))
    print(f"equivalence production vs cell-major pickup: "
          f"max |diff| = {md:.3e}", flush=True)


if __name__ == "__main__":
    main()
