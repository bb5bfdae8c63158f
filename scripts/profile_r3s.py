"""TPU profile r3s — pickup-chain bisection + fused-fallback A/B.

The r3 force budget says "pickup ~21 ms" at 1M/L6/k16 but that number is
a subtraction of coarse rungs. This script splits the chain precisely and
A/Bs the round-4 plan #1 fixes:

  q0  ctrl: barnes_hut_forces_sorted full force (expect ~47 ms)
  q1  fused chain through the far-seeded sweep, NO pickup
  q2  q1 + relayout transpose to the (d³k, 3) pickup table
  q3  q2 + the pickup row gather (no overflow handling)
  q4  q3 + PRODUCTION fallback: far_a built from far_plane (narrow
      slice+transpose) + second 1M-row gather + where  == current pickup
  q5  q3 + FUSED fallback: far_a taken from a_far directly (no slice of
      the lane-major far_plane), concat onto the pickup table, overflow
      rows redirected into the SAME gather by index — no where, no
      second gather
  q6  q5 but far_a from far_plane (isolates the a_far-direct saving)

Usage: python scripts/profile_r3s.py
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
        print(f"{name:58s} {best / reps * 1000:8.2f} ms/iter "
              f"(chk {chk:.4e})", flush=True)
        return best / reps
    except Exception as e:
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

    def rung_sweep(p):
        """The fused pipeline through the far-seeded sweep — everything
        BEFORE the pickup (mirrors _barnes_hut_forces' fused branch)."""
        lo, cell = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(p, mass, coords, D, with_cell_start=False)
        tb = tile_build_pallas(
            grid, lo, cell, d=D, k=K, impl="pallas", with_moments=True)
        packed = tb.moments[:10].T.reshape(D, D, D, 10)
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        a_far, j_far, h_far = far_field_grid(
            pyr, ws, 1.0, EPS, LEVELS, impl="pallas")
        packed_g = jnp.concatenate([a_far, j_far, h_far], axis=-1)
        far_plane = packed_g.reshape(D, D * D, 19).transpose(0, 2, 1)
        acc_raw = tile_sweep_pallas_plane(
            tb.tiles_plane, k=K, d=D, ws=ws, eps=EPS,
            far_plane=far_plane, lo=lo, cell=cell)
        return acc_raw, a_far, far_plane, grid, tb.rank_sorted

    def transpose_tbl(acc_raw):
        l = D * D
        return (
            acc_raw[:, :, :, :l]
            .reshape(D, 3, K, D, D)
            .transpose(0, 3, 4, 2, 1)
            .reshape(kslots, 3)
        )

    bench("q0 ctrl barnes_hut_forces_sorted", mk(
        lambda p: barnes_hut_forces_sorted(
            p, mass, G, EPS, THETA, levels=LEVELS, near_k=K,
            multipole_order=2, near_impl="pallas")[0], pos0))

    bench("q1 chain through sweep (no pickup)", mk(
        lambda p: rung_sweep(p)[0], pos0))

    bench("q2 q1+transpose table", mk(
        lambda p: transpose_tbl(rung_sweep(p)[0]), pos0))

    def rung_q3(p):
        acc_raw, a_far, far_plane, grid, rank = rung_sweep(p)
        acc_t = transpose_tbl(acc_raw)
        rank_read = jnp.minimum(rank, K - 1)
        return G * acc_t[grid.ids * K + rank_read]

    bench("q3 q2+row gather (no overflow)", mk(rung_q3, pos0))

    def rung_q4(p):
        acc_raw, a_far, far_plane, grid, rank = rung_sweep(p)
        acc_t = transpose_tbl(acc_raw)
        far_a = far_plane[:, 0:3, :].transpose(0, 2, 1).reshape(D**3, 3)
        rank_read = jnp.minimum(rank, K - 1)
        acc_sorted = acc_t[grid.ids * K + rank_read]
        fallback = far_a[grid.ids]
        return G * jnp.where((rank < K)[:, None], acc_sorted, fallback)

    bench("q4 q3+PRODUCTION fallback (slice+2nd gather+where)",
          mk(rung_q4, pos0))

    def rung_q5(p):
        acc_raw, a_far, far_plane, grid, rank = rung_sweep(p)
        acc_t = transpose_tbl(acc_raw)
        table = jnp.concatenate([acc_t, a_far.reshape(D**3, 3)], axis=0)
        idx = jnp.where(rank < K, grid.ids * K + rank, kslots + grid.ids)
        return G * table[idx]

    bench("q5 q3+FUSED fallback (a_far direct, one gather)",
          mk(rung_q5, pos0))

    def rung_q6(p):
        acc_raw, a_far, far_plane, grid, rank = rung_sweep(p)
        acc_t = transpose_tbl(acc_raw)
        far_a = far_plane[:, 0:3, :].transpose(0, 2, 1).reshape(D**3, 3)
        table = jnp.concatenate([acc_t, far_a], axis=0)
        idx = jnp.where(rank < K, grid.ids * K + rank, kslots + grid.ids)
        return G * table[idx]

    bench("q6 q5 but far_a from far_plane (slice cost)",
          mk(rung_q6, pos0))

    # equivalence: q4 (production) vs q5 (fused) must be bit-identical
    a4 = jax.jit(rung_q4)(pos0)
    a5 = jax.jit(rung_q5)(pos0)
    md = float(jnp.max(jnp.abs(a4 - a5)))
    print(f"equivalence q4 vs q5: max |diff| = {md:.3e}", flush=True)


if __name__ == "__main__":
    main()
