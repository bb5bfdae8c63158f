"""TPU profile r3a — stage-by-stage budget of the 1M BH fast path.

Goal: locate the ~28 ms "glue" bucket (VERDICT r2) precisely before
building the v5 fused near-field kernel. Uses the trustworthy harness
(real scalar D2H warmup, min-of-3) from profile_bh5.py.

Also A/Bs candidate replacements:
  * cell_start via at[].min scatter  vs  boundary+cummax ranks +
    searchsorted chunk starts (scatter-free)
  * slot pickup pieces (transpose / gather / unsort)

Usage: python scripts/profile_r3a.py [N]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = 10
LEVELS = 6
D = 1 << LEVELS
K = 16
WS = 1


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


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        _barnes_hut_forces,
        _sorted_finest_moments,
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
        sym_matvec,
        sym3_matvec,
    )
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas
    from nbody_tpu.ops.sorted_window import build_sorted_grid, unsort_rows
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()} N={N} L={LEVELS} k={K}",
          flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    lo, cell = pyramid_geometry(
        jnp.min(pos0, axis=0), jnp.max(pos0, axis=0), LEVELS)
    coords0 = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)
    ids0 = (coords0[:, 0] * D + coords0[:, 1]) * D + coords0[:, 2]

    # Precomputed static inputs for isolated stages
    grid0 = jax.jit(
        lambda p: build_sorted_grid(p, mass, coords0, D)
    )(pos0)
    jax.block_until_ready(grid0)
    ids_sorted0 = (
        grid0.csort[:, 0] * D + grid0.csort[:, 1]
    ) * D + grid0.csort[:, 2]
    arange = jnp.arange(N, dtype=jnp.int32)
    rank0 = arange - grid0.cell_start[ids_sorted0]
    nc = D * D * D
    r_chunk, w_win = 1024, 640
    n_chunks = nc * K // r_chunk
    chunk_ar = jnp.arange(n_chunks, dtype=jnp.int32)
    c0 = jnp.minimum(chunk_ar * r_chunk // K, nc)
    starts0 = grid0.cell_start[c0]
    dest0 = jnp.where(rank0 < K, ids_sorted0 * K + rank0, 1 << 24)
    tiles_cm0 = jax.jit(
        lambda: monotone_scatter_tiles(
            grid0.psort, dest0, starts0, lo, cell,
            k=K, d=D, r=r_chunk, w=w_win)
    )()
    jax.block_until_ready(tiles_cm0)
    tiles_t0 = jax.jit(
        lambda t: t.reshape(4, D, D, D, K).transpose(4, 0, 1, 2, 3)
    )(tiles_cm0)
    jax.block_until_ready(tiles_t0)
    acc_slots0 = jax.jit(
        lambda t: tile_sweep_pallas(t, k=K, d=D, ws=WS, eps=0.1)
    )(tiles_t0)
    jax.block_until_ready(acc_slots0)

    def jitter(x):
        # force re-execution without changing shapes/values materially
        return x * (1 + jnp.float32(0) * 1e-30)

    # ---- stage: full current step (ground truth) ----
    def mk_full():
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            a = _barnes_hut_forces(
                p, mass, 1.0, 0.1, 0.5, levels=LEVELS, window=2048,
                near_engine="tiles", near_k=K, multipole_order=2,
                near_impl="pallas")
            return a, None
        return body, jnp.zeros((N, 3))

    # ---- build_sorted_grid pieces ----
    def mk_grid_total():
        def body(c, _):
            g = build_sorted_grid(pos0 * (1 + c[0, 0] * 1e-30), mass,
                                  coords0, D)
            return g.psort[:, :3], None
        return body, jnp.zeros((N, 3))

    def mk_argsort():
        def body(c, _):
            return jnp.argsort(ids0 + c[0]).astype(jnp.int32), None
        return body, jnp.zeros((N,), jnp.int32)

    def mk_psort_gather():
        def body(c, _):
            order = grid0.order + c[0] * 0
            ps = jnp.concatenate([pos0, mass[:, None]], axis=-1)[order]
            cs = coords0[order]
            return order + cs[:, 0] * 0 + ps[:, 0].astype(jnp.int32) * 0, None
        return body, jnp.zeros((N,), jnp.int32)

    def mk_cellstart_scatter():
        def body(c, _):
            sid = ids_sorted0 + c[0] * 0
            first = jnp.full((nc + 1,), N, jnp.int32).at[sid].min(arange)
            cs = jnp.flip(jax.lax.cummin(jnp.flip(first)))
            return cs[:N] * 0 + c, None
        return body, jnp.zeros((N,), jnp.int32)

    def mk_rank_cummax():
        # scatter-free rank: boundary + cummax of boundary positions
        def body(c, _):
            sid = ids_sorted0 + c[0] * 0
            boundary = jnp.concatenate(
                [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
            seg_start = jax.lax.cummax(jnp.where(boundary, arange, 0))
            rank = arange - seg_start
            return rank, None
        return body, jnp.zeros((N,), jnp.int32)

    def mk_chunkstarts_searchsorted():
        # chunk starts for scatter/moments windows, scatter-free
        q = jnp.concatenate([c0, jnp.arange(0, nc + 1, 256, dtype=jnp.int32)])

        def body(c, _):
            sid = ids_sorted0 + c[0] * 0
            s = jnp.searchsorted(sid, q).astype(jnp.int32)
            return s * 0 + c[: s.shape[0]] + s, None
        return body, jnp.zeros((nc,), jnp.int32)

    # ---- moments + pyramid ----
    def mk_moments():
        def body(c, _):
            g = jax.tree.map(jitter, grid0)
            packed, miss = _sorted_finest_moments(
                g, ids_sorted0, lo, cell, D, 2)
            return packed[..., 0] + c * 0 + miss, None
        return body, jnp.zeros((D, D, D))

    def mk_pyramid_up():
        packed0, _ = jax.jit(
            lambda: _sorted_finest_moments(grid0, ids_sorted0, lo, cell,
                                           D, 2)
        )()

        def body(c, _):
            pyr = pyramid_from_packed(
                packed0 * (1 + c[0, 0, 0] * 1e-30), lo, cell, LEVELS, 2)
            return pyr.masses[0], None
        return body, jnp.zeros((D, D, D))

    def mk_far():
        packed0, _ = jax.jit(
            lambda: _sorted_finest_moments(grid0, ids_sorted0, lo, cell,
                                           D, 2)
        )()
        pyr0 = jax.jit(
            lambda pk: pyramid_from_packed(pk, lo, cell, LEVELS, 2)
        )(packed0)

        def body(c, _):
            pyr = jax.tree.map(
                lambda x: x * (1 + c * 1e-30) if hasattr(x, "ndim")
                and x.ndim >= 3 else x, pyr0)
            a, j, h = far_field_grid(pyr, WS, 1.0, 0.1, LEVELS)
            return c * 0 + jnp.sum(a) + jnp.sum(j) + jnp.sum(h), None
        return body, jnp.zeros(())

    # ---- near-field pieces ----
    def mk_scatter_tiles():
        def body(c, _):
            ps = grid0.psort * (1 + c[0, 0] * 1e-30)
            t = monotone_scatter_tiles(
                ps, dest0, starts0, lo, cell, k=K, d=D, r=r_chunk, w=w_win)
            return ps[:, :2] + t[0, 0] * 0, None
        return body, jnp.zeros((N, 2))

    def mk_tiles_transpose():
        def body(c, _):
            t = tiles_cm0 * (1 + c[0, 0] * 1e-30)
            tt = t.reshape(4, D, D, D, K).transpose(4, 0, 1, 2, 3)
            return tt[:, :, 0, 0, :2].reshape(K, 8), None
        return body, jnp.zeros((K, 8))

    def mk_sweep_posttransposed():
        def body(c, _):
            t = tiles_t0 * (1 + c[0, 0, 0, 0, 0] * 1e-30)
            a = tile_sweep_pallas(t, k=K, d=D, ws=WS, eps=0.1)
            return a[:1], None
        return body, jnp.zeros((1,) + acc_slots0.shape[1:])

    def mk_sweep_pretransposed():
        # input already (D, 4, K, D, D): measures kernel + pad only
        tp = jax.jit(lambda t: t.transpose(2, 1, 0, 3, 4))(tiles_t0)
        jax.block_until_ready(tp)

        def body(c, _):
            t = tp * (1 + c[0, 0, 0, 0, 0] * 1e-30)
            a = tile_sweep_pallas(t, k=K, d=D, ws=WS, eps=0.1,
                                  pre_transposed=True)
            return a[:1], None
        return body, jnp.zeros((1,) + acc_slots0.shape[1:])

    def mk_pickup_total():
        def body(c, _):
            a = acc_slots0 * (1 + c[0, 0] * 1e-30)
            acc_t = a.transpose(2, 3, 4, 0, 1).reshape(nc * K, 3)
            rank_read = jnp.minimum(rank0, K - 1)
            acc_sorted = acc_t[ids_sorted0 * K + rank_read]
            acc_sorted = jnp.where((rank0 < K)[:, None], acc_sorted, 0.0)
            return unsort_rows(acc_sorted, grid0.order), None
        return body, jnp.zeros((N, 3))

    def mk_pickup_transpose():
        def body(c, _):
            a = acc_slots0 * (1 + c[0, 0] * 1e-30)
            acc_t = a.transpose(2, 3, 4, 0, 1).reshape(nc * K, 3)
            return acc_t[:N] * 1.0, None
        return body, jnp.zeros((N, 3))

    def mk_pickup_gather_sortedonly():
        acc_t0 = jax.jit(
            lambda a: a.transpose(2, 3, 4, 0, 1).reshape(nc * K, 3)
        )(acc_slots0)
        jax.block_until_ready(acc_t0)

        def body(c, _):
            a = acc_t0 * (1 + c[0, 0] * 1e-30)
            rank_read = jnp.minimum(rank0, K - 1)
            acc_sorted = a[ids_sorted0 * K + rank_read]
            return jnp.where((rank0 < K)[:, None], acc_sorted, 0.0), None
        return body, jnp.zeros((N, 3))

    def mk_unsort():
        def body(c, _):
            rows = c * (1 + 1e-30)
            return unsort_rows(rows, grid0.order), None
        return body, jnp.ones((N, 3))

    # ---- far-field pickup (the packed gather + expansion eval) ----
    def mk_far_pickup():
        packed0, _ = jax.jit(
            lambda: _sorted_finest_moments(grid0, ids_sorted0, lo, cell,
                                           D, 2)
        )()
        pyr0 = jax.jit(
            lambda pk: pyramid_from_packed(pk, lo, cell, LEVELS, 2)
        )(packed0)
        afjh = jax.jit(
            lambda: far_field_grid(pyr0, WS, 1.0, 0.1, LEVELS)
        )()
        jax.block_until_ready(afjh)
        a_far, j_far, h_far = afjh

        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            centers = lo + (coords0.astype(p.dtype) + 0.5) * cell
            parts = [a_far, j_far, h_far]
            packed_g = jnp.concatenate(parts, axis=-1)
            cid = ids0
            vals = packed_g.reshape(nc, packed_g.shape[-1])[cid]
            delta = p - centers
            pick = vals[:, :3] + sym_matvec(vals[:, 3:9], delta)
            pick = pick + 0.5 * sym_matvec(
                sym3_matvec(vals[:, 9:19], delta), delta)
            return pick, None
        return body, jnp.zeros((N, 3))

    bench("FULL BH step (current, pallas)", mk_full)
    bench("build_sorted_grid total", mk_grid_total)
    bench("  argsort", mk_argsort)
    bench("  psort+csort gathers", mk_psort_gather)
    bench("  cell_start at[].min scatter + cummin", mk_cellstart_scatter)
    bench("  ALT rank via boundary+cummax", mk_rank_cummax)
    bench("  ALT chunk starts via searchsorted", mk_chunkstarts_searchsorted)
    bench("moments segsum (sorted)", mk_moments)
    bench("pyramid upward pass", mk_pyramid_up)
    bench("far field taps", mk_far)
    bench("monotone_scatter_tiles w=640", mk_scatter_tiles)
    bench("tiles_cm -> (K,4,D,D,D) transpose", mk_tiles_transpose)
    bench("tile_sweep incl in-jit transpose+pad", mk_sweep_posttransposed)
    bench("tile_sweep pre_transposed (kernel+pad)", mk_sweep_pretransposed)
    bench("slot pickup total (incl unsort)", mk_pickup_total)
    bench("  pickup transpose only", mk_pickup_transpose)
    bench("  pickup gather (sorted out)", mk_pickup_gather_sortedonly)
    bench("  unsort (argsort+gather)", mk_unsort)
    bench("far-field pickup (19ch gather + eval)", mk_far_pickup)


if __name__ == "__main__":
    main()
