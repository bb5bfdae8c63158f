"""Benchmark the v3 Pallas near-field tile sweep vs the XLA path.

Usage: python scripts/profile_near_pallas.py [N] [K]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
LEVELS = 6
D = 1 << LEVELS
REPS = 10


def bench(name, make_body, reps=REPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    def sync(c):
        return float(jnp.sum(jax.tree_util.tree_leaves(c)[0]))

    try:
        chk = sync(run(init))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(init))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:46s} {best / reps * 1000:8.2f} ms/iter "
              f"(chk {chk:.6e})", flush=True)
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:400]}",
              flush=True)


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()} N={N} L={LEVELS} K={K}",
          flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    lo = jnp.min(pos0, axis=0)
    hi = jnp.max(pos0, axis=0)
    cell = jnp.maximum(jnp.max(hi - lo), 1e-6) * (1.0 + 1e-5) / D

    # Build the transposed tiles ONCE in XLA (same code as tile_sweep.py).
    coords = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)
    g = build_sorted_grid(pos0, mass, coords, D)
    ids_sorted = (g.csort[:, 0] * D + g.csort[:, 1]) * D + g.csort[:, 2]
    ar = jnp.arange(N, dtype=jnp.int32)
    rank = ar - g.cell_start[ids_sorted]
    flat = ids_sorted * (K + 1) + jnp.minimum(rank, K)
    cgrid = jnp.stack(
        jnp.meshgrid(jnp.arange(D), jnp.arange(D), jnp.arange(D),
                     indexing="ij"), axis=-1).astype(pos0.dtype)
    centers = lo + (cgrid + 0.5) * cell
    nc = D * D * D
    init = jnp.concatenate(
        [jnp.broadcast_to(centers[:, :, :, None, :], (D, D, D, K + 1, 3)),
         jnp.zeros((D, D, D, K + 1, 1), pos0.dtype)], axis=-1,
    ).reshape(nc * (K + 1), 4)
    tiles = init.at[flat].set(g.psort).reshape(D, D, D, K + 1, 4)[
        :, :, :, :K, :]
    tiles_t = jax.device_put(tiles.transpose(3, 4, 0, 1, 2))
    jax.block_until_ready(tiles_t)

    # correctness: pallas vs XLA sweep on a small slice of cells is hard to
    # isolate; instead compare full slot accs between engines.
    def xla_sweep(tt):
        import nbody_tpu.ops.tile_sweep as ts
        # reproduce the XLA offset scan from tile_sweep.py
        r = range(-1, 2)
        offs = np.asarray([(x, y, z) for x in r for y in r for z in r],
                          np.int32)
        pad = [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1)]
        tiles_pad = jnp.pad(tt, pad)
        offsets_arr = jnp.asarray(offs + 1)
        pc = D * D * D
        tgt = tt.reshape(K, 4, pc)
        eps2 = 0.01

        def body(acc, off):
            zero = jnp.zeros((), off.dtype)
            src = jax.lax.dynamic_slice(
                tiles_pad, (zero, zero, off[0], off[1], off[2]),
                (K, 4, D, D, D)).reshape(K, 4, pc)
            sx, sy, sz, sm = src[:, 0], src[:, 1], src[:, 2], src[:, 3]
            rows = []
            for kt in range(K):
                dx = sx - tgt[kt, 0]
                dy = sy - tgt[kt, 1]
                dz = sz - tgt[kt, 2]
                r2_raw = dx * dx + dy * dy + dz * dz
                inv = jax.lax.rsqrt(r2_raw + eps2)
                w = sm * (inv * inv * inv)
                w = jnp.where(r2_raw == 0.0, 0.0, w)
                rows.append(jnp.stack([
                    jnp.sum(w * dx, axis=0),
                    jnp.sum(w * dy, axis=0),
                    jnp.sum(w * dz, axis=0)]))
            return acc + jnp.stack(rows, axis=0), None

        acc0 = jnp.zeros((K, 3, pc), jnp.float32)
        acc, _ = jax.lax.scan(body, acc0, offsets_arr)
        return acc.reshape(K, 3, D, D, D)

    a_p = jax.jit(lambda tt: tile_sweep_pallas(tt, k=K, d=D, ws=1, eps=0.1))(
        tiles_t)
    a_x = jax.jit(xla_sweep)(tiles_t)
    diff = float(jnp.max(jnp.abs(a_p - a_x)))
    scale = float(jnp.max(jnp.abs(a_x)))
    print(f"pallas vs xla max abs diff: {diff:.3e} (scale {scale:.3e})",
          flush=True)

    def mk_pallas():
        def body(c, _):
            tt = tiles_t * (1 + c * 1e-30)
            a = tile_sweep_pallas(tt, k=K, d=D, ws=1, eps=0.1)
            return jnp.sum(a) + c * 0, None
        return body, jnp.zeros(())

    def mk_xla():
        def body(c, _):
            tt = tiles_t * (1 + c * 1e-30)
            a = xla_sweep(tt)
            return jnp.sum(a) + c * 0, None
        return body, jnp.zeros(())

    bench(f"pallas tile sweep k={K}", mk_pallas)
    bench(f"xla tile sweep k={K}", mk_xla)


if __name__ == "__main__":
    main()
