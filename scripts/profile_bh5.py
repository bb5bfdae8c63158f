"""TPU profile round 5 — trustworthy harness (true-sync warmup, min-of-3).

Earlier rounds (profile_bh3/bh4) warmed up with block_until_ready, which
UNDER-REPORTS through the axon relay: each fresh executable's one-time load
(~0.5 s) leaked into the first timed run, inflating every number by
~+90 ms/iter at reps=5. This harness syncs with a real scalar D2H readback
and reports the best of 3 timed runs.

Usage: python scripts/profile_bh5.py [N]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = 10


def bench(name, make_body, reps=REPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    def sync(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return float(jnp.sum(leaf))  # real device→host readback

    try:
        chk = sync(run(init))  # compile + load + first exec, fully drained
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(init))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:46s} {best / reps * 1000:8.2f} ms/iter "
              f"(chk {chk:.4e})", flush=True)
        return best / reps
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        barnes_hut_forces, build_pyramid, far_field_grid)
    from nbody_tpu.ops.pallas_sort import bitonic_argsort
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import tile_near_field
    from nbody_tpu.ops.spatial_hash import spatial_hash_forces
    from nbody_tpu.types import SphericalDistParams

    LEVELS = 6
    D = 1 << LEVELS
    print(f"backend={jax.default_backend()} N={N} L={LEVELS}", flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    lo = jnp.min(pos0, axis=0)
    hi = jnp.max(pos0, axis=0)
    cell = jnp.maximum(jnp.max(hi - lo), 1e-6) * (1.0 + 1e-5) / D
    ids0 = jnp.asarray(
        (jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)
         @ jnp.asarray([D * D, D, 1], jnp.int32)))

    def mk_argsort():
        def body(c, _):
            return jnp.argsort(ids0 + c[0]).astype(jnp.int32), None
        return body, jnp.zeros((N,), jnp.int32)

    def mk_bitonic():
        def body(c, _):
            k, v = bitonic_argsort(ids0 + c[0])
            return v, None
        return body, jnp.zeros((N,), jnp.int32)

    def mk_pyr2():
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            pyr = build_pyramid(p, mass, LEVELS, order=2)
            return p + pyr.quads[0][0, 0, 0, 0] * 0, None
        return body, pos0

    def mk_far(ws):
        pyr = build_pyramid(pos0, mass, LEVELS, order=2)

        def body(c, _):
            pyr2 = jax.tree.map(
                lambda x: x * (1 + c * 1e-30) if x.ndim >= 3 else x, pyr)
            a, j, h = far_field_grid(pyr2, ws, 1.0, 0.1, LEVELS)
            return c * 0 + jnp.sum(a) + jnp.sum(j) + jnp.sum(h), None
        return body, jnp.zeros(())

    def mk_near(k):
        pyr = build_pyramid(pos0, mass, LEVELS)
        lo_, cell_ = pyr.lo, pyr.cell

        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            coords = jnp.clip(
                ((p - lo_) / cell_).astype(jnp.int32), 0, D - 1)
            a, _ = tile_near_field(
                p, mass, coords, lo_, cell_, d=D, ws=1, k=k, G=1.0, eps=0.1)
            return a, None
        return body, jnp.zeros((N, 3))

    def mk_full(k):
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            a = barnes_hut_forces(
                p, mass, 1.0, 0.1, 0.5, levels=LEVELS,
                near_engine="tiles", near_k=k, multipole_order=2)
            return a, None
        return body, jnp.zeros((N, 3))

    def mk_hash():
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            a = spatial_hash_forces(
                p, mass, 1.0, 0.1, cutoff=2.0, cell_size=1.0, cap=64,
                window=2048, block_size=512)
            return a, None
        return body, jnp.zeros((N, 3))

    bench("xla argsort", mk_argsort)
    bench("pallas bitonic argsort", mk_bitonic)
    bench("pyramid build order=2 L6", mk_pyr2)
    bench("far field (tap-matmul) ws=1", lambda: mk_far(1))
    bench("near tiles XLA k=16", lambda: mk_near(16))
    bench("near tiles XLA k=24", lambda: mk_near(24))
    bench("FULL BH o2 L6 k=16", lambda: mk_full(16))
    bench("FULL spatial hash w=2048", mk_hash)


if __name__ == "__main__":
    main()
