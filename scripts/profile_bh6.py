"""TPU profile round 6 — post-Pallas-near breakdown.

Same trustworthy harness as profile_bh5 (real-readback warmup, min-of-3,
scan-amortized). New in r6: the Pallas VMEM near-field sweep is the
default, so this measures (a) the full BH step, (b) the Pallas sweep
alone on prebuilt tiles, (c) full near field (build + sweep + pickup) —
(c) − (b) isolates the tiles-build + pickup overhead that is the next
optimization target.

Usage: python scripts/profile_bh6.py [N]
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
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import barnes_hut_forces, build_pyramid
    from nbody_tpu.ops.forces import make_force_fn
    from nbody_tpu.ops.integrator import initialize_forces, make_multi_step
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import tile_near_field
    from nbody_tpu.ops.spatial_hash import spatial_hash_forces
    from nbody_tpu.types import (
        ForceMethod, SimulationConfig, SphericalDistParams)

    LEVELS = 6
    D = 1 << LEVELS
    K = 16
    print(f"backend={jax.default_backend()} N={N} L={LEVELS} K={K}",
          flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    pyr = build_pyramid(pos0, mass, LEVELS)
    lo_, cell_ = pyr.lo, pyr.cell

    # Prebuilt transposed tiles for the sweep-alone phase.
    coords = jnp.clip(((pos0 - lo_) / cell_).astype(jnp.int32), 0, D - 1)
    g = build_sorted_grid(pos0, mass, coords, D)
    ids_sorted = (g.csort[:, 0] * D + g.csort[:, 1]) * D + g.csort[:, 2]
    ar = jnp.arange(N, dtype=jnp.int32)
    rank = ar - g.cell_start[ids_sorted]
    flat = ids_sorted * (K + 1) + jnp.minimum(rank, K)
    cgrid = jnp.stack(
        jnp.meshgrid(jnp.arange(D), jnp.arange(D), jnp.arange(D),
                     indexing="ij"), axis=-1).astype(pos0.dtype)
    centers = lo_ + (cgrid + 0.5) * cell_
    nc = D * D * D
    init = jnp.concatenate(
        [jnp.broadcast_to(centers[:, :, :, None, :], (D, D, D, K + 1, 3)),
         jnp.zeros((D, D, D, K + 1, 1), pos0.dtype)], axis=-1,
    ).reshape(nc * (K + 1), 4)
    tiles = init.at[flat].set(g.psort).reshape(D, D, D, K + 1, 4)[
        :, :, :, :K, :]
    tiles_t = jax.device_put(tiles.transpose(3, 4, 0, 1, 2))
    jax.block_until_ready(tiles_t)

    def mk_sweep_alone():
        def body(c, _):
            tt = tiles_t * (1 + c * 1e-30)
            a = tile_sweep_pallas(tt, k=K, d=D, ws=1, eps=0.1)
            return jnp.sum(a) + c * 0, None
        return body, jnp.zeros(())

    def mk_near_full():
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            cs = jnp.clip(((p - lo_) / cell_).astype(jnp.int32), 0, D - 1)
            a, _ = tile_near_field(
                p, mass, cs, lo_, cell_, d=D, ws=1, k=K, G=1.0, eps=0.1)
            return a, None
        return body, jnp.zeros((N, 3))

    def mk_full_bh():
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            a = barnes_hut_forces(
                p, mass, 1.0, 0.1, 0.5, levels=LEVELS,
                near_engine="tiles", near_k=K, multipole_order=2)
            return a, None
        return body, jnp.zeros((N, 3))

    def mk_verlet_step():
        config = SimulationConfig(
            particle_count=N, force_method=ForceMethod.BARNES_HUT,
            bh_max_level=LEVELS, dt=1e-3)
        force_fn = make_force_fn(config)
        s0 = initialize_forces(state, force_fn)
        step = make_multi_step(force_fn, 1e-3, 1)

        def body(s, _):
            return step(s), None
        return body, s0

    def mk_hash():
        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            a = spatial_hash_forces(
                p, mass, 1.0, 0.1, cutoff=2.0, cell_size=1.0,
                cap=64, window=2048)
            return a, None
        return body, jnp.zeros((N, 3))

    t_sweep = bench("pallas near sweep alone k=16", mk_sweep_alone)
    t_near = bench("near field full (build+sweep+pickup)", mk_near_full)
    if t_sweep and t_near:
        print(f"{'  -> tiles build + pickup overhead':46s} "
              f"{(t_near - t_sweep) * 1000:8.2f} ms/iter", flush=True)
    bench("FULL BH force o2 L6 k16 (pallas near)", mk_full_bh)
    bench("FULL BH verlet step (bench.py config)", mk_verlet_step)
    bench("FULL spatial hash w=2048", mk_hash)
    print("exit=0", flush=True)


if __name__ == "__main__":
    main()
