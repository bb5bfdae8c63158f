"""TPU profile r3e — prologue + moments + far-pickup attribution at 1M.

Follow-up to profile_r3d: the in-pipeline buckets are prologue 16.2,
moments 16.1, far taps 8.3, far pickup 8.0, near chain 57.7 (full 94.09).
This batch isolates the candidates inside prologue/moments/far-pickup and
A/Bs the scatter-free cell_start and segsum window sizes.

Usage: python scripts/profile_r3e.py [N]
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
NC = D * D * D


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
        _outer6,
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
        _sorted_finest_moments,
        sym_matvec,
        sym3_matvec,
    )
    from nbody_tpu.ops.pallas_scatter import monotone_segment_sum
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()} N={N} L={LEVELS}", flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    lo, cell = pyramid_geometry(
        jnp.min(pos0, axis=0), jnp.max(pos0, axis=0), LEVELS)
    coords0 = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)
    ids0 = (coords0[:, 0] * D + coords0[:, 1]) * D + coords0[:, 2]
    grid0 = jax.jit(lambda p: build_sorted_grid(p, mass, coords0, D))(pos0)
    jax.block_until_ready(grid0)
    ids_sorted0 = (
        grid0.csort[:, 0] * D + grid0.csort[:, 1]
    ) * D + grid0.csort[:, 2]
    arange = jnp.arange(N, dtype=jnp.int32)

    # miss audit values at candidate segsum windows (one-off, not timed)
    r_chunk = 256
    n_chunks = -(-NC // r_chunk)
    car = jnp.arange(n_chunks, dtype=jnp.int32)
    starts0 = grid0.cell_start[jnp.minimum(car * r_chunk, NC)]
    ends0 = grid0.cell_start[jnp.minimum((car + 1) * r_chunk, NC)]
    for w in (1536, 2048, 2560):
        miss = int(jnp.sum(
            jnp.maximum(ends0 - (starts0 // 128) * 128 - w, 0)))
        print(f"segsum window miss @ w={w}: {miss}", flush=True)

    def mk_minmax_coords():
        def body(c, _):
            p = pos0 * (1 + c[0] * 1e-30)
            lo_, cell_ = pyramid_geometry(
                jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
            crd = jnp.clip(((p - lo_) / cell_).astype(jnp.int32), 0, D - 1)
            ids = (crd[:, 0] * D + crd[:, 1]) * D + crd[:, 2]
            return jnp.asarray([jnp.sum(ids), 0, 0, 0, 0, 0, 0, 0],
                               jnp.int32) + c * 0, None
        return body, jnp.zeros((8,), jnp.int32)

    def mk_cellstart_scatter():
        def body(c, _):
            sid = ids_sorted0 + c[0] * 0
            first = jnp.full((NC + 1,), N, jnp.int32).at[sid].min(arange)
            cs = jnp.flip(jax.lax.cummin(jnp.flip(first)))
            return cs[:8] + c * 0, None
        return body, jnp.zeros((8,), jnp.int32)

    def mk_cellstart_counts():
        # scatter-free: per-cell counts via an extra segsum channel →
        # exclusive cumsum (here: counts channel alone, w as moments)
        def body(c, _):
            sid = ids_sorted0 + c[0] * 0
            ones = jnp.ones((N, 1), jnp.float32)
            counts_cm = monotone_segment_sum(
                ones, sid, starts0, num_dest=NC, r=r_chunk, w=2560)
            counts = counts_cm[0].astype(jnp.int32)
            cs = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
            return cs[:8] + c * 0, None
        return body, jnp.zeros((8,), jnp.int32)

    def mk_segsum(w):
        def make():
            def body(c, _):
                psort = grid0.psort * (1 + c[0] * 1e-30)
                ctr = lo + (grid0.csort.astype(jnp.float32) + 0.5) * cell
                mm = psort[:, 3:4]
                xr = psort[:, :3] - ctr
                vals = jnp.concatenate(
                    [mm, mm * xr, mm * _outer6(xr)], axis=-1)
                packed_cm = monotone_segment_sum(
                    vals, ids_sorted0, starts0, num_dest=NC,
                    r=r_chunk, w=w)
                return packed_cm[:, :8].sum(axis=0), None
            return body, jnp.zeros((8,))
        return make

    def mk_transpose_only():
        packed_cm0 = jax.jit(
            lambda: _sorted_finest_moments(
                grid0, ids_sorted0, lo, cell, D, 2)[0]
        )()
        jax.block_until_ready(packed_cm0)
        flat = packed_cm0.reshape(NC, 10).T  # (10, NC) channel-major

        def body(c, _):
            x = flat * (1 + c[0] * 1e-30)
            return x.T.reshape(D, D, D, 10)[0, 0, :8, 0], None
        return lambda: (body, jnp.zeros((8,)))

    # far pickup variants
    packed0, _ = jax.jit(
        lambda: _sorted_finest_moments(grid0, ids_sorted0, lo, cell, D, 2)
    )()
    pyr0 = jax.jit(
        lambda pk: pyramid_from_packed(pk, lo, cell, LEVELS, 2)
    )(packed0)
    afjh = jax.jit(lambda: far_field_grid(pyr0, 1, 1.0, 0.1, LEVELS))()
    jax.block_until_ready(afjh)
    a_far, j_far, h_far = afjh
    packed_flat = jax.jit(
        lambda: jnp.concatenate([a_far, j_far, h_far], axis=-1)
        .reshape(NC, 19)
    )()
    jax.block_until_ready(packed_flat)

    def mk_farpick(sorted_ids: bool, prebuilt: bool):
        def make():
            def body(c, _):
                if sorted_ids:
                    p = grid0.psort[:, :3] * (1 + c[0] * 1e-30)
                    crd = grid0.csort
                    cid = ids_sorted0
                else:
                    p = pos0 * (1 + c[0] * 1e-30)
                    crd = coords0
                    cid = ids0
                centers = lo + (crd.astype(p.dtype) + 0.5) * cell
                if prebuilt:
                    vals = packed_flat[cid]
                else:
                    pg = jnp.concatenate([a_far, j_far, h_far], axis=-1)
                    vals = pg.reshape(NC, 19)[cid]
                delta = p - centers
                pick = vals[:, :3] + sym_matvec(vals[:, 3:9], delta)
                pick = pick + 0.5 * sym_matvec(
                    sym3_matvec(vals[:, 9:19], delta), delta)
                return pick[0] + jnp.zeros((8,)), None
            return body, jnp.zeros((8,))
        return make

    # ---- full-step A/B: plain vs sorted stepping ----
    from nbody_tpu.ops.barnes_hut import _barnes_hut_forces
    from nbody_tpu.ops.integrator import (
        ParticleState,
        initialize_forces,
        sorted_state_from,
        sorted_verlet_step,
        verlet_step,
    )

    def force(p, m):
        return _barnes_hut_forces(
            p, m, 1.0, 0.1, 0.5, levels=LEVELS, window=2048,
            near_engine="tiles", near_k=16, multipole_order=2,
            near_impl="pallas")

    def sforce(p, m):
        return _barnes_hut_forces(
            p, m, 1.0, 0.1, 0.5, levels=LEVELS, window=2048,
            near_engine="tiles", near_k=16, multipole_order=2,
            near_impl="pallas", sorted_output=True)

    st0 = ParticleState(
        pos=pos0, vel=jnp.zeros_like(pos0), acc=jnp.zeros_like(pos0),
        mass=mass, time=jnp.zeros(()))
    st0 = jax.jit(lambda s: initialize_forces(s, force))(st0)
    jax.block_until_ready(st0)
    ss0 = sorted_state_from(st0)

    def mk_plain_step():
        def body(s, _):
            return verlet_step(s, force, 1e-3), None
        return lambda: (body, st0)

    def mk_sorted_step():
        def body(s, _):
            return sorted_verlet_step(s, sforce, 1e-3), None
        return lambda: (body, ss0)

    bench("FULL plain verlet step", mk_plain_step())
    bench("FULL sorted verlet step", mk_sorted_step())

    bench("minmax + coords + ids compute", mk_minmax_coords)
    bench("cell_start: at[].min + cummin (current)", mk_cellstart_scatter)
    bench("cell_start: counts-segsum + cumsum", mk_cellstart_counts)
    bench("moments segsum w=2560 (isolated)", mk_segsum(2560))
    bench("moments segsum w=2048", mk_segsum(2048))
    bench("moments segsum w=1536", mk_segsum(1536))
    bench("packed_cm.T transpose only", mk_transpose_only())
    bench("far pickup orig-order, concat in-jit", mk_farpick(False, False))
    bench("far pickup sorted-order, concat in-jit", mk_farpick(True, False))
    bench("far pickup sorted-order, prebuilt flat", mk_farpick(True, True))


if __name__ == "__main__":
    main()
