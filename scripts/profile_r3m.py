"""TPU profile r3m — far-chain pieces + fused-extra step.

r3l: far-rest = 18.1 ms (moments+pyramid+taps after the shared grid),
far pickup = 9.2, verlet glue = 10.5. This bisects the far side and
re-measures the composed step after the extra-payload fusion (the
integrator's ~3 ms payload gather now rides the engine's sort gather).

Rows:
  m1  moments segsum w=2560 (current default)
  m2  moments segsum w=1280 (half the MXU compares, loops when dense)
  m3  pyramid_from_packed (fixed packed)
  m4  far_field_grid (fixed pyramid)
  m5  far pickup (fixed grids: gather + delta + sym math)
  G   full sorted BH Verlet step via library (fused extra payload)

Usage: python scripts/profile_r3m.py
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
        _outer6,
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
        sym3_matvec,
        sym_matvec,
    )
    from nbody_tpu.ops.pallas_scatter import monotone_segment_sum
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    vel0 = jax.device_put(state.vel)
    jax.block_until_ready((pos0, mass, vel0))

    lo, cell = pyramid_geometry(
        jnp.min(pos0, axis=0), jnp.max(pos0, axis=0), LEVELS)
    coords0 = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)
    grid0 = jax.jit(
        lambda p: build_sorted_grid(p, mass, coords0, D)
    )(pos0)
    jax.block_until_ready(grid0.psort)
    ids0 = grid0.ids
    nc = D * D * D

    # moment rows (order 2) in sorted order, fixed
    ctr = lo + (grid0.csort.astype(jnp.float32) + 0.5) * cell
    m_col = grid0.psort[:, 3:4]
    xr = grid0.psort[:, :3] - ctr
    vals0 = jnp.concatenate([m_col, m_col * xr, m_col * _outer6(xr)], -1)
    r_chunk = 256
    n_chunks = -(-nc // r_chunk)
    car = jnp.arange(n_chunks, dtype=jnp.int32)
    starts0 = grid0.cell_start[jnp.minimum(car * r_chunk, nc)]
    ends0 = grid0.cell_start[jnp.minimum((car + 1) * r_chunk, nc)]
    span0 = ends0 - (starts0 // 128) * 128

    def mk_segsum(w):
        def rung(v):
            return monotone_segment_sum(
                v, ids0, starts0, num_dest=nc, r=r_chunk, w=w,
                nwin=-(-span0 // w),
            )
        return rung

    for w in (2560, 1280, 768):
        bench(f"m1 moments segsum w={w}",
              mk(mk_segsum(w), vals0))

    packed0 = jax.jit(
        lambda v: monotone_segment_sum(
            v, ids0, starts0, num_dest=nc, r=r_chunk, w=2560,
            nwin=-(-span0 // 2560),
        ).T.reshape(D, D, D, 10)
    )(vals0)
    jax.block_until_ready(packed0)

    bench("m3 pyramid_from_packed",
          mk(lambda pk: pyramid_from_packed(pk, lo, cell, LEVELS, 2),
             packed0))

    pyr0 = jax.jit(
        lambda pk: pyramid_from_packed(pk, lo, cell, LEVELS, 2)
    )(packed0)
    jax.block_until_ready(pyr0.masses[0])

    def rung_far(dummy):
        # tie the pyramid to the loop-carried perturbation via masses[-1]
        return far_field_grid(pyr0, 1, G, EPS, LEVELS)

    # NOTE: constant-input rung — XLA may hoist; perturb finest mass.
    def rung_far_live(pk):
        pyr = pyramid_from_packed(pk, lo, cell, LEVELS, 2)
        return far_field_grid(pyr, 1, G, EPS, LEVELS)

    bench("m4 pyramid+far_field_grid (live)", mk(rung_far_live, packed0))

    grids0 = jax.jit(rung_far_live)(packed0)
    jax.block_until_ready(grids0[0])
    a_far0, j_far0, h_far0 = grids0
    parts = [a_far0, j_far0, h_far0]
    packed_g0 = jnp.concatenate(parts, axis=-1)

    def rung_pickup(pg):
        vals = pg.reshape(D**3, 19)[ids0]
        delta = grid0.psort[:, :3] - ctr
        pick = vals[:, :3] + sym_matvec(vals[:, 3:9], delta)
        pick = pick + 0.5 * sym_matvec(
            sym3_matvec(vals[:, 9:19], delta), delta)
        return pick

    bench("m5 far pickup (gather+sym math)", mk(rung_pickup, packed_g0))

    # G: the composed library step with fused extra payload
    from nbody_tpu.ops.forces import make_force_fn, make_sorted_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_sorted_multi_step,
    )
    from nbody_tpu.types import ForceMethod, SimulationConfig

    config = SimulationConfig(
        particle_count=N,
        force_method=ForceMethod.BARNES_HUT,
        bh_max_level=LEVELS,
        dt=1e-3,
    )
    st = state
    st = jax.jit(
        lambda s: initialize_forces(s, make_force_fn(config, pos_hint=s.pos))
    )(st)
    st.block_until_ready()
    sf = make_sorted_force_fn(config, pos_hint=st.pos)
    multi = jax.jit(make_sorted_multi_step(sf, config.dt, REPS))
    out = multi(st)
    chk = float(jnp.sum(out.pos[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = multi(out)
        chk = float(jnp.sum(out.pos[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{'G  full sorted BH Verlet step (fused extra)':52s} "
          f"{best / REPS * 1000:8.2f} ms/iter (chk {chk:.4e}) "
          f"= {REPS / best:.2f} steps/s", flush=True)


if __name__ == "__main__":
    main()
