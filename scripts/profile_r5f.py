"""TPU profile r5f — CORRECT-PHYSICS re-measurement of the 1M BH cell.

r5e proved the bitcast-ids production path was denormal-flushed on TPU
(physics 100% wrong vs direct-N² ground truth, build degenerately fast),
so every r3/r4 BH phase number is invalid. ids_via_gather is now the
default (sorted_window.build_sorted_grid). This batch re-establishes the
truth table on the 1M dense cold-collapse bench scene:

  g0   ground truth: the now-default sorted call vs direct-N² at 2048
       sample rows (expect max err ≈ 1.8e2 = k-slot overflow rows, med
       ≈ 0.16% — r5e p2)
  r.s  row sorted multi (now via-gather)         — reference semantics
  r.m1 row resort meta cadence 1                 — same, meta producer
  r.a5 row adaptive stale 0.05 cap 16
  t.1  table cadence 1
  t.f  table frozen rung (cadence 33 over 32)
  t.a2/a5/a10  table adaptive (trace: resorts, maxstale)
  eq   table cad-1 vs row meta cad-1, 8 steps (both correct; expect ~0)
  phys table adaptive(0.05) vs table cad-1, 64 steps: dpos/dvel/E-gap;
       128-step finiteness; 512-step adaptive sampled |dE/E| drift
  bis  stage bisect of the correct sort step: sort+gather | +scatter/
       moments | +pyramid/far | +sweep (cumulative jits, real readback)

Usage: python scripts/profile_r5f.py   (one process, one TPU grant)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
S = 2048
STEPS = 32
DT = 1e-3
EPS = 0.1
G = 1.0
THETA = 0.5


@jax.jit
def direct_at(pos, mass, tpos):
    def body(acc, chunk):
        ps, ms = chunk
        dx = ps[None, :, :] - tpos[:, None, :]
        r2 = jnp.sum(dx * dx, axis=-1) + EPS * EPS
        w = ms[None, :] * jax.lax.rsqrt(r2) / r2
        return acc + jnp.einsum("sc,scd->sd", w, dx), None

    C = 10_000
    chunks = (pos.reshape(-1, C, 3), mass.reshape(-1, C))
    acc, _ = jax.lax.scan(body, jnp.zeros_like(tpos), chunks)
    return G * acc


def bench_multi(name, make, state, steps, traced=False):
    try:
        multi = jax.jit(make())
        out = multi(state)
        if traced:
            out = out[0]
        float(out.time)
        best = float("inf")
        trace = None
        for _ in range(3):
            t0 = time.perf_counter()
            o2 = multi(out)
            if traced:
                o2, trace = o2
            chk = float(jnp.sum(o2.pos[0]))
            best = min(best, time.perf_counter() - t0)
        msg = (f"{name:26s} {best / steps * 1000:8.2f} ms/step "
               f"({steps / best:7.2f} steps/s) (chk {chk:.4e})")
        if traced and trace is not None:
            msg += (f" resorts={int(np.asarray(trace[1]).sum()) + 1}"
                    f"/{steps} maxstale={int(np.asarray(trace[0]).max())}")
        print(msg, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def timed_fn(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf[0]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        barnes_hut_forces_frozen,
        barnes_hut_forces_sorted,
        bh_engine_params,
    )
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_adaptive_multi_step,
        make_resort_multi_step,
        make_sorted_multi_step,
        sampled_total_energy,
    )
    from nbody_tpu.ops.table_step import (
        bh_table_params,
        make_table_adaptive_multi_step,
        make_table_multi_step,
    )
    from nbody_tpu.types import (
        ForceMethod,
        SimulationConfig,
        SphericalDistParams,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    cfg = SimulationConfig(
        particle_count=N, force_method=ForceMethod.BARNES_HUT,
        bh_max_level=6, dt=DT,
    )
    ep = bh_engine_params(cfg)
    near_k = ep["near_k"]

    def sf(pos, mass, extra=None):
        return barnes_hut_forces_sorted(
            pos, mass, G, EPS, THETA, levels=6, near_k=near_k, extra=extra,
        )

    sf.route_extra = False
    sf.with_meta = lambda pos, mass: barnes_hut_forces_sorted(
        pos, mass, G, EPS, THETA, levels=6, near_k=near_k,
        with_grid_meta=True,
    )
    sf.frozen = lambda psort, meta: barnes_hut_forces_frozen(
        psort, meta, G, EPS, THETA, levels=6, near_k=near_k,
    )

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0)
    )
    state = jax.jit(
        lambda s: initialize_forces(
            s, lambda po, m: sf(po, m)[0][jnp.argsort(sf(po, m)[2])]
        )
    )(state)
    state.block_until_ready()
    p = bh_table_params(levels=6, near_k=near_k)

    # g0: ground truth of the now-default path
    pos_d = jax.jit(
        lambda s: s.pos + s.vel * DT + (0.5 * DT * DT) * s.acc
    )(state)
    idx = np.arange(0, N, N // S)[:S]
    a_ref = np.asarray(direct_at(pos_d, state.mass, pos_d[jnp.asarray(idx)]))

    @jax.jit
    def standalone(pos, mass):
        acc_s, _ps, order = sf(pos, mass)[:3]
        return acc_s[jnp.argsort(order)]

    a0 = np.asarray(standalone(pos_d, state.mass))[idx]
    da = np.abs(a0 - a_ref).max(axis=1)
    ref = np.abs(a_ref).max()
    print(f"g0 default-path vs direct: max|err|={da.max():.3e} "
          f"med={np.median(da):.3e} (|a|max={ref:.3e}) "
          f"rows>1%={int((da > 1e-2 * ref).sum())}/{S}", flush=True)

    # eq: table cad-1 vs row meta cad-1, 8 steps
    try:
        o_row = jax.jit(make_resort_multi_step(sf, DT, 8, 1))(state)
        o_tab = jax.jit(make_table_multi_step(p, DT, 8, 1))(state)
        dp = float(jnp.max(jnp.abs(o_row.pos - o_tab.pos)))
        dv = float(jnp.max(jnp.abs(o_row.vel - o_tab.vel)))
        print(f"eq table-cad1 vs row-meta1, 8 steps: max|dpos|={dp:.3e} "
              f"max|dvel|={dv:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"eq FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    bench_multi("r.s  row sorted",
                lambda: make_sorted_multi_step(sf, DT, STEPS), state, STEPS)
    bench_multi("r.m1 row resort meta c1",
                lambda: make_resort_multi_step(sf, DT, STEPS, 1),
                state, STEPS)
    bench_multi(
        "r.a5 row adaptive .05",
        lambda: make_adaptive_multi_step(
            sf, DT, STEPS, max_stale_frac=0.05, max_cadence=16),
        state, STEPS)
    bench_multi("t.1  table cad 1",
                lambda: make_table_multi_step(p, DT, STEPS, 1), state, STEPS)
    bench_multi("t.f  table frozen rung",
                lambda: make_table_multi_step(p, DT, STEPS, 33), state, STEPS)
    for frac in (0.02, 0.05, 0.10):
        bench_multi(
            f"t.a{int(frac * 100)} table adaptive",
            lambda frac=frac: make_table_adaptive_multi_step(
                p, DT, STEPS, max_stale_frac=frac, max_cadence=16,
                with_trace=True),
            state, STEPS, traced=True)

    # phys: adaptive(0.05) vs cad-1, 64 steps; 128 finiteness; 512 drift
    try:
        m1 = jax.jit(make_table_multi_step(p, DT, 64, 1))
        ma = jax.jit(make_table_adaptive_multi_step(
            p, DT, 64, max_stale_frac=0.05, max_cadence=16))
        o1, oa = m1(state), ma(state)
        dp = float(jnp.max(jnp.abs(o1.pos - oa.pos)))
        vs = float(jnp.max(jnp.abs(o1.vel)))
        dv = float(jnp.max(jnp.abs(o1.vel - oa.vel)))
        key = jax.random.PRNGKey(7)
        e1 = float(sampled_total_energy(o1, cfg.G, cfg.softening, key=key))
        ea = float(sampled_total_energy(oa, cfg.G, cfg.softening, key=key))
        print(f"phys 64 steps: max|dpos|={dp:.3e} max|dvel|={dv:.3e}"
              f" (|v|max={vs:.3e}) E1={e1:.6e} Ea={ea:.6e}"
              f" relgap={(abs(ea - e1) / abs(e1)):.3e}", flush=True)
        o128 = jax.jit(make_table_adaptive_multi_step(
            p, DT, 128, max_stale_frac=0.05, max_cadence=16))(state)
        print(f"phys 128-step adaptive finite="
              f"{bool(jnp.isfinite(o128.pos).all())}", flush=True)
        e0 = float(sampled_total_energy(state, cfg.G, cfg.softening, key=key))
        o512 = jax.jit(make_table_adaptive_multi_step(
            p, DT, 512, max_stale_frac=0.05, max_cadence=16))(state)
        e512 = float(sampled_total_energy(
            o512, cfg.G, cfg.softening, key=key))
        print(f"phys 512-step adaptive |dE/E|="
              f"{abs(e512 - e0) / abs(e0):.3e} "
              f"finite={bool(jnp.isfinite(o512.pos).all())}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"phys FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # bis: cumulative stage bisect of the correct sort-build step
    from nbody_tpu.ops.barnes_hut import (
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
        theta_to_ws,
    )
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import tile_build_pallas, tile_sweep_pick

    d = 64
    ws = theta_to_ws(THETA, order=2)

    def stage_grid(pos, mass):
        lo, cell = pyramid_geometry(
            jnp.min(pos, axis=0), jnp.max(pos, axis=0), 6)
        coords = jnp.clip(((pos - lo) / cell).astype(jnp.int32), 0, d - 1)
        grid = build_sorted_grid(
            pos, mass, coords, d, with_cell_start=False, with_csort=False)
        return grid, lo, cell

    @jax.jit
    def s1(pos, mass):
        grid, lo, cell = stage_grid(pos, mass)
        return grid.psort, grid.ids

    @jax.jit
    def s2(pos, mass):
        grid, lo, cell = stage_grid(pos, mass)
        tb = tile_build_pallas(
            grid, lo, cell, d=d, k=near_k, impl="pallas",
            with_moments=True)
        return tb.tiles_plane, tb.moments

    @jax.jit
    def s3(pos, mass):
        grid, lo, cell = stage_grid(pos, mass)
        tb = tile_build_pallas(
            grid, lo, cell, d=d, k=near_k, impl="pallas",
            with_moments=True)
        packed = tb.moments[:10].T.reshape(d, d, d, 10)
        pyr = pyramid_from_packed(packed, lo, cell, 6, 2)
        a_far, j_far, h_far = far_field_grid(
            pyr, ws, 1.0, EPS, 6, impl="pallas")
        return tb.tiles_plane, a_far, j_far

    @jax.jit
    def s4(pos, mass):
        grid, lo, cell = stage_grid(pos, mass)
        tb = tile_build_pallas(
            grid, lo, cell, d=d, k=near_k, impl="pallas",
            with_moments=True)
        packed = tb.moments[:10].T.reshape(d, d, d, 10)
        pyr = pyramid_from_packed(packed, lo, cell, 6, 2)
        a_far, j_far, h_far = far_field_grid(
            pyr, ws, 1.0, EPS, 6, impl="pallas")
        parts = [a_far, j_far] + ([h_far] if h_far is not None else [])
        packed_g = jnp.concatenate(parts, axis=-1)
        far_plane = packed_g.reshape(
            d, d * d, packed_g.shape[-1]).transpose(0, 2, 1)
        acc = tile_sweep_pick(
            tb, grid, lo, cell, d=d, ws=ws, k=near_k, G=G, eps=EPS,
            impl="pallas", sorted_output=True, far_plane=far_plane)
        return acc

    for name, fn in (("s1 sort+gather   ", s1), ("s2 +scatter/mom  ", s2),
                     ("s3 +pyramid/far  ", s3), ("s4 +sweep/pickup ", s4)):
        try:
            ms = timed_fn(fn, pos_d, state.mass) * 1e3
            print(f"bis {name} {ms:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bis {name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
