"""TPU profile r5i — from-init protocol + one-gather routing + repair A/Bs.

r5h established: (a) the ext/idx gathers are the real tax (ext[idx_ext]
20 ms, separate vel gather 6.8 ms, value-cast 9-col single gather 11.6 ms
vs 16.4 for the pair it subsumes); (b) the violent scene leaves the
k-cap contract after ~step 30 (ovf 316 @1 -> 257K @32), so the honest
timed window — and the reference's own benchmark protocol
(src/main.cpp:335-416) — is steps 0..N FROM INIT. This batch measures
every production candidate under that protocol with the vcast build:

  r.sF / r.sT   row sorted, route_extra False vs True (one 9-col gather)
  t.1           table cad-1 (vcast build)
  t.rep         table repair (exact incremental; early window movers
                ~2-18K/step are well under the 32K cap) + trace
  eq.rep        repair vs cad-1, 30 steps: dpos scale check (frozen-
                geometry binning differs at cell edges; both exact)
  h.*           1M sparse hash from-init: row / adaptive / repair
  p.*           1M PLUMMER BH (equilibrium; the physically resolvable
                scene): cad-1 + repair steps/s, 1k-step |dE/E| both

Usage: python scripts/profile_r5i.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
STEPS = 30
DT = 1e-3
EPS = 0.1
G = 1.0
THETA = 0.5


def bench_init(name, make, state, steps, traced=False):
    """min-of-3, each rep FROM `state` (the from-init protocol)."""
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
            o2 = multi(state)
            if traced:
                o2, trace = o2
            chk = float(jnp.sum(o2.pos[0]))
            best = min(best, time.perf_counter() - t0)
        msg = (f"{name:26s} {best / steps * 1000:8.2f} ms/step "
               f"({steps / best:7.2f} steps/s) (chk {chk:.4e})")
        if traced and trace is not None:
            msg += (f" rebuilds={int(np.asarray(trace[1]).sum()) + 1}"
                    f"/{steps} maxstale={int(np.asarray(trace[0]).max())}")
        print(msg, flush=True)
        return steps / best
    except Exception as e:  # noqa: BLE001
        print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return float("nan")


def main():
    from nbody_tpu.models.distributions import (
        init_plummer,
        init_spherical,
        init_uniform,
    )
    from nbody_tpu.ops.barnes_hut import (
        barnes_hut_forces_frozen,
        barnes_hut_forces_sorted,
        bh_engine_params,
    )
    from nbody_tpu.ops.forces import (
        make_sorted_force_fn,
        make_table_step_params,
    )
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_sorted_multi_step,
        sampled_total_energy,
    )
    from nbody_tpu.ops.table_step import (
        bh_table_params,
        make_table_multi_step,
        make_table_adaptive_multi_step,
        make_table_repair_multi_step,
    )
    from nbody_tpu.types import (
        ForceMethod,
        PlummerDistParams,
        SimulationConfig,
        SphericalDistParams,
        UniformDistParams,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    cfg = SimulationConfig(
        particle_count=N, force_method=ForceMethod.BARNES_HUT,
        bh_max_level=6, dt=DT,
    )
    near_k = bh_engine_params(cfg)["near_k"]

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

    bench_init("r.sF row sep-gathers",
               lambda: make_sorted_multi_step(sf, DT, STEPS,
                                              route_extra=False),
               state, STEPS)
    bench_init("r.sT row one-gather route",
               lambda: make_sorted_multi_step(sf, DT, STEPS,
                                              route_extra=True),
               state, STEPS)
    bench_init("t.1  table cad 1",
               lambda: make_table_multi_step(p, DT, STEPS, 1),
               state, STEPS)
    bench_init("t.rep table repair",
               lambda: make_table_repair_multi_step(
                   p, DT, STEPS, repair_cap=32768, max_cadence=64,
                   with_trace=True),
               state, STEPS, traced=True)

    # eq: repair vs cad-1 (both exact; binning geometry differs — expect
    # small dpos from edge-row assignment differences, NOT blowup)
    try:
        o1 = jax.jit(make_table_multi_step(p, DT, STEPS, 1))(state)
        orp = jax.jit(make_table_repair_multi_step(
            p, DT, STEPS, repair_cap=32768, max_cadence=64))(state)
        dp = jnp.abs(o1.pos - orp.pos)
        print(f"eq.rep 30 steps: max|dpos|={float(jnp.max(dp)):.3e} "
              f"p99={float(jnp.percentile(dp, 99)):.3e} "
              f"finite={bool(jnp.isfinite(orp.pos).all())}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"eq.rep FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # ---- hash sparse 1M ----------------------------------------------
    try:
        cfgh = SimulationConfig(
            particle_count=N, force_method=ForceMethod.SPATIAL_HASH,
            spatial_hash_cell_size=2.0, dt=DT,
        )
        half = float(N) ** (1.0 / 3.0) / 2.0
        sth = init_uniform(
            jax.random.PRNGKey(42), N,
            UniformDistParams(min_bounds=(-half,) * 3,
                              max_bounds=(half,) * 3),
        )
        sfh = make_sorted_force_fn(cfgh, pos_hint=sth.pos)
        sth = jax.jit(
            lambda s: initialize_forces(
                s, lambda po, m: sfh(po, m)[0][jnp.argsort(sfh(po, m)[2])]
            )
        )(sth)
        sth.block_until_ready()
        tph = make_table_step_params(cfgh, pos_hint=sth.pos)
        bench_init("h.r  hash row sorted",
                   lambda: make_sorted_multi_step(sfh, DT, STEPS),
                   sth, STEPS)
        bench_init("h.rT hash row one-gather",
                   lambda: make_sorted_multi_step(sfh, DT, STEPS,
                                                  route_extra=True),
                   sth, STEPS)
        bench_init("h.a5 hash adaptive .05",
                   lambda: make_table_adaptive_multi_step(
                       tph, DT, STEPS, max_stale_frac=0.05,
                       max_cadence=16),
                   sth, STEPS)
        bench_init("h.rep hash repair",
                   lambda: make_table_repair_multi_step(
                       tph, DT, STEPS, repair_cap=32768, max_cadence=64,
                       with_trace=True),
                   sth, STEPS, traced=True)
        o1 = jax.jit(make_table_multi_step(tph, DT, 8, 1))(sth)
        orp = jax.jit(make_table_repair_multi_step(
            tph, DT, 8, repair_cap=32768))(sth)
        dp = float(jnp.max(jnp.abs(o1.pos - orp.pos)))
        print(f"h.eq8 repair vs cad-1: max|dpos|={dp:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"hash FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # ---- Plummer 1M BH: the physically resolvable scene --------------
    try:
        pst = init_plummer(
            jax.random.PRNGKey(42), N,
            PlummerDistParams(scale_radius=3.0, total_mass=1.0),
            G=G,
        )
        pst = jax.jit(
            lambda s: initialize_forces(
                s, lambda po, m: sf(po, m)[0][jnp.argsort(sf(po, m)[2])]
            )
        )(pst)
        pst.block_until_ready()
        bench_init("p.1  plummer cad 1",
                   lambda: make_table_multi_step(p, DT, STEPS, 1),
                   pst, STEPS)
        bench_init("p.rep plummer repair",
                   lambda: make_table_repair_multi_step(
                       p, DT, STEPS, repair_cap=32768, max_cadence=64,
                       with_trace=True),
                   pst, STEPS, traced=True)
        # 1k-step drift, repair vs cad-1 (4 chunks of 250 to stay under
        # the ~2 min single-program guidance)
        e0 = float(sampled_total_energy(pst, G, EPS, samples=16384))
        cur = pst
        m250 = jax.jit(make_table_repair_multi_step(
            p, DT, 250, repair_cap=32768, max_cadence=64))
        for _ in range(4):
            cur = m250(cur)
            float(cur.time)
        e1 = float(sampled_total_energy(cur, G, EPS, samples=16384))
        print(f"p.e1k repair: E0={e0:.6e} E1={e1:.6e} "
              f"|dE/E|={abs(e1 - e0) / abs(e0):.3e} "
              f"finite={bool(jnp.isfinite(cur.pos).all())}", flush=True)
        cur = pst
        m250c = jax.jit(make_table_multi_step(p, DT, 250, 1))
        for _ in range(4):
            cur = m250c(cur)
            float(cur.time)
        e1c = float(sampled_total_energy(cur, G, EPS, samples=16384))
        print(f"p.e1k cad-1:  E1={e1c:.6e} "
              f"|dE/E|={abs(e1c - e0) / abs(e0):.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"plummer FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
