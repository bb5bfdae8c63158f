"""TPU profile r5g — bisect the CORRECT 1M BH build + fused placement A/B.

r5f established the honest post-fix numbers: row sorted 74.1 ms/step,
table cad-1 81.3 ms/step, table adaptive ~21.6 ms/step but NaN (traced to
the idx_ext slot-0 teleport of overflow rows beyond side_cap, fixed in
table_step._sort_build). The r3/r4 phase budgets are all invalid (the
flushed builds skipped every scatter chunk), so this batch re-bisects the
correct build stage by stage and A/Bs the two placement optimizations:

  eq32   table cad-1 vs row meta cad-1 over 32 steps (the r5f runs
         diverged by step 32 — the teleport; expect ~0 now)
  s0..s6 cumulative stage bisect of the table build (scanned x8 inside
         one jit, carry-perturbed input so XLA cannot CSE iterations):
         sort | +payload+ids gather | +bookkeeping | +fused placement |
         +relayout | +pyramid/far | +sweep
  ab     placement: fused 16-channel single pass vs the two 8-channel
         passes it replaced
  w***   fused placement at w in {256, 384, 512, 640}
  t.1/r.s/t.a5  end-to-end timings incl. adaptive with trace
  phys   adaptive(.05) vs table cad-1, 64 steps: dpos/E-gap/finiteness
  h.*    1M sparse-cube spatial hash: row ctrl vs table adaptive + 8-step
         equivalence

Usage: python scripts/profile_r5g.py   (one process, one TPU grant)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
STEPS = 32
INNER = 8
DT = 1e-3
EPS = 0.1
G = 1.0
THETA = 0.5


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


def bench_scan(name, fn, rows):
    """fn: jitted scalar fn of (rows,); INNER iterations inside."""
    try:
        float(fn(rows))  # compile + executable load + real readback
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(fn(rows))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:26s} {best / INNER * 1000:8.2f} ms/iter "
              f"(v={v:.3e})", flush=True)
        return best / INNER * 1000
    except Exception as e:  # noqa: BLE001
        print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return float("nan")


def main():
    from nbody_tpu.models.distributions import init_spherical, init_uniform
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
        make_resort_multi_step,
        make_sorted_multi_step,
        sampled_total_energy,
    )
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.sorted_window import sorted_ranks
    from nbody_tpu.ops.table_step import (
        _bin_ids,
        _chunk_bookkeeping,
        _far_grids,
        _grid_geometry,
        _relayout_plane,
        _sweep,
        bh_table_params,
        make_table_adaptive_multi_step,
        make_table_multi_step,
    )
    from nbody_tpu.types import (
        ForceMethod,
        SimulationConfig,
        SphericalDistParams,
        UniformDistParams,
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
    print(f"table params: d={p.d} k={p.k} side_cap={p.side_cap}",
          flush=True)

    # ---- eq32: table cad-1 vs row meta cad-1 (the side-fix gate) ------
    try:
        o_row = jax.jit(make_resort_multi_step(sf, DT, 32, 1))(state)
        o_tab = jax.jit(make_table_multi_step(p, DT, 32, 1))(state)
        dp = float(jnp.max(jnp.abs(o_row.pos - o_tab.pos)))
        dv = float(jnp.max(jnp.abs(o_row.vel - o_tab.vel)))
        print(f"eq32 table-cad1 vs row-meta1: max|dpos|={dp:.3e} "
              f"max|dvel|={dv:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"eq32 FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # ---- stage bisect -------------------------------------------------
    pos_d = jax.jit(
        lambda s: s.pos + s.vel * DT + (0.5 * DT * DT) * s.acc
    )(state)
    tagf = jnp.arange(N, dtype=jnp.float32)[:, None]
    rows0 = jnp.concatenate(
        [pos_d, state.mass[:, None],
         state.vel + (0.5 * DT) * state.acc, tagf], axis=-1,
    )
    rows0.block_until_ready()

    def stage_fn(stage, w_override=None, two_call=False):
        def one(rows):
            lo, cellw = _grid_geometry(rows[:, 0:3], p)
            ids = _bin_ids(rows[:, 0:3], lo, cellw, p)
            order = jnp.argsort(ids).astype(jnp.int32)
            if stage == 0:
                return jnp.sum(order).astype(jnp.float32)
            pay = rows[order]
            ids_s = ids[order]
            if stage == 1:
                return jnp.sum(pay[:, 3]) + jnp.sum(ids_s).astype(
                    jnp.float32)
            rank_s = sorted_ranks(ids_s)
            bk = _chunk_bookkeeping(ids_s, rank_s, p)
            if stage == 2:
                return (jnp.sum(bk["starts"]).astype(jnp.float32)
                        + jnp.sum(bk["dest"]).astype(jnp.float32)
                        + jnp.sum(bk["nwin"]).astype(jnp.float32))
            w = w_override if w_override is not None else bk["w"]
            if two_call:
                tiles6, moments = monotone_scatter_tiles(
                    pay[:, 0:4], bk["dest"], bk["starts"], lo, cellw,
                    k=p.k, d=p.d, r=bk["r"], w=w, q=bk["q"],
                    nonempty=bk["nonempty"], nwin=bk["nwin"],
                    with_moments=True, cell_ids=ids_s, with_coverage=True,
                )
                tiles_v = monotone_scatter_tiles(
                    pay[:, 4:8], bk["dest"], bk["starts"], lo, cellw,
                    k=p.k, d=p.d, r=bk["r"], w=w, q=bk["q"],
                    nonempty=bk["nonempty"], nwin=bk["nwin"],
                )
            else:
                tiles6, moments, tiles_v = monotone_scatter_tiles(
                    pay[:, 0:4], bk["dest"], bk["starts"], lo, cellw,
                    k=p.k, d=p.d, r=bk["r"], w=w, q=bk["q"],
                    nonempty=bk["nonempty"], nwin=bk["nwin"],
                    with_moments=True, cell_ids=ids_s, with_coverage=True,
                    extra=pay[:, 4:8],
                )
            if stage == 3:
                return (jnp.sum(tiles6[3]) + jnp.sum(moments[0])
                        + jnp.sum(tiles_v[0]))
            plane6 = _relayout_plane(tiles6, 6, p, bk["g"])
            plane_v = _relayout_plane(tiles_v, 4, p, bk["g"])
            pos_t = plane6[:, 0:4]
            if stage == 4:
                return (jnp.sum(pos_t[:, 3]) + jnp.sum(plane_v[:, 0]))
            packed = moments[:10].T.reshape(p.d, p.d, p.d, 10)
            far_plane, far_a = _far_grids(packed, lo, cellw, p)
            if stage == 5:
                return jnp.sum(far_plane[:, 0]) + jnp.sum(far_a[:, 0])
            raw = _sweep(pos_t, far_plane, lo, cellw, p)
            return jnp.sum(raw[:, 0])

        def scanned(rows):
            def body(c, _):
                r2 = rows.at[0, 0].add(c * 1e-20)
                return one(r2) * 1e-20, None

            c, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=INNER
            )
            return c

        return jax.jit(scanned)

    names = ["s0 sort", "s1 +pay/ids gather", "s2 +bookkeeping",
             "s3 +fused placement", "s4 +relayout", "s5 +pyramid/far",
             "s6 +sweep"]
    for i, nm in enumerate(names):
        bench_scan(nm, stage_fn(i), rows0)
    bench_scan("ab two-call placement", stage_fn(3, two_call=True), rows0)
    for w in (256, 384, 512):
        bench_scan(f"w{w} fused placement", stage_fn(3, w_override=w),
                   rows0)

    # ---- end-to-end timings ------------------------------------------
    bench_multi("r.s  row sorted",
                lambda: make_sorted_multi_step(sf, DT, STEPS), state,
                STEPS)
    bench_multi("t.1  table cad 1",
                lambda: make_table_multi_step(p, DT, STEPS, 1), state,
                STEPS)
    bench_multi(
        "t.a5 table adaptive",
        lambda: make_table_adaptive_multi_step(
            p, DT, STEPS, max_stale_frac=0.05, max_cadence=16,
            with_trace=True),
        state, STEPS, traced=True)
    bench_multi(
        "t.a2 table adaptive",
        lambda: make_table_adaptive_multi_step(
            p, DT, STEPS, max_stale_frac=0.02, max_cadence=16,
            with_trace=True),
        state, STEPS, traced=True)

    # ---- phys: adaptive vs cad-1 over 64 steps ------------------------
    try:
        o1 = jax.jit(make_table_multi_step(p, DT, 64, 1))(state)
        oa = jax.jit(make_table_adaptive_multi_step(
            p, DT, 64, max_stale_frac=0.05, max_cadence=16))(state)
        dp = jnp.abs(o1.pos - oa.pos)
        vmax = float(jnp.max(jnp.abs(o1.vel)))
        e1 = float(sampled_total_energy(o1, G, EPS, samples=4096))
        ea = float(sampled_total_energy(oa, G, EPS, samples=4096))
        fin = bool(jnp.isfinite(oa.pos).all())
        print(f"phys 64 steps: max|dpos|={float(jnp.max(dp)):.3e} "
              f"p99|dpos|={float(jnp.percentile(dp, 99)):.3e} "
              f"|v|max={vmax:.3e} finite={fin} "
              f"E1={e1:.6e} Ea={ea:.6e} "
              f"relgap={abs(ea - e1) / abs(e1):.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"phys FAILED: {type(e).__name__}: {str(e)[:300]}",
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
        print(f"hash table params: {tph}", flush=True)
        o_row = jax.jit(make_resort_multi_step(sfh, DT, 8, 1))(sth)
        o_tab = jax.jit(make_table_multi_step(tph, DT, 8, 1))(sth)
        dp = float(jnp.max(jnp.abs(o_row.pos - o_tab.pos)))
        print(f"h.eq8 table vs row: max|dpos|={dp:.3e}", flush=True)
        bench_multi("h.r  hash row sorted",
                    lambda: make_sorted_multi_step(sfh, DT, STEPS),
                    sth, STEPS)
        bench_multi("h.t1 hash table cad 1",
                    lambda: make_table_multi_step(tph, DT, STEPS, 1),
                    sth, STEPS)
        bench_multi(
            "h.a5 hash table adaptive",
            lambda: make_table_adaptive_multi_step(
                tph, DT, STEPS, max_stale_frac=0.05, max_cadence=16,
                with_trace=True),
            sth, STEPS, traced=True)
    except Exception as e:  # noqa: BLE001
        print(f"hash FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
