"""TPU profile r5h — extract-path bisect + repair-step micro-costs +
overflow trajectory + honest energy drift.

r5g (post fused-placement): force pipeline s6 = 49.2 ms but table cad-1
= 76.5 and row sorted = 72.2 — ~27 ms/step lives BETWEEN the force
pipeline and the full step (extract retiling + side rebuild + kick +
readout amortization). This batch attributes it, prices the planned
incremental-repair step's building blocks, measures how much slot
overflow the violent bench scene actually produces (sizes side_cap), and
re-establishes the energy-drift number on CORRECT forces (the r2
10k-step gate ran on the denormal-flushed engine — forces near zero —
and is void).

  x0..x3  cumulative: drift | +ext relayout | +idx_ext gather (rows) |
          +sort_build tail (== full table sorted step)
  ovf     overflow trajectory: side_over + total rank>=k rows at steps
          {1, 16, 32, 64} of table cad-1
  cap32   t.1 timing + eq32-vs-row at side_cap=32768
  q1..q5  repair-step primitives at cap=32768: nonzero compaction |
          mover channel gathers + argsort + bookkeeping | removal+merge
          triple-select | insert placement (9 extras) + relayout |
          full repair overhead chain (no force)
  e1k     |dE/E| over 1000 steps (sampled PE): row cad-1 and table
          adaptive(.05 — only if r5g phys was finite)

Usage: python scripts/profile_r5h.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
INNER = 8
DT = 1e-3
EPS = 0.1
G = 1.0
THETA = 0.5
CAP = 32768


def bench_scan(name, fn, *args):
    try:
        float(fn(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:30s} {best / INNER * 1000:8.2f} ms/iter "
              f"(v={v:.3e})", flush=True)
        return best / INNER * 1000
    except Exception as e:  # noqa: BLE001
        print(f"{name:30s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return float("nan")


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        barnes_hut_forces_frozen,
        barnes_hut_forces_sorted,
        bh_engine_params,
    )
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_resort_multi_step,
        sampled_total_energy,
    )
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.sorted_window import cell_starts_at, sorted_ranks
    from nbody_tpu.ops.table_step import (
        TableState,
        _bin_ids,
        _drift,
        _entry,
        _extract,
        _lane_geom,
        _sort_build,
        _static_cell_ids,
        _table_sorted_step,
        bh_table_params,
        make_table_adaptive_multi_step,
        make_table_multi_step,
        table_to_particle_state,
    )
    from nbody_tpu.types import (
        ForceMethod,
        SimulationConfig,
        SphericalDistParams,
    )
    import dataclasses

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
    d, k = p.d, p.k
    l, L = _lane_geom(p)

    ts0 = jax.jit(lambda s: _entry(s, DT, p))(state)
    jax.block_until_ready(ts0.pos_t)
    print(f"entry: side_over={int(ts0.side_over)}", flush=True)

    # ---- x-stages: extract-path bisect -------------------------------
    def x_fn(stage):
        def one(ts):
            pos_d_t, vel_h, side_pd = _drift(ts, DT, p)
            if stage == 0:
                return jnp.sum(pos_d_t[0, 0, 0])
            if stage == 1:
                # ext relayout ONLY (no idx gather): same math as
                # _extract minus the final [idx_ext]
                ext = jnp.concatenate([pos_d_t, vel_h, ts.tag_t], axis=1)
                if L != l:
                    ext = ext[:, :, :, :l]
                ext = (
                    ext.reshape(d, 8, k, d, d)
                    .transpose(0, 3, 4, 2, 1)
                    .reshape(d * d * d * k, 8)
                )
                return jnp.sum(ext[0])
            rows = _extract(ts, pos_d_t, vel_h, side_pd, p)
            if stage == 2:
                return jnp.sum(rows[0])
            ts2 = _sort_build(rows, ts.time, DT, p)
            return jnp.sum(ts2.pos_t[0, 0, 0])

        def scanned(ts):
            def body(c, _):
                t2 = dataclasses.replace(
                    ts, pos_t=ts.pos_t.at[0, 0, 0, 0].add(c * 1e-20)
                )
                return one(t2) * 1e-20, None

            c, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=INNER
            )
            return c

        return jax.jit(scanned)

    for i, nm in enumerate(["x0 drift", "x1 +ext relayout",
                            "x2 +idx_ext gather", "x3 +sort_build"]):
        bench_scan(nm, x_fn(i), ts0)

    # ---- gather/rank alternatives ------------------------------------
    pos_d = jax.jit(
        lambda s: s.pos + s.vel * DT + (0.5 * DT * DT) * s.acc
    )(state)
    tagf = jnp.arange(N, dtype=jnp.float32)[:, None]
    rows0 = jnp.concatenate(
        [pos_d, state.mass[:, None],
         state.vel + (0.5 * DT) * state.acc, tagf], axis=-1,
    )
    rows0.block_until_ready()
    d3 = d ** 3

    def g_fn(variant):
        def one(rows):
            lo = jnp.min(rows[:, 0:3], axis=0)
            cell = (jnp.max(rows[:, 0:3], axis=0) - lo).max() / d
            cs = jnp.clip(
                ((rows[:, 0:3] - lo) / cell).astype(jnp.int32), 0, d - 1
            )
            ids = (cs[:, 0] * d + cs[:, 1]) * d + cs[:, 2]
            order = jnp.argsort(ids).astype(jnp.int32)
            if variant == "sep":       # today: 8-col pay + int ids gather
                pay = rows[order]
                ids_s = ids[order]
            elif variant == "vcast":   # ONE 9-col gather, ids as f32 VALUE
                r9 = jnp.concatenate(
                    [rows, ids.astype(jnp.float32)[:, None]], axis=-1
                )
                pay9 = r9[order]
                pay = pay9[:, :8]
                ids_s = pay9[:, 8].astype(jnp.int32)
            else:                      # vcast + ranks via starts-gather
                r9 = jnp.concatenate(
                    [rows, ids.astype(jnp.float32)[:, None]], axis=-1
                )
                pay9 = r9[order]
                pay = pay9[:, :8]
                ids_s = pay9[:, 8].astype(jnp.int32)
                starts_full = jnp.searchsorted(
                    ids_s, jnp.arange(d3, dtype=jnp.int32)
                ).astype(jnp.int32)
                rank = (
                    jnp.arange(N, dtype=jnp.int32) - starts_full[ids_s]
                )
                return (jnp.sum(pay[:, 3]) + jnp.sum(ids_s)
                        .astype(jnp.float32) + jnp.sum(rank)
                        .astype(jnp.float32))
            rank = sorted_ranks(ids_s)
            return (jnp.sum(pay[:, 3]) + jnp.sum(ids_s)
                    .astype(jnp.float32) + jnp.sum(rank)
                    .astype(jnp.float32))

        def scanned(rows):
            def body(c, _):
                r2 = rows.at[0, 0].add(c * 1e-20)
                return one(r2) * 1e-20, None

            c, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=INNER
            )
            return c

        return jax.jit(scanned)

    for v, nm in (("sep", "g0 sep gathers + cummax rank"),
                  ("vcast", "g1 vcast 9-col + cummax rank"),
                  ("vrank", "g2 vcast + starts-gather rank")):
        bench_scan(nm, g_fn(v), rows0)

    # ---- row-path bisect: force alone vs full sorted step ------------
    from nbody_tpu.ops.integrator import SortedState, sorted_verlet_step

    def y_fn(stage):
        def scanned(rows):
            def body(c, _):
                pos = rows[:, 0:3].at[0, 0].add(c * 1e-20)
                if stage == 0:      # force eval only (sorted out)
                    acc_s, psort, order = sf(pos, rows[:, 3])[:3]
                    return (jnp.sum(acc_s[0]) + jnp.sum(psort[0])
                            + jnp.sum(order[0]).astype(jnp.float32)
                            ) * 1e-20, None
                acc_s, psort, order = sf(pos, rows[:, 3])[:3]
                pay = rows[:, 4:7][order]      # the integrator's gather
                return (jnp.sum(acc_s[0]) + jnp.sum(pay[0])) * 1e-20, None

            c, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=INNER
            )
            return c

        return jax.jit(scanned)

    bench_scan("y0 row force only", y_fn(0), rows0)
    bench_scan("y1 row force + vel gather", y_fn(1), rows0)

    def y2_fn():
        st0 = SortedState(
            pos=rows0[:, 0:3], vel=rows0[:, 4:7],
            acc=jnp.zeros((N, 3), jnp.float32), mass=rows0[:, 3],
            to_orig=jnp.arange(N, dtype=jnp.int32),
            time=jnp.float32(0.0),
        )

        @jax.jit
        def scanned(st):
            def body(s, _):
                return sorted_verlet_step(s, DT, sf), None

            s2, _ = jax.lax.scan(body, st, None, length=INNER)
            return jnp.sum(s2.pos[0])

        return scanned, st0

    try:
        fn, st0 = y2_fn()
        bench_scan("y2 row full sorted step", fn, st0)
    except Exception as e:  # noqa: BLE001
        print(f"y2 FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    # ---- overflow trajectory -----------------------------------------
    try:
        @jax.jit
        def ovf_of(out_state):
            lo = jnp.min(out_state.pos, axis=0)
            hi = jnp.max(out_state.pos, axis=0)
            cell = jnp.max((hi - lo) / d) * (1 + 1e-6)
            cs = jnp.clip(
                ((out_state.pos - lo) / cell).astype(jnp.int32), 0, d - 1
            )
            ids = (cs[:, 0] * d + cs[:, 1]) * d + cs[:, 2]
            cnt = jnp.zeros((d ** 3,), jnp.int32).at[ids].add(1)
            return jnp.sum(jnp.maximum(cnt - k, 0))

        cur = state
        step_ct = 0
        for tgt in (1, 16, 32, 64):
            nsteps = tgt - step_ct
            cur = jax.jit(make_table_multi_step(p, DT, nsteps, 1))(cur)
            step_ct = tgt
            print(f"ovf step {tgt}: rank>=k rows={int(ovf_of(cur))}",
                  flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"ovf FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # ---- side_cap=32768 ----------------------------------------------
    try:
        p32 = dataclasses.replace(p, side_cap=32768)
        o_row = jax.jit(make_resort_multi_step(sf, DT, 32, 1))(state)
        o_t32 = jax.jit(make_table_multi_step(p32, DT, 32, 1))(state)
        dp = float(jnp.max(jnp.abs(o_row.pos - o_t32.pos)))
        print(f"cap32 eq32 vs row: max|dpos|={dp:.3e}", flush=True)
        multi = jax.jit(make_table_multi_step(p32, DT, 32, 1))
        out = multi(state)
        float(out.time)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = multi(out)
            float(jnp.sum(out.pos[0]))
            best = min(best, time.perf_counter() - t0)
        print(f"cap32 t.1: {best / 32 * 1000:.2f} ms/step "
              f"({32 / best:.2f} steps/s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"cap32 FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # ---- repair primitives -------------------------------------------
    lin, lane_valid = _static_cell_ids(p)

    def repair_parts(stage):
        def one(ts):
            pos_d_t, vel_h, side_pd = _drift(ts, DT, p)
            ids_now = _bin_ids(
                jnp.moveaxis(pos_d_t[:, 0:3], 1, -1), ts.lo, ts.cell, p
            )  # (d, k, L) i32
            stale = (
                (ids_now != lin[:, 0]) & lane_valid[:, 0]
                & (ts.cov_t[:, 0] > 0.0)
            )
            if stage == 0:  # audit only (baseline for deltas)
                return jnp.sum(stale.astype(jnp.int32)).astype(
                    jnp.float32)
            stale_flat = stale.reshape(-1)
            mov = jnp.nonzero(
                stale_flat, size=CAP, fill_value=d * k * L
            )[0].astype(jnp.int32)
            if stage == 1:  # + nonzero compaction
                return jnp.sum(mov).astype(jnp.float32)
            val = mov < d * k * L
            movc = jnp.where(val, mov, 0)
            li = movc % L
            ki = (movc // L) % k
            di = movc // (L * k)

            def chan(arr, ch, nch):
                flat = arr.reshape(-1)
                idx = ((di * nch + ch) * k + ki) * L + li
                return flat[idx] * val.astype(flat.dtype)

            cols = [chan(pos_d_t, c, 4) for c in range(4)]
            cols += [chan(vel_h, c, 3) for c in range(3)]
            cols += [chan(ts.tag_t, 0, 1)]
            tgt = ids_now.reshape(-1)[movc]
            key = jnp.where(val, tgt, jnp.int32(d ** 3))
            ordm = jnp.argsort(key).astype(jnp.int32)
            tgt_s = key[ordm]
            rank = sorted_ranks(tgt_s)
            rows_m = jnp.stack(cols, axis=-1)[ordm]  # (CAP, 8)
            if stage == 2:  # + gathers + sort + ranks
                return jnp.sum(rows_m[:, 3]) + jnp.sum(rank).astype(
                    jnp.float32)
            # occupancy high-water mark per cell
            slot_idx = jax.lax.broadcasted_iota(
                jnp.int32, (d, k, L), 1
            )
            occ = (ts.cov_t[:, 0] > 0.0)
            hwm = jnp.max(
                jnp.where(occ, slot_idx + 1, 0), axis=1
            )  # (d, L)
            hwm_flat = hwm[:, :l].reshape(-1)  # (d^3,)
            cnt_t = hwm_flat[jnp.clip(tgt_s, 0, d ** 3 - 1)]
            slot = cnt_t + rank
            fits = (val[ordm]) & (slot < k) & (tgt_s < d ** 3)
            dest = jnp.where(
                fits, tgt_s * k + slot, jnp.int32(1 << 24)
            )
            if stage == 3:  # + occupancy/fit/dest
                return jnp.sum(dest).astype(jnp.float32)
            # insert placement (9 extras = vel3+tag+rowid+pad) + merge
            num_cells = d ** 3
            g = 1
            r = d * k
            q = r // k
            n_chunks = num_cells * k // r
            chunk_ar = jnp.arange(n_chunks, dtype=jnp.int32)
            c0 = (chunk_ar * r) // k
            c1 = jnp.minimum(((chunk_ar + 1) * r + k - 1) // k, num_cells)
            starts = cell_starts_at(tgt_s, c0)
            ends = cell_starts_at(tgt_s, c1)
            wq = 256
            span = ends - (starts // 128) * 128
            nwin = -(-span // wq)
            nonempty = ends > starts
            ins6, ins_v = monotone_scatter_tiles(
                rows_m[:, 0:4], dest, starts, ts.lo, ts.cell,
                k=k, d=d, r=r, w=wq, q=q,
                nonempty=nonempty, nwin=nwin,
                with_coverage=True, extra=rows_m[:, 4:8],
            )
            from nbody_tpu.ops.table_step import _relayout_plane

            pl6 = _relayout_plane(ins6, 6, p, g)
            plv = _relayout_plane(ins_v, 4, p, g)
            ins_cov = pl6[:, 5:6]
            if stage == 4:  # + insert + relayout
                return jnp.sum(ins_cov) + jnp.sum(plv[:, 0])
            # merge triple-select (pos/vel/tag/cov) + removal scatter
            inv = jnp.argsort(ordm).astype(jnp.int32)
            fits_unsorted = fits[inv]
            rem_flat = (
                jnp.zeros((d * k * L,), jnp.bool_)
                .at[mov]  # invalid movers carry d*k*L -> OOB, dropped
                .set(fits_unsorted, mode="drop")
            )
            rem = rem_flat.reshape(d, 1, k, L)
            icov = ins_cov > 0.0
            pos_new = jnp.where(
                icov, pl6[:, 0:4],
                jnp.where(rem, 0.0, pos_d_t),
            )
            vel_new = jnp.where(
                icov, plv[:, 0:3], jnp.where(rem, 0.0, vel_h)
            )
            cov_new = jnp.where(
                icov, 1.0, jnp.where(rem, 0.0, ts.cov_t)
            )
            return (jnp.sum(pos_new[:, 3]) + jnp.sum(vel_new[:, 0])
                    + jnp.sum(cov_new))

        def scanned(ts):
            def body(c, _):
                t2 = dataclasses.replace(
                    ts, pos_t=ts.pos_t.at[0, 0, 0, 0].add(c * 1e-20)
                )
                return one(t2) * 1e-20, None

            c, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=INNER
            )
            return c

        return jax.jit(scanned)

    for i, nm in enumerate(
        ["q0 audit", "q1 +nonzero compact", "q2 +gathers/sort/rank",
         "q3 +occupancy/fit", "q4 +insert/relayout", "q5 +merge/remove"]
    ):
        bench_scan(nm, repair_parts(i), ts0)

    # ---- energy drift over 1000 steps (correct forces) ---------------
    try:
        e0 = float(sampled_total_energy(state, G, EPS, samples=16384))
        cur = state
        multi = jax.jit(make_resort_multi_step(sf, DT, 250, 1))
        for i in range(4):
            cur = multi(cur)
            float(cur.time)
        e1 = float(sampled_total_energy(cur, G, EPS, samples=16384))
        print(f"e1k row cad-1: E0={e0:.6e} E1={e1:.6e} "
              f"|dE/E|={abs(e1 - e0) / abs(e0):.3e}", flush=True)
        cur = state
        multia = jax.jit(make_table_adaptive_multi_step(
            p, DT, 250, max_stale_frac=0.05, max_cadence=16))
        for i in range(4):
            cur = multia(cur)
            float(cur.time)
        ea = float(sampled_total_energy(cur, G, EPS, samples=16384))
        fin = bool(jnp.isfinite(cur.pos).all())
        print(f"e1k adaptive.05: E1={ea:.6e} "
              f"|dE/E|={abs(ea - e0) / abs(e0):.3e} finite={fin}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"e1k FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
