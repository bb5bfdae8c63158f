"""TPU profile r5a — table-resident frozen-grid stepping on hardware.

ops/table_step.py (round-5 build, CPU-interpret-verified) keeps the
integration state in the sweep kernel's plane-major slot layout between
re-sorts, so a frozen step pays NO sort, NO placement, NO pickup — only
drift → moments-from-table → pyramid/far → sweep → kick. This script is
its first hardware measurement, alongside the row-space adaptive path
the round-4 verdict asked to measure (VERDICT.md next-round #1a).

1M Barnes-Hut (L6/k16, dense cold-collapse bench scene):
  b.r0    row-space sorted multi (ctrl — current bench.py: ~27 steps/s)
  b.ra    row-space make_adaptive_multi_step (stale 0.02, cap 16)
  b.t1    table fixed cadence 1  (= sorted-step cost rung)
  b.t33   table fixed cadence 33 over 32 steps (= frozen-step cost rung)
  b.t4/8/16  table fixed cadences
  b.ta2/5/10 table adaptive at stale 0.02/0.05/0.10 (cap 16) + resorts
  b.eq    table cad-1 vs row-space sorted, 8 steps: max|dpos| (expect ~0)
  b.phys  64-step adaptive(0.05) vs cad-1: max|dpos|, rel dvel, sampled
          |dE/E| gap, finiteness after 128 steps

1M spatial hash (sparse cube, cell=cutoff=2.0, tiles d=56/k=16):
  h.r0    row-space sorted multi (ctrl — ~33.6 steps/s r3)
  h.t1/t33/t8/t16, h.ta2/5  same rungs

Usage: one process, batched (each separate run pays a grant handshake).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
STEPS = 32
DT = 1e-3


def bench_multi(name, make, state, steps, traced=False):
    try:
        multi = jax.jit(make())
        out = multi(state)
        if traced:
            out = out[0]
        float(out.time)  # warm scalar readback (executable-load tail)
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


def main():
    from nbody_tpu.models.distributions import init_spherical, init_uniform
    from nbody_tpu.ops.barnes_hut import bh_engine_params
    from nbody_tpu.ops.forces import make_sorted_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_adaptive_multi_step,
        make_sorted_multi_step,
        sampled_total_energy,
    )
    from nbody_tpu.ops.spatial_hash import hash_engine_params
    from nbody_tpu.ops.table_step import (
        bh_table_params,
        hash_table_params,
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

    # ---- Barnes-Hut dense bench scene ---------------------------------
    cfg = SimulationConfig(
        particle_count=N, force_method=ForceMethod.BARNES_HUT,
        bh_max_level=6, dt=DT,
    )
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    sf = make_sorted_force_fn(cfg, pos_hint=state.pos)
    state = jax.jit(
        lambda s: initialize_forces(s, lambda p, m: sf(p, m)[0][
            jnp.argsort(sf(p, m)[2])])
    )(state)
    state.block_until_ready()
    ep = bh_engine_params(cfg)
    p = bh_table_params(levels=6, near_k=ep["near_k"])
    print(f"bh table params: d={p.d} k={p.k} ws={p.ws}", flush=True)

    # equivalence first (cheap, 8 steps)
    try:
        o_row = jax.jit(make_sorted_multi_step(sf, DT, 8))(state)
        o_tab = jax.jit(make_table_multi_step(p, DT, 8, 1))(state)
        dp = float(jnp.max(jnp.abs(o_row.pos - o_tab.pos)))
        dv = float(jnp.max(jnp.abs(o_row.vel - o_tab.vel)))
        print(f"b.eq  table-cad1 vs row-sorted, 8 steps: max|dpos|={dp:.3e}"
              f" max|dvel|={dv:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"b.eq FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    bench_multi("b.r0  row sorted (ctrl)",
                lambda: make_sorted_multi_step(sf, DT, STEPS), state, STEPS)
    bench_multi(
        "b.ra  row adaptive .02",
        lambda: make_adaptive_multi_step(
            sf, DT, STEPS, max_stale_frac=0.02, max_cadence=16),
        state, STEPS)
    bench_multi("b.t1  table cad 1",
                lambda: make_table_multi_step(p, DT, STEPS, 1), state, STEPS)
    bench_multi("b.t33 table frozen rung",
                lambda: make_table_multi_step(p, DT, STEPS, 33), state, STEPS)
    for cad in (4, 8, 16):
        bench_multi(f"b.t{cad}  table cad {cad}",
                    lambda cad=cad: make_table_multi_step(p, DT, STEPS, cad),
                    state, STEPS)
    for frac in (0.02, 0.05, 0.10):
        bench_multi(
            f"b.ta{int(frac * 100)} table adaptive",
            lambda frac=frac: make_table_adaptive_multi_step(
                p, DT, STEPS, max_stale_frac=frac, max_cadence=16,
                with_trace=True),
            state, STEPS, traced=True)

    # physics: adaptive(0.05) vs cad-1 over 64 steps + 128-step finiteness
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
        print(f"b.phys 64 steps: max|dpos|={dp:.3e} max|dvel|={dv:.3e}"
              f" (|v|max={vs:.3e}) E1={e1:.6e} Ea={ea:.6e}"
              f" relgap={(abs(ea - e1) / abs(e1)):.3e}", flush=True)
        o128 = jax.jit(make_table_adaptive_multi_step(
            p, DT, 128, max_stale_frac=0.05, max_cadence=16))(state)
        print(f"b.phys 128-step adaptive finite="
              f"{bool(jnp.isfinite(o128.pos).all())}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"b.phys FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # ---- spatial hash sparse cube --------------------------------------
    half = float(N) ** (1.0 / 3.0) / 2.0
    hcfg = SimulationConfig(
        particle_count=N, force_method=ForceMethod.SPATIAL_HASH,
        spatial_hash_cell_size=2.0, spatial_hash_cutoff=2.0, dt=DT,
    )
    hstate = init_uniform(
        jax.random.PRNGKey(42), N,
        UniformDistParams(min_bounds=(-half,) * 3, max_bounds=(half,) * 3),
    )
    hf = make_sorted_force_fn(hcfg, pos_hint=hstate.pos)
    hstate = jax.jit(
        lambda s: initialize_forces(s, lambda p, m: hf(p, m)[0][
            jnp.argsort(hf(p, m)[2])])
    )(hstate)
    hstate.block_until_ready()
    hp_sel = hash_engine_params(hcfg, np.asarray(hstate.pos))
    print(f"hash engine params: {hp_sel}", flush=True)
    hp = hash_table_params(
        cutoff=2.0, cell_size=2.0, d=hp_sel["tile_d"], k=hp_sel["tile_k"])

    try:
        o_row = jax.jit(make_sorted_multi_step(hf, DT, 8))(hstate)
        o_tab = jax.jit(make_table_multi_step(hp, DT, 8, 1))(hstate)
        dp = float(jnp.max(jnp.abs(o_row.pos - o_tab.pos)))
        print(f"h.eq  table-cad1 vs row-sorted, 8 steps: max|dpos|={dp:.3e}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"h.eq FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    bench_multi("h.r0  row sorted (ctrl)",
                lambda: make_sorted_multi_step(hf, DT, STEPS), hstate, STEPS)
    bench_multi("h.t1  table cad 1",
                lambda: make_table_multi_step(hp, DT, STEPS, 1),
                hstate, STEPS)
    bench_multi("h.t33 table frozen rung",
                lambda: make_table_multi_step(hp, DT, STEPS, 33),
                hstate, STEPS)
    for cad in (8, 16):
        bench_multi(f"h.t{cad}  table cad {cad}",
                    lambda cad=cad: make_table_multi_step(hp, DT, STEPS, cad),
                    hstate, STEPS)
    for frac in (0.02, 0.05):
        bench_multi(
            f"h.ta{int(frac * 100)} table adaptive",
            lambda frac=frac: make_table_adaptive_multi_step(
                hp, DT, STEPS, max_stale_frac=frac, max_cadence=16,
                with_trace=True),
            hstate, STEPS, traced=True)


if __name__ == "__main__":
    main()
