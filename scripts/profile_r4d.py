"""TPU validation r4d — frozen-grid after the ids_via_gather fix.

r4c pinned the corruption: carrying sorted ids as an f32-bitcast payload
column while an int32 gather with the same indices coexists in the
program zeroes the bitcast ids IN-PROGRAM (denormal flush; rank
collapsed to arange). The fix routes meta-producing builds through
``build_sorted_grid(ids_via_gather=True)`` — ids are int32-native
everywhere, the bitcast column no longer exists in those programs.

  a0  m8-vs-m1 over 32 steps (expect ~f32 noise, both finite)
  a1  materialized meta.rank vs numpy           (expect 0 mismatches)
  a2  frozen(materialized fresh meta) vs sorted (expect ~0)
  s0  TRUE staleness growth over 16 frozen steps from cold start
  b0/b8/b16  BH cadence timings   (ctrl = make_sorted_multi_step)
  h0/h8/h16  hash cadence timings

Usage: python scripts/profile_r4d.py
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


def bench_multi(name, multi, state, steps):
    try:
        out = multi(state)
        float(out.time)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out2 = multi(out)
            chk = float(jnp.sum(out2.pos[0]))
            best = min(best, time.perf_counter() - t0)
        per = best / steps * 1000
        print(f"{name:44s} {per:8.2f} ms/step ({steps / best:7.2f} steps/s)"
              f" (chk {chk:.4e})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def main():
    from nbody_tpu.models.distributions import init_spherical, init_uniform
    from nbody_tpu.ops.forces import make_sorted_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_resort_multi_step,
        make_sorted_multi_step,
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
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    sf = make_sorted_force_fn(cfg, pos_hint=state.pos)
    state = jax.jit(
        lambda s: initialize_forces(s, lambda p, m: sf(p, m)[0][
            jnp.argsort(sf(p, m)[2])])
    )(state)
    state.block_until_ready()

    # ---- a0: cadence equivalence -----------------------------------------
    m1 = jax.jit(make_resort_multi_step(sf, DT, STEPS, 1))
    m8 = jax.jit(make_resort_multi_step(sf, DT, STEPS, 8))
    try:
        o1, o8 = m1(state), m8(state)
        dp = float(jnp.max(jnp.abs(o1.pos - o8.pos)))
        dv = float(jnp.max(jnp.abs(o1.vel - o8.vel)))
        fin = bool(jnp.all(jnp.isfinite(o8.pos)))
        print(f"a0 m8-vs-m1 32 steps: max|dpos|={dp:.3e} max|dvel|={dv:.3e}"
              f" finite={fin}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"a0 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---- a1/a2: materialized meta integrity -------------------------------
    acc0, psort, order, meta = jax.jit(sf.with_meta)(state.pos, state.mass)
    ids = np.asarray(meta.ids)
    rank = np.asarray(meta.rank)
    boundary = np.concatenate([[True], ids[1:] != ids[:-1]])
    run_start = np.maximum.accumulate(np.where(boundary, np.arange(N), 0))
    nbad = int((rank != (np.arange(N) - run_start)).sum())
    print(f"a1 meta.rank: max={rank.max()} mismatch-vs-numpy={nbad} | "
          f"ids monotone={bool((np.diff(ids) >= 0).all())} "
          f"nonzero={int((ids != 0).sum())}", flush=True)
    a0v = np.asarray(acc0)
    try:
        accf = jax.jit(lambda p, m: sf.frozen(p, m))(psort, meta)
        md = float(np.abs(np.asarray(accf) - a0v).max())
        print(f"a2 frozen(fresh meta) vs sorted: max|diff| = {md:.3e} "
              f"(|a|max {float(np.abs(a0v).max()):.2e})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"a2 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---- s0: true staleness growth ----------------------------------------
    try:
        @jax.jit
        def run_stale(psort, vel, acc):
            def body(c, _):
                ps, v, a = c
                pos_d = ps[:, :3] + v * DT + (0.5 * DT * DT) * a
                ps_d = jnp.concatenate([pos_d, ps[:, 3:4]], axis=-1)
                a_n, stale = sf.frozen(ps_d, meta, with_audit=True)
                v_n = v + (0.5 * DT) * (a + a_n)
                return (ps_d, v_n, a_n), stale
            _, stales = jax.lax.scan(
                body, (psort, vel, acc), None, length=16)
            return stales
        stales = run_stale(psort, state.vel[order], acc0)
        print("s0 stale counts/step (of 1M):",
              [int(x) for x in stales], flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"s0 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---- b: BH cadence timings --------------------------------------------
    bench_multi("b0 BH sorted multi (ctrl)",
                jax.jit(make_sorted_multi_step(sf, DT, STEPS)), state, STEPS)
    bench_multi("b8 BH resort_every=8", m8, state, STEPS)
    bench_multi("b16 BH resort_every=16",
                jax.jit(make_resort_multi_step(sf, DT, STEPS, 16)),
                state, STEPS)

    # ---- hash ---------------------------------------------------------------
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
    try:
        hacc, hpsort, horder, hmeta = jax.jit(hf.with_meta)(
            hstate.pos, hstate.mass)
        hrank = np.asarray(hmeta.rank)
        hids = np.asarray(hmeta.ids)
        hboundary = np.concatenate([[True], hids[1:] != hids[:-1]])
        hrs = np.maximum.accumulate(np.where(hboundary, np.arange(N), 0))
        hbad = int((hrank != (np.arange(N) - hrs)).sum())
        haccf = jax.jit(lambda p, m: hf.frozen(p, m))(hpsort, hmeta)
        hmd = float(np.abs(np.asarray(haccf) - np.asarray(hacc)).max())
        print(f"a1h hash rank mismatch={hbad}; a2h frozen-vs-sorted "
              f"max|diff|={hmd:.3e} "
              f"(|a|max {float(np.abs(np.asarray(hacc)).max()):.2e})",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"a1h/a2h FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
    bench_multi("h0 hash sorted multi (ctrl)",
                jax.jit(make_sorted_multi_step(hf, DT, STEPS)),
                hstate, STEPS)
    for k in (8, 16):
        bench_multi(f"h{k} hash resort_every={k}",
                    jax.jit(make_resort_multi_step(hf, DT, STEPS, k)),
                    hstate, STEPS)


if __name__ == "__main__":
    main()
