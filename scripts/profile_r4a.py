"""TPU profile r4a — amortized re-sort (frozen-grid) cadence A/B.

The r3v bisect pinned the 1M BH force budget: sort 8.8 / build 5.7 /
pyramid+far 6.0 / sweep 2.9 / pickup 7.7 = 31.0 ms, plus ~4-6 ms of
integrator payload gather + elementwise per step. Frozen-grid steps
(ops/integrator.make_resort_multi_step) skip the sort AND the payload
gather; this script measures what that buys end-to-end, how fast cell
assignments go stale, and what the cadence costs in accuracy.

  b0   1M BH dense:   sorted multi-step ctrl (resort_every=1 semantics)
  b1-3 1M BH dense:   resort_every = 4 / 8 / 16
  f0   frozen force alone (vs 31.0 sorted / 22.2 predicted)
  f1   frozen force + staleness audit
  s0   staleness growth over 16 frozen steps (counts per step)
  acc  32 steps: resort_every=8 vs 1 — max |dpos|, |dvel|
  h0   1M hash sparse cube: sorted multi-step ctrl
  h1-3 1M hash sparse:      resort_every = 4 / 8 / 16

Usage: python scripts/profile_r4a.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 1_000_000
STEPS = 32
DT = 1e-3


def bench_multi(name, multi, state, steps):
    try:
        out = multi(state)
        float(out.time)  # warm readback
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out2 = multi(out)
            chk = float(jnp.sum(out2.pos[0]))
            best = min(best, time.perf_counter() - t0)
        per = best / steps * 1000
        print(f"{name:52s} {per:8.2f} ms/step ({steps / best:7.2f} steps/s)"
              f" (chk {chk:.4e})", flush=True)
        return per
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


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

    # ---- 1M BH dense sphere (the bench.py north-star cell) -------------
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

    bench_multi("b0 BH sorted multi (ctrl)",
                jax.jit(make_sorted_multi_step(sf, DT, STEPS)), state, STEPS)
    multis = {}
    for k in (4, 8, 16):
        multis[k] = jax.jit(make_resort_multi_step(sf, DT, STEPS, k))
        bench_multi(f"b{k} BH resort_every={k}", multis[k], state, STEPS)

    # ---- frozen force alone + audit cost --------------------------------
    acc0, psort, order, meta = jax.jit(sf.with_meta)(state.pos, state.mass)
    jax.block_until_ready((psort, meta.ids))

    def mk_frozen(audit):
        @jax.jit
        def run(p):
            def body(c, _):
                out = sf.frozen(p * (1 + c * 1e-30), meta,
                                with_audit=audit)
                a = out[0] if audit else out
                return jnp.sum(a) * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=10)
            return c
        return run

    for name, audit in (("f0 frozen force", False),
                        ("f1 frozen force + audit", True)):
        try:
            run = mk_frozen(audit)
            float(run(psort))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(psort))
                best = min(best, time.perf_counter() - t0)
            print(f"{name:52s} {best / 10 * 1000:8.2f} ms/iter", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # ---- staleness growth over 16 frozen steps ---------------------------
    @jax.jit
    def staleness(psort, vel, acc):
        def body(c, _):
            ps, v, a = c
            pos_d = ps[:, :3] + v * DT + (0.5 * DT * DT) * a
            ps_d = jnp.concatenate([pos_d, ps[:, 3:4]], axis=-1)
            a_n, stale = sf.frozen(ps_d, meta, with_audit=True)
            v_n = v + (0.5 * DT) * (a + a_n)
            return (ps_d, v_n, a_n), stale
        vel0 = vel[order]
        acc_s = acc0
        (_, _, _), stales = jax.lax.scan(
            body, (psort, vel0, acc_s), None, length=16)
        return stales

    try:
        stales = staleness(psort, state.vel, state.acc)
        print("s0 stale counts per frozen step (of 1M):",
              [int(x) for x in stales], flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"s0 staleness FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # ---- accuracy: resort_every=8 vs 1 over 32 steps ---------------------
    try:
        m1 = jax.jit(make_resort_multi_step(sf, DT, STEPS, 1))
        m8 = multis[8]
        o1, o8 = m1(state), m8(state)
        dp = float(jnp.max(jnp.abs(o1.pos - o8.pos)))
        dv = float(jnp.max(jnp.abs(o1.vel - o8.vel)))
        ascale = float(jnp.max(jnp.abs(o1.acc)))
        print(f"acc resort8-vs-1 over {STEPS} steps: max|dpos|={dp:.3e} "
              f"max|dvel|={dv:.3e} (|a|max {ascale:.2e})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"acc FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---- 1M sparse-cube hash (the honest published hash cell) -----------
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
    print("hash engine:", hf.engine_params["engine"],
          "frozen contract:", hasattr(hf, "frozen"), flush=True)
    hstate = jax.jit(
        lambda s: initialize_forces(s, lambda p, m: hf(p, m)[0][
            jnp.argsort(hf(p, m)[2])])
    )(hstate)
    hstate.block_until_ready()

    bench_multi("h0 hash sorted multi (ctrl)",
                jax.jit(make_sorted_multi_step(hf, DT, STEPS)),
                hstate, STEPS)
    if hasattr(hf, "frozen"):
        for k in (4, 8, 16):
            bench_multi(f"h{k} hash resort_every={k}",
                        jax.jit(make_resort_multi_step(hf, DT, STEPS, k)),
                        hstate, STEPS)


if __name__ == "__main__":
    main()
