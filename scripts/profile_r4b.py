"""TPU profile r4b — frozen-grid meta fix verification + real staleness.

r4a exposed a TPU hazard: outputting the engines' f32-bitcast id column
from a jit materializes it, TPU copy paths flush its denormal bit
patterns to zero, and CSE feeds the zeroed buffer back to in-program
consumers — standalone ``with_meta`` calls returned all-zero ids (and
broken placement), while the fused multi-steps (which never materialize
the column) were bit-correct. The fix derives meta.ids from a separate
int32 gather. This script verifies the fix on hardware and re-measures
what r4a's poisoned harness got wrong:

  v0  with_meta standalone: ids nonzero, monotone, match numpy binning
  v1  frozen(fresh meta) == sorted force allclose at 1M (standalone)
  s0  REAL staleness growth over 16 frozen steps (bench scene)
  s1  staleness after k steps from a COLD start vs a 200-step-evolved
      state (velocities grown — the conservative cadence bound)
  b8/b16  re-time BH resort cadence with the fixed meta (+1 int gather
      per re-sort)
  h8/h16  same for the sparse hash

Usage: python scripts/profile_r4b.py
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
        print(f"{name:52s} {per:8.2f} ms/step ({steps / best:7.2f} steps/s)"
              f" (chk {chk:.4e})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:300]}",
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

    # ---- v0: standalone meta integrity ----------------------------------
    acc0, psort, order, meta = jax.jit(sf.with_meta)(state.pos, state.mass)
    ids = np.asarray(meta.ids)
    P = np.asarray(psort)
    d = 64
    cs = np.clip(((P[:, :3] - np.asarray(meta.lo)) / np.asarray(meta.cell))
                 .astype(np.int32), 0, d - 1)
    ids_np = (cs[:, 0] * d + cs[:, 1]) * d + cs[:, 2]
    print(f"v0 meta ids: nonzero={int((ids != 0).sum())} "
          f"monotone={bool((np.diff(ids) >= 0).all())} "
          f"mismatch-vs-numpy={int((ids != ids_np).sum())}", flush=True)

    # ---- v1: standalone frozen == sorted --------------------------------
    accf = jax.jit(
        lambda p, m: sf.frozen(p, m)
    )(psort, meta)
    a0 = np.asarray(acc0)
    scale = float(np.abs(a0).max())
    md = float(np.abs(np.asarray(accf) - a0).max())
    print(f"v1 frozen(fresh meta) vs sorted: max|diff| = {md:.3e} "
          f"(|a|max {scale:.2e})", flush=True)

    # ---- s0/s1: REAL staleness growth ------------------------------------
    state_i = jax.jit(
        lambda s: initialize_forces(s, lambda p, m: sf(p, m)[0][
            jnp.argsort(sf(p, m)[2])])
    )(state)

    def staleness_from(st, tag):
        accs, psorts, orders, metas = jax.jit(sf.with_meta)(st.pos, st.mass)

        @jax.jit
        def run(psort, vel, acc):
            def body(c, _):
                ps, v, a = c
                pos_d = ps[:, :3] + v * DT + (0.5 * DT * DT) * a
                ps_d = jnp.concatenate([pos_d, ps[:, 3:4]], axis=-1)
                a_n, stale = sf.frozen(ps_d, metas, with_audit=True)
                v_n = v + (0.5 * DT) * (a + a_n)
                return (ps_d, v_n, a_n), stale
            (_, _, _), stales = jax.lax.scan(
                body, (psort, vel, acc), None, length=16)
            return stales

        stales = run(psorts, st.vel[orders], accs)
        print(f"{tag} stale counts/step (of 1M):",
              [int(x) for x in stales], flush=True)

    staleness_from(state_i, "s0 cold start")
    warm = jax.jit(make_sorted_multi_step(sf, DT, 200))(state_i)
    warm.block_until_ready()
    staleness_from(warm, "s1 after 200 steps")

    # ---- b: cadence timings with fixed meta ------------------------------
    for k in (8, 16):
        bench_multi(f"b{k} BH resort_every={k} (fixed meta)",
                    jax.jit(make_resort_multi_step(sf, DT, STEPS, k)),
                    state_i, STEPS)

    # ---- hash ------------------------------------------------------------
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
    hacc, hpsort, horder, hmeta = jax.jit(hf.with_meta)(
        hstate.pos, hstate.mass)
    hids = np.asarray(hmeta.ids)
    print(f"v0h hash meta ids: nonzero={int((hids != 0).sum())} "
          f"monotone={bool((np.diff(hids) >= 0).all())}", flush=True)
    haccf = jax.jit(lambda p, m: hf.frozen(p, m))(hpsort, hmeta)
    hscale = float(np.abs(np.asarray(hacc)).max())
    hmd = float(np.abs(np.asarray(haccf) - np.asarray(hacc)).max())
    print(f"v1h hash frozen vs sorted: max|diff| = {hmd:.3e} "
          f"(|a|max {hscale:.2e})", flush=True)
    hstate_i = jax.jit(
        lambda s: initialize_forces(s, lambda p, m: hf(p, m)[0][
            jnp.argsort(hf(p, m)[2])])
    )(hstate)
    for k in (8, 16):
        bench_multi(f"h{k} hash resort_every={k} (fixed meta)",
                    jax.jit(make_resort_multi_step(hf, DT, STEPS, k)),
                    hstate_i, STEPS)


if __name__ == "__main__":
    main()
