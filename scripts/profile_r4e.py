"""TPU profile r4e — adaptive (audit-driven) re-sort value and overhead.

make_adaptive_multi_step takes frozen steps while the audited stale
fraction stays under the bound, re-sorting when it trips (one-step lag)
or at the cadence cap. Two scenes bracket its behavior:

  h0/ha  1M sparse-cube hash (gentle: short-range forces, cold start) —
         the scene where frozen steps are honest. ha should approach the
         fixed-cadence ceiling (~h16, profile_r4d.py) with ZERO
         configuration; also prints the re-sort count over 32 steps.
  b0/ba  1M cold-collapse BH (violent: ~1.8%/step crossings) — adaptive
         must degrade to ~every-step sorting; ba-vs-b0 is the machinery
         overhead (audit + cond) and the trajectory must stay finite.

Usage: python scripts/profile_r4e.py
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


def bench_multi(name, multi, state, steps, traced=False):
    try:
        out = multi(state)
        jax.block_until_ready(out)
        best = float("inf")
        trace = None
        for _ in range(3):
            t0 = time.perf_counter()
            o2 = multi(out[0] if traced else out)
            if traced:
                o2, trace = o2
            chk = float(jnp.sum(o2.pos[0]))
            best = min(best, time.perf_counter() - t0)
        per = best / steps * 1000
        msg = (f"{name:44s} {per:8.2f} ms/step ({steps / best:7.2f} steps/s)"
               f" (chk {chk:.4e})")
        if traced and trace is not None:
            resorts = int(np.asarray(trace[1]).sum()) + 1  # + initial sort
            stales = np.asarray(trace[0])
            msg += f" resorts={resorts}/{steps} max_stale={stales.max()}"
        print(msg, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def main():
    from nbody_tpu.models.distributions import init_spherical, init_uniform
    from nbody_tpu.ops.forces import make_sorted_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_adaptive_multi_step,
        make_sorted_multi_step,
    )
    from nbody_tpu.types import (
        ForceMethod,
        SimulationConfig,
        SphericalDistParams,
        UniformDistParams,
    )

    print(f"backend={jax.default_backend()}", flush=True)

    # ---- gentle scene: 1M sparse-cube hash -------------------------------
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
    bench_multi("h0 hash sorted multi (ctrl)",
                jax.jit(make_sorted_multi_step(hf, DT, STEPS)),
                hstate, STEPS)
    bench_multi("ha hash adaptive (1% stale, cap 16)",
                jax.jit(make_adaptive_multi_step(
                    hf, DT, STEPS, max_stale_frac=0.01, max_cadence=16,
                    with_trace=True)),
                hstate, STEPS, traced=True)

    # ---- violent scene: 1M cold-collapse BH ------------------------------
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
                jax.jit(make_sorted_multi_step(sf, DT, STEPS)),
                state, STEPS)
    bench_multi("ba BH adaptive (1% stale, cap 16)",
                jax.jit(make_adaptive_multi_step(
                    sf, DT, STEPS, max_stale_frac=0.01, max_cadence=16,
                    with_trace=True)),
                state, STEPS, traced=True)


if __name__ == "__main__":
    main()
