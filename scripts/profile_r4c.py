"""TPU bisect r4c — why does the STANDALONE frozen path disagree at 1M?

r4b (after the meta.ids int-gather fix) measured:
  - v0: meta.ids integrity OK standalone (nonzero, monotone, ==numpy)
  - v1: frozen(fresh meta) vs sorted max|diff| = 9.6e3  (BROKEN)
  - s0: "staleness" growing 0 -> 996k/16 steps — now suspected to be
    REAL motion driven by the garbage frozen accelerations (cold-start
    sphere physically cannot cross 99% of cells in 16 dt=1e-3 steps)
  - b8: make_resort_multi_step chk NaN (r4a pre-fix: bit-identical) —
    either the same corruption or a wedged worker late in that run.

v0 validates ids+psort+lo+cell together (the numpy rebinning uses all
four). The one meta field it does NOT validate is ``rank``. This script
bisects, in dependency order, with everything batched in one process:

  a0  m1-vs-m8 cadence equivalence from a fresh state (re-run r4a's acc
      check post-fix, FIRST, before any heavy program can wedge the
      worker) — is the in-program product path still bit-clean?
  a1  numpy-validate the MATERIALIZED meta.rank against rank recomputed
      from the materialized meta.ids (pure numpy — no extra compile)
  a2  frozen(psort, meta) standalone                      [r4b v1 repeat]
  a3  frozen with rank RECOMPUTED in-jit from meta.ids    [bypasses
      meta.rank; if a2 breaks and a3 matches, the materialized rank is
      the corruption]
  a4  frozen composed with with_meta IN ONE JIT (meta never crosses a
      boundary) — the in-program truth

Usage: python scripts/profile_r4c.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
DT = 1e-3


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.forces import make_sorted_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_resort_multi_step,
    )
    from nbody_tpu.types import ForceMethod, SimulationConfig, SphericalDistParams

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

    # ---- a0: in-program cadence path, fresh worker ----------------------
    try:
        m1 = jax.jit(make_resort_multi_step(sf, DT, 32, 1))
        m8 = jax.jit(make_resort_multi_step(sf, DT, 32, 8))
        o1, o8 = m1(state), m8(state)
        dp = float(jnp.max(jnp.abs(o1.pos - o8.pos)))
        dv = float(jnp.max(jnp.abs(o1.vel - o8.vel)))
        fin1 = bool(jnp.all(jnp.isfinite(o1.pos)))
        fin8 = bool(jnp.all(jnp.isfinite(o8.pos)))
        print(f"a0 m8-vs-m1 32 steps: max|dpos|={dp:.3e} max|dvel|={dv:.3e} "
              f"finite(m1)={fin1} finite(m8)={fin8}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"a0 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---- materialize meta across the jit boundary ------------------------
    acc0, psort, order, meta = jax.jit(sf.with_meta)(state.pos, state.mass)
    ids = np.asarray(meta.ids)
    rank = np.asarray(meta.rank)
    a0 = np.asarray(acc0)

    # ---- a1: numpy-validate materialized rank ----------------------------
    boundary = np.concatenate([[True], ids[1:] != ids[:-1]])
    run_start = np.maximum.accumulate(
        np.where(boundary, np.arange(N), 0))
    rank_np = np.arange(N) - run_start
    nbad = int((rank != rank_np).sum())
    print(f"a1 meta.rank: dtype={rank.dtype} min={rank.min()} "
          f"max={rank.max()} mismatch-vs-numpy={nbad}"
          + (f" first-bad={np.argmax(rank != rank_np)}" if nbad else ""),
          flush=True)

    # ---- a2: frozen standalone (r4b v1 repeat) ----------------------------
    scale = float(np.abs(a0).max())
    try:
        accf = jax.jit(lambda p, m: sf.frozen(p, m))(psort, meta)
        md = float(np.abs(np.asarray(accf) - a0).max())
        print(f"a2 frozen(materialized meta): max|diff| = {md:.3e} "
              f"(|a|max {scale:.2e})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"a2 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---- a3: frozen with rank recomputed in-jit from meta.ids -------------
    try:
        import dataclasses

        from nbody_tpu.ops.sorted_window import sorted_ranks

        @jax.jit
        def frozen_rerank(p, m):
            m2 = dataclasses.replace(m, rank=sorted_ranks(m.ids))
            return sf.frozen(p, m2)

        accr = frozen_rerank(psort, meta)
        md = float(np.abs(np.asarray(accr) - a0).max())
        print(f"a3 frozen(rank recomputed in-jit): max|diff| = {md:.3e}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"a3 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---- a4: with_meta + frozen fused in ONE jit --------------------------
    try:
        @jax.jit
        def roundtrip(pos, mass):
            a, p, _o, m = sf.with_meta(pos, mass)
            af = sf.frozen(p, m)
            return jnp.max(jnp.abs(af - a))

        md = float(roundtrip(state.pos, state.mass))
        print(f"a4 frozen in-program (one jit):   max|diff| = {md:.3e}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"a4 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
