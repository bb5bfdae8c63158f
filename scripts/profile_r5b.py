"""TPU probe r5b — attribute the table-vs-row divergence seen in r5a b.eq.

r5a measured max|dpos|=0.28 between table-resident cadence-1 stepping and
row-space sorted stepping after 8 steps at 1M (violent cold-collapse
scene). Two hypotheses: (a) a real per-row bug (suspects: the 317
overflow/side rows, a relayout channel swap), (b) ulp-level moment-order
differences amplified by the scene (|a| ~ 1e4 → per-step Lyapunov
stretching). This probe separates them:

  e1  ONE step, table cad-1 vs row sorted: pos must be BIT-EQUAL
      (identical drift arithmetic from identical inputs — no force in
      the diff path); acc/vel row-level stats + overflow-row attribution
      (is every diverging row a rank>=k row?)
  e2  TWO steps: growth factor of the e1 acc difference.
  e3  ONE step, gentle scene (Henon-normalized masses — mean |a| ~ 1e-2):
      same comparison where chaos cannot hide a bug.

Usage: python scripts/profile_r5b.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
DT = 1e-3


def compare(tag, cfg, state, p, steps):
    from nbody_tpu.ops.forces import make_sorted_force_fn
    from nbody_tpu.ops.integrator import make_sorted_multi_step
    from nbody_tpu.ops.table_step import make_table_multi_step

    sf = make_sorted_force_fn(cfg, pos_hint=state.pos)
    row = jax.jit(make_sorted_multi_step(sf, DT, steps))(state)
    tab = jax.jit(make_table_multi_step(p, DT, steps, 1))(state)
    pos_eq = bool(jnp.all(row.pos == tab.pos))
    da = np.asarray(jnp.abs(row.acc - tab.acc).max(axis=1))
    dv = np.asarray(jnp.abs(row.vel - tab.vel).max(axis=1))
    amax = float(jnp.max(jnp.abs(row.acc)))
    nbig = int((da > 1e-4 * amax).sum())
    print(f"{tag}: pos bit-equal={pos_eq} max|dacc|={da.max():.3e} "
          f"(|a|max={amax:.3e}) rows>1e-4rel={nbig} "
          f"max|dvel|={dv.max():.3e}", flush=True)
    if nbig:
        # overflow attribution: recompute rank under the engine binning
        pos_d = np.asarray(row.pos)  # row.pos == tab.pos when bit-equal
        lo = pos_d.min(axis=0)
        hi = pos_d.max(axis=0)
        d = p.d
        cell = (hi - lo).max() / d * (1 + 1e-6)
        cs = np.clip(((pos_d - lo) / cell).astype(np.int64), 0, d - 1)
        ids = (cs[:, 0] * d + cs[:, 1]) * d + cs[:, 2]
        o = np.argsort(ids, kind="stable")
        ids_s = ids[o]
        boundary = np.concatenate([[True], ids_s[1:] != ids_s[:-1]])
        run_start = np.maximum.accumulate(
            np.where(boundary, np.arange(N), 0))
        rank = np.arange(N) - run_start
        is_over = np.zeros(N, bool)
        is_over[o] = rank >= p.k
        bad = da > 1e-4 * amax
        print(f"    diverging rows: {bad.sum()} | overflow rows in scene: "
              f"{int(is_over.sum())} | diverging∧overflow: "
              f"{int((bad & is_over).sum())}", flush=True)
    return pos_eq


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import bh_engine_params
    from nbody_tpu.ops.forces import make_sorted_force_fn
    from nbody_tpu.ops.integrator import initialize_forces
    from nbody_tpu.ops.table_step import bh_table_params
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
    p = bh_table_params(levels=6, near_k=ep["near_k"])

    def prep(state, c):
        sf = make_sorted_force_fn(c, pos_hint=state.pos)
        return jax.jit(
            lambda s: initialize_forces(s, lambda po, m: sf(po, m)[0][
                jnp.argsort(sf(po, m)[2])])
        )(state)

    state = prep(init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0)), cfg)
    compare("e1 violent 1 step", cfg, state, p, 1)
    compare("e2 violent 2 steps", cfg, state, p, 2)

    # gentle scene: same geometry, Henon-normalized masses (total mass 1)
    gstate = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    gstate = jax.tree_util.tree_map(lambda x: x, gstate)
    import dataclasses

    gstate = dataclasses.replace(gstate, mass=gstate.mass / float(N))
    gstate = prep(gstate, cfg)
    compare("e3 gentle 1 step", cfg, gstate, p, 1)
    compare("e4 gentle 8 steps", cfg, gstate, p, 8)


if __name__ == "__main__":
    main()
