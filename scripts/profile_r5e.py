"""TPU probe r5e — adjudicate the table-vs-row BH divergence against
DIRECT N² ground truth, and price the ids_via_gather fix.

r5b established: after ONE step from identical (bit-equal) drifted
positions, the row-sorted control and the table engine disagree on
every row by ~GM/R² — the size of the whole-domain field — while the
control's own |a|max (~68 at 1M/G=1) is ~150x SMALLER than the physical
surface field (1e4). Prime suspect (build_sorted_grid docstring): the
production sorted path's BITCAST f32 ids column denormal-flushes to
zero in certain compiled program shapes (profile_r4c: an int32 gather
merely coexisting collapses rank to arange) — which would zero the
moments/far field (or the whole placement) ONLY in program shapes that
trigger the unification, e.g. the multi-step scan. The hash engines
(h.eq agreement in r5a) have no moments consumer and match.

This probe computes exact direct-N² accelerations at S sample rows for
the SAME drifted positions every engine sees on step 1, then scores:

  p0  standalone sorted force call (bitcast ids route), outside any scan
  p1  make_sorted_multi_step 1 step (bitcast route — r5a/r5b's control,
      and bench.py's current headline path)
  p2  make_sorted_multi_step 1 step, force built with ids_via_gather
  p3  make_table_multi_step 1 step (table-resident engine, int-native)
  p4  make_resort_multi_step 1 step (meta producer — already int-native)

plus min-of-3 32-step timings for p1/p2's programs to price the fix.

Usage: python scripts/profile_r5e.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
S = 2048  # direct-N2 sample rows
DT = 1e-3
EPS = 0.1
G = 1.0
THETA = 0.5


@functools.partial(jax.jit, static_argnums=())
def direct_at(pos, mass, tpos):
    """Exact O(S·N) softened direct acceleration at tpos (S, 3)."""

    def body(acc, chunk):
        ps, ms = chunk
        dx = ps[None, :, :] - tpos[:, None, :]          # (S, C, 3)
        r2 = jnp.sum(dx * dx, axis=-1) + EPS * EPS
        w = ms[None, :] * jax.lax.rsqrt(r2) / r2        # (S, C)
        return acc + jnp.einsum("sc,scd->sd", w, dx), None

    C = 10_000  # divides N=1e6 exactly
    chunks = (pos.reshape(-1, C, 3), mass.reshape(-1, C))
    acc, _ = jax.lax.scan(body, jnp.zeros_like(tpos), chunks)
    return G * acc


def score(tag, acc_full, idx, a_ref, extra=""):
    a = np.asarray(acc_full)[idx]
    da = np.abs(a - a_ref).max(axis=1)
    ref = np.abs(a_ref).max()
    print(
        f"{tag}: max|err|={da.max():.3e} med={np.median(da):.3e} "
        f"(|a_direct|max={ref:.3e}) rows>1%={int((da > 1e-2 * ref).sum())}"
        f"/{len(idx)} {extra}",
        flush=True,
    )


def timed(multi, state, steps, reps=3):
    out = multi(state)
    float(jnp.sum(out.pos[0]))  # real readback warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = multi(out)
        float(jnp.sum(out.pos[0]))
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        barnes_hut_forces_sorted,
        bh_engine_params,
    )
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        make_resort_multi_step,
        make_sorted_multi_step,
    )
    from nbody_tpu.ops.table_step import bh_table_params, make_table_multi_step
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
    print(f"engine params: {ep}", flush=True)

    def sf_bitcast(pos, mass, extra=None):
        return barnes_hut_forces_sorted(
            pos, mass, G, EPS, THETA, levels=6, near_k=ep["near_k"],
            extra=extra,
        )

    def sf_gather(pos, mass, extra=None):
        return barnes_hut_forces_sorted(
            pos, mass, G, EPS, THETA, levels=6, near_k=ep["near_k"],
            extra=extra, ids_via_gather=True,
        )

    sf_bitcast.route_extra = False
    sf_gather.route_extra = False
    # frozen contract for make_resort_multi_step
    from nbody_tpu.ops.barnes_hut import barnes_hut_forces_frozen

    sf_gather.with_meta = lambda pos, mass: barnes_hut_forces_sorted(
        pos, mass, G, EPS, THETA, levels=6, near_k=ep["near_k"],
        with_grid_meta=True,
    )
    sf_gather.frozen = lambda psort, meta: barnes_hut_forces_frozen(
        psort, meta, G, EPS, THETA, levels=6, near_k=ep["near_k"],
    )

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0)
    )
    state = jax.jit(
        lambda s: initialize_forces(
            s,
            lambda po, m: sf_gather(po, m)[0][
                jnp.argsort(sf_gather(po, m)[2])
            ],
        )
    )(state)
    state.block_until_ready()

    # the drifted positions every engine evaluates on step 1
    pos_d = jax.jit(
        lambda s: s.pos + s.vel * DT + (0.5 * DT * DT) * s.acc
    )(state)
    idx = np.arange(0, N, N // S)[:S]
    tpos = pos_d[jnp.asarray(idx)]
    a_ref = np.asarray(direct_at(pos_d, state.mass, tpos))
    print(f"direct ground truth at {S} rows done", flush=True)

    # p0: standalone sorted call (bitcast), unsorted back
    @jax.jit
    def standalone(pos, mass):
        acc_s, _ps, order = sf_bitcast(pos, mass)[:3]
        return acc_s[jnp.argsort(order)]

    score("p0 standalone bitcast ", standalone(pos_d, state.mass), idx, a_ref)

    # p1: 1-step sorted multi (bitcast) — the current bench.py path
    row1 = jax.jit(make_sorted_multi_step(sf_bitcast, DT, 1))(state)
    score("p1 multi-step bitcast  ", row1.acc, idx, a_ref)

    # p2: 1-step sorted multi with int-native ids
    row2 = jax.jit(make_sorted_multi_step(sf_gather, DT, 1))(state)
    score("p2 multi-step idgather ", row2.acc, idx, a_ref)

    # p3: 1-step table-resident
    p = bh_table_params(levels=6, near_k=ep["near_k"])
    tab = jax.jit(make_table_multi_step(p, DT, 1, 1))(state)
    score("p3 table entry         ", tab.acc, idx, a_ref)

    # p4: 1-step resort-multi (meta producer, int-native)
    row4 = jax.jit(make_resort_multi_step(sf_gather, DT, 1, 1))(state)
    score("p4 resort-multi meta   ", row4.acc, idx, a_ref)

    # timing: price the fix at 32 steps
    for tag, sf in (("bitcast", sf_bitcast), ("idgather", sf_gather)):
        multi = jax.jit(make_sorted_multi_step(sf, DT, 32))
        ms = timed(multi, state, 32) * 1e3
        print(f"t.{tag}: {ms:.2f} ms/step ({1e3 / ms:.2f} steps/s)",
              flush=True)


if __name__ == "__main__":
    main()
