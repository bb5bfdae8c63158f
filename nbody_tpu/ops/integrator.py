"""Velocity Verlet symplectic integrator + energy observability.

TPU-native counterpart of the reference's integrator component
(reference: src/cuda/integrator.cu:224-238 step; 51-119, 252-289 energy).

Where the reference launches 4+ kernels per step (store-old-acc, positions,
force, velocities) plus D2H reductions for energy, here a step is ONE pure
function ``state -> state`` that XLA compiles into a single fused program;
acc_old never exists as a buffer — the old acceleration is simply the value
threaded through the step. Energy reductions stay on device (psum-ready for
the sharded path) instead of the reference's block-reduce + host-sum.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

from nbody_tpu.state import ParticleState

# force_fn(pos (N,3), mass (N,)) -> acc (N,3)
ForceFn = Callable[[jax.Array, jax.Array], jax.Array]


def verlet_step(state: ParticleState, force_fn: ForceFn, dt) -> ParticleState:
    """One Velocity Verlet step (reference: integrator.cu:224-238):

      x(t+dt) = x(t) + v(t)·dt + ½·a(t)·dt²
      a(t+dt) = F(x(t+dt)) / m
      v(t+dt) = v(t) + ½·(a(t) + a(t+dt))·dt
    """
    dt = jnp.asarray(dt, state.pos.dtype)
    pos = state.pos + state.vel * dt + (0.5 * dt * dt) * state.acc
    acc = force_fn(pos, state.mass)
    vel = state.vel + (0.5 * dt) * (state.acc + acc)
    return ParticleState(
        pos=pos, vel=vel, acc=acc, mass=state.mass, time=state.time + dt
    )


def make_verlet_step(force_fn: ForceFn, dt: float):
    """Strategy-via-closure step factory (replaces the reference's
    ForceCalculator vtable dispatch, include/nbody/force_calculator.hpp:36-89).
    Returns a jittable ``step(state) -> state``."""

    def step(state: ParticleState) -> ParticleState:
        return verlet_step(state, force_fn, dt)

    return step


def make_multi_step(force_fn: ForceFn, dt: float, n_steps: int):
    """``n_steps`` Verlet steps fused into one XLA program via lax.scan —
    the whole benchmark loop is a single device launch."""

    def body(state, _):
        return verlet_step(state, force_fn, dt), None

    def multi(state: ParticleState) -> ParticleState:
        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    return multi


def initialize_forces(state: ParticleState, force_fn: ForceFn) -> ParticleState:
    """Compute a(t=0) so the first Verlet step is correct
    (reference: particle_system.cpp:91)."""
    return dataclasses.replace(state, acc=force_fn(state.pos, state.mass))


# ---------------------------------------------------------------------------
# Sorted-state stepping (TPU scale path — no reference counterpart)
# ---------------------------------------------------------------------------
#
# The cell-sorted force engines (Barnes-Hut tiles, spatial hash) sort
# particles by cell id internally and un-sort the result every call — a
# ~13 ms gather at 1M that exists only to restore an order the next step
# immediately re-sorts. Stepping IN sorted order deletes it: the force
# returns (acc, psort, order) in its own sorted row order, the integrator
# re-sorts its payload (half-kicked velocity + the original-row tag) with
# ONE width-insensitive gather, and the original order is reconstructed
# once at readout, not once per step.

# sorted_force_fn(pos (N,3), mass (N,), extra (N,E) f32 | None) ->
#   (acc_sorted (N,3), psort (N,4) [x,y,z,mass], order (N,) i32
#    [, extra_sorted (N,E) — iff extra was given])
# ``extra`` rides the engine's OWN sort gather (row gathers are
# width-insensitive on TPU, so the columns are free) — the integrator
# ships its payload there instead of paying a second 1M-row gather.
SortedForceFn = Callable[..., tuple]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SortedState:
    """Integration state whose rows live in an ARBITRARY permutation of the
    original particle order; ``to_orig[i]`` is row i's original index.
    ``to_particle_state`` restores the original order (one gather)."""

    pos: jax.Array      # (N, 3)
    vel: jax.Array      # (N, 3)
    acc: jax.Array      # (N, 3)
    mass: jax.Array     # (N,)
    to_orig: jax.Array  # (N,) int32
    time: jax.Array     # ()


def sorted_state_from(state: ParticleState) -> SortedState:
    """ParticleState → SortedState (identity permutation; ``state.acc``
    must already hold a(t), see ``initialize_forces``)."""
    n = state.pos.shape[0]
    return SortedState(
        pos=state.pos, vel=state.vel, acc=state.acc, mass=state.mass,
        to_orig=jnp.arange(n, dtype=jnp.int32),
        time=state.time,
    )


def to_particle_state(s: SortedState) -> ParticleState:
    """SortedState → ParticleState in ORIGINAL row order (one gather —
    rows[argsort(to_orig)] is the inverse permutation in gather form,
    the same trick as sorted_window.unsort_rows)."""
    inv = jnp.argsort(s.to_orig)
    return ParticleState(
        pos=s.pos[inv], vel=s.vel[inv], acc=s.acc[inv], mass=s.mass[inv],
        time=s.time,
    )


def sorted_verlet_step(
    s: SortedState, sorted_force_fn: SortedForceFn, dt,
    route_extra: bool = False,
) -> SortedState:
    """One Velocity Verlet step entirely in sorted space.

    The half-kicked velocity and the original-row tag must be re-sorted
    by the engine's permutation each step. Two measured routes
    (scripts/profile_r3w2.py, integrated 1M multi-steps):

      * ``route_extra=False``: the velocity takes ONE separate (N, 3)
        row gather and the tag its own int32 gather by the returned
        permutation. (The r3-era numbers that crowned this route were
        measured on the denormal-flushed engine and are void.)
      * ``route_extra=True``: velocity AND the tag
        (as an exact f32 VALUE column — a value cast, not the
        denormal-hazard bitcast; tags < N < 2²⁴ round-trip exactly)
        ride the force's INTERNAL sort gather as a 4-column ``extra``
        — the whole step is ONE 9-wide payload gather. Honest r5h
        measurement: a 9-col gather costs 11.6 ms vs 16.4 for the
        8-col + int-ids pair it subsumes, and the separate vel gather
        alone costs 6.8 ms (profile_r5h.py g0/g1/y0/y1).
    """
    dt = jnp.asarray(dt, s.pos.dtype)
    pos_d = s.pos + s.vel * dt + (0.5 * dt * dt) * s.acc
    vel_h = s.vel + (0.5 * dt) * s.acc
    if route_extra:
        ext = jnp.concatenate(
            [vel_h, s.to_orig.astype(s.pos.dtype)[:, None]], axis=-1
        )
        acc_s, psort, order, pay = sorted_force_fn(pos_d, s.mass, ext)
        to_orig = pay[:, 3].astype(jnp.int32)
    else:
        acc_s, psort, order = sorted_force_fn(pos_d, s.mass)[:3]
        pay = vel_h[order]
        to_orig = s.to_orig[order]
    vel_s = pay[:, :3] + (0.5 * dt) * acc_s
    return SortedState(
        pos=psort[:, :3], vel=vel_s, acc=acc_s, mass=psort[:, 3],
        to_orig=to_orig, time=s.time + dt,
    )


def make_sorted_multi_step(
    sorted_force_fn: SortedForceFn, dt: float, n_steps: int,
    route_extra: bool | None = None,
):
    """``n_steps`` sorted Verlet steps fused into one XLA program.

    Returns ``multi(state: ParticleState) -> ParticleState`` — original
    row order in, original row order out; the sorted permutation is purely
    internal to the scan. Per-step saving vs ``make_multi_step`` on the
    sorted engines: the unsort gather (~13 ms at 1M) minus one payload
    gather (~3 ms).

    The scan carry packs the velocity and the original-row tag into ONE
    (N, 4) ``vel_tag`` array with the tag as an EXACT float (valid for
    N < 2²⁴; larger N falls back to the bitcast step): both half-kicks
    then double as the payload transform — ``vel_tag + ½dt·[acc | 0]``
    touches the tag column only with exact +0.0. ``route_extra`` picks
    how the payload is re-sorted each step (see ``sorted_verlet_step``;
    the separate gather measures best for both production engines).
    Bit-identical velocity arithmetic (same op order per component).
    ``route_extra=None`` defers to the force closure's own preference
    (the ``route_extra`` attribute the engine factories set),
    defaulting to the separate gather.
    """
    if route_extra is None:
        route_extra = bool(getattr(sorted_force_fn, "route_extra", False))
    n_f32_exact = 1 << 24

    def body_packed(c, _):
        pos, vel_tag, acc, mass, t = c
        dtc = jnp.asarray(dt, pos.dtype)
        pos_d = pos + vel_tag[:, :3] * dtc + (0.5 * dtc * dtc) * acc
        acc4 = jnp.pad(acc, ((0, 0), (0, 1)))
        pay = vel_tag + (0.5 * dtc) * acc4
        if route_extra:
            acc_s, psort, order, pay = sorted_force_fn(pos_d, mass, pay)
        else:
            acc_s, psort, order = sorted_force_fn(pos_d, mass)[:3]
            pay = pay[order]
        vel_tag_n = pay + (0.5 * dtc) * jnp.pad(acc_s, ((0, 0), (0, 1)))
        return (psort[:, :3], vel_tag_n, acc_s, psort[:, 3], t + dtc), None

    def body_bitcast(s, _):
        return sorted_verlet_step(s, sorted_force_fn, dt, route_extra), None

    def multi(state: ParticleState) -> ParticleState:
        n = state.pos.shape[0]
        if n >= n_f32_exact:
            s0 = sorted_state_from(state)
            out, _ = jax.lax.scan(body_bitcast, s0, None, length=n_steps)
            return to_particle_state(out)
        tagf = jnp.arange(n, dtype=state.pos.dtype)[:, None]
        c0 = (
            state.pos,
            jnp.concatenate([state.vel, tagf], axis=-1),
            state.acc,
            state.mass,
            state.time,
        )
        (pos, vel_tag, acc, mass, t), _ = jax.lax.scan(
            body_packed, c0, None, length=n_steps
        )
        inv = jnp.argsort(vel_tag[:, 3].astype(jnp.int32))
        return ParticleState(
            pos=pos[inv], vel=vel_tag[inv, :3], acc=acc[inv],
            mass=mass[inv], time=t,
        )

    return multi


def make_resort_multi_step(
    sorted_force_fn: SortedForceFn, dt: float, n_steps: int,
    resort_every: int,
):
    """``n_steps`` Verlet steps with the cell RE-SORT amortized over
    ``resort_every`` steps — one fused XLA program.

    When per-step motion is ≪ one cell, re-deriving the cell assignment
    every step (argsort + payload gather, ~12 ms/step at 1M between the
    engine sort and the integrator payload) mostly recomputes the
    identity. Steps are grouped into chunks of ``resort_every``: the
    chunk's FIRST step runs the full sorted pipeline
    (``sorted_force_fn.with_meta`` — re-sort + cached
    ``FrozenGridMeta``), the remaining steps run the engine's FROZEN
    form (``sorted_force_fn.frozen``) against that cached assignment —
    no sort, no payload gather, no rank pass. With a fresh meta the
    frozen pipeline is the SAME pipeline (bit-identical at 1M on
    hardware — scripts/profile_r4d.py a2); between re-sorts,
    boundary-crossing rows keep exact positions/masses but a stale
    near-window center and expansion cell, so cadence accuracy is
    SCENE-DEPENDENT: bound it with ``frozen(..., with_audit=True)``
    staleness counts before trusting ``resort_every > 1`` on a new
    scene (the violent 1M cold-collapse bench crosses ~1.8% of cells
    per dt=1e-3 step — cadence > 1 is NOT appropriate there,
    profile_r4d.py s0/a0). ``resort_every=1`` is exactly
    ``make_sorted_multi_step`` semantics. The reference re-sorts every
    step (Thrust, force_barnes_hut.cu:276-280) — the cadence is a
    TPU-build extension.

    Requires the engine's frozen contract (``with_meta``/``frozen``
    attributes — BH tiles and hash tiles factories) and the packed
    exact-float tag (N < 2²⁴ — callers at larger N use
    ``make_sorted_multi_step``).

    Returns ``multi(state: ParticleState) -> ParticleState`` (original
    row order in and out, as make_sorted_multi_step).
    """
    if resort_every < 1:
        raise ValueError("resort_every must be >= 1")
    with_meta = getattr(sorted_force_fn, "with_meta", None)
    frozen = getattr(sorted_force_fn, "frozen", None)
    if with_meta is None or frozen is None:
        raise ValueError(
            "sorted_force_fn has no frozen-grid contract "
            "(with_meta/frozen attributes) — use make_sorted_multi_step"
        )
    n_f32_exact = 1 << 24

    def pad4(a):
        return jnp.pad(a, ((0, 0), (0, 1)))

    def sorted_step(c):
        """Full re-sort step: identical arithmetic to
        make_sorted_multi_step.body_packed, plus the cached meta out."""
        pos, vel_tag, acc, mass, t = c
        dtc = jnp.asarray(dt, pos.dtype)
        pos_d = pos + vel_tag[:, :3] * dtc + (0.5 * dtc * dtc) * acc
        pay = vel_tag + (0.5 * dtc) * pad4(acc)
        acc_s, psort, order, meta = with_meta(pos_d, mass)
        pay = pay[order]
        vel_tag_n = pay + (0.5 * dtc) * pad4(acc_s)
        return (psort, vel_tag_n, acc_s, t + dtc), meta

    def frozen_step(fc, meta):
        """Stale-sort step: rows stay put — no permutation, no gather."""
        psort, vel_tag, acc, t = fc
        dtc = jnp.asarray(dt, psort.dtype)
        pos_d = (
            psort[:, :3] + vel_tag[:, :3] * dtc + (0.5 * dtc * dtc) * acc
        )
        psort_d = jnp.concatenate([pos_d, psort[:, 3:4]], axis=-1)
        # same two-half-kick op order as the sorted step (bit-identical
        # velocity arithmetic across cadences)
        pay = vel_tag + (0.5 * dtc) * pad4(acc)
        acc_n = frozen(psort_d, meta)
        vel_tag_n = pay + (0.5 * dtc) * pad4(acc_n)
        return (psort_d, vel_tag_n, acc_n, t + dtc)

    def chunk(c, length):
        (psort, vel_tag, acc, t), meta = sorted_step(c)

        def fbody(fc, _):
            return frozen_step(fc, meta), None

        (psort, vel_tag, acc, t), _ = jax.lax.scan(
            fbody, (psort, vel_tag, acc, t), None, length=length - 1
        )
        mass = psort[:, 3]
        return (psort[:, :3], vel_tag, acc, mass, t)

    n_chunks, rem = divmod(n_steps, resort_every)

    def multi(state: ParticleState) -> ParticleState:
        n = state.pos.shape[0]
        if n >= n_f32_exact:
            raise ValueError(
                "make_resort_multi_step requires N < 2^24 (exact float "
                "row tags); use make_sorted_multi_step"
            )
        tagf = jnp.arange(n, dtype=state.pos.dtype)[:, None]
        c = (
            state.pos,
            jnp.concatenate([state.vel, tagf], axis=-1),
            state.acc,
            state.mass,
            state.time,
        )
        if n_chunks > 0:

            def body(cc, _):
                return chunk(cc, resort_every), None

            c, _ = jax.lax.scan(body, c, None, length=n_chunks)
        if rem:
            c = chunk(c, rem)
        pos, vel_tag, acc, mass, t = c
        inv = jnp.argsort(vel_tag[:, 3].astype(jnp.int32))
        return ParticleState(
            pos=pos[inv], vel=vel_tag[inv, :3], acc=acc[inv],
            mass=mass[inv], time=t,
        )

    return multi


def make_adaptive_multi_step(
    sorted_force_fn: SortedForceFn, dt: float, n_steps: int,
    *, max_stale_frac: float = 0.01, max_cadence: int = 16,
    with_trace: bool = False,
):
    """``n_steps`` Verlet steps that re-sort WHEN THE SCENE ASKS —
    audit-driven frozen-grid stepping in one fused XLA program.

    A fixed ``resort_every`` cadence is the wrong control for the
    frozen-grid machinery because staleness is scene-dependent (the 1M
    cold-collapse bench crosses ~1.8% of cells per dt=1e-3 step and
    diverges under any fixed cadence > 1, while gentle scenes cross
    ~none — scripts/profile_r4d.py s0). Here every frozen step audits
    itself (``frozen(..., with_audit=True)`` — measured ~free, +0.08 ms
    at 1M, profile_r4a.py f0/f1) and the NEXT step re-sorts via
    ``lax.cond`` when the audited stale fraction exceeded
    ``max_stale_frac`` or ``max_cadence`` frozen steps have run. On a
    violent scene this degrades to the reference's re-sort-every-step
    semantics (force_barnes_hut.cu:276-280) with zero configuration; on
    a quiet scene it rides the frozen fast path.

    The trigger lags the audit by one step (the staleness that crossed
    the threshold was already incurred), so the realized error bound is
    ``max_stale_frac`` plus one step's crossings — pick the threshold
    with that margin. ``with_trace=True`` makes the returned function
    also return the per-step ``(stale_counts, resorted)`` arrays for
    diagnostics and tests.

    Same contract as ``make_resort_multi_step`` (engine
    ``with_meta``/``frozen`` attributes, N < 2²⁴, original row order in
    and out); step arithmetic mirrors it: ``max_cadence=1`` reproduces
    cadence-1 bitwise (every step re-sorts — the audit never runs), and
    ``max_stale_frac=1`` (staleness never triggers) reproduces the
    fixed ``max_cadence`` up to ulp-level fusion differences from the
    always-on audit (tests/test_frozen_grid.py pins both).
    """
    if not 0.0 <= max_stale_frac <= 1.0:
        raise ValueError("max_stale_frac must be in [0, 1]")
    if max_cadence < 1:
        raise ValueError("max_cadence must be >= 1")
    with_meta = getattr(sorted_force_fn, "with_meta", None)
    frozen = getattr(sorted_force_fn, "frozen", None)
    if with_meta is None or frozen is None:
        raise ValueError(
            "sorted_force_fn has no frozen-grid contract "
            "(with_meta/frozen attributes) — use make_sorted_multi_step"
        )
    n_f32_exact = 1 << 24

    def pad4(a):
        return jnp.pad(a, ((0, 0), (0, 1)))

    def sorted_step(psort, vel_tag, acc, t):
        """Identical arithmetic to make_resort_multi_step.sorted_step,
        on the packed (N, 4) carry."""
        dtc = jnp.asarray(dt, psort.dtype)
        pos_d = psort[:, :3] + vel_tag[:, :3] * dtc + (0.5 * dtc * dtc) * acc
        pay = vel_tag + (0.5 * dtc) * pad4(acc)
        acc_s, psort_n, order, meta = with_meta(pos_d, psort[:, 3])
        pay = pay[order]
        vel_tag_n = pay + (0.5 * dtc) * pad4(acc_s)
        return psort_n, vel_tag_n, acc_s, t + dtc, meta

    def frozen_step(psort, vel_tag, acc, t, meta):
        dtc = jnp.asarray(dt, psort.dtype)
        pos_d = psort[:, :3] + vel_tag[:, :3] * dtc + (0.5 * dtc * dtc) * acc
        psort_d = jnp.concatenate([pos_d, psort[:, 3:4]], axis=-1)
        pay = vel_tag + (0.5 * dtc) * pad4(acc)
        acc_n, n_stale = frozen(psort_d, meta, with_audit=True)
        vel_tag_n = pay + (0.5 * dtc) * pad4(acc_n)
        # audit count dtype varies with the host int regime — pin it so
        # the lax.cond branches agree
        return psort_d, vel_tag_n, acc_n, t + dtc, n_stale.astype(jnp.int32)

    def multi(state: ParticleState):
        n = state.pos.shape[0]
        if n >= n_f32_exact:
            raise ValueError(
                "make_adaptive_multi_step requires N < 2^24 (exact float "
                "row tags); use make_sorted_multi_step"
            )
        stale_cap = jnp.int32(int(max_stale_frac * n))
        tagf = jnp.arange(n, dtype=state.pos.dtype)[:, None]
        psort0 = jnp.concatenate([state.pos, state.mass[:, None]], axis=-1)
        vel_tag0 = jnp.concatenate([state.vel, tagf], axis=-1)
        # Step 1 always sorts (there is no meta yet).
        psort, vel_tag, acc, t, meta = sorted_step(
            psort0, vel_tag0, state.acc, state.time
        )

        def body(c, _):
            psort, vel_tag, acc, t, meta, since, stale = c
            # since = steps taken since the last re-sort (the sorted
            # step is step 0), so the next step is the (since+1)-th of
            # the current chunk: sort when that would exceed the cap.
            resort = (stale > stale_cap) | (since >= max_cadence - 1)

            def do_sorted(args):
                psort, vel_tag, acc, t, meta = args
                psort, vel_tag, acc, t, meta_n = sorted_step(
                    psort, vel_tag, acc, t
                )
                return (psort, vel_tag, acc, t, meta_n,
                        jnp.int32(0), jnp.int32(0))

            def do_frozen(args):
                psort, vel_tag, acc, t, meta = args
                psort, vel_tag, acc, t, n_stale = frozen_step(
                    psort, vel_tag, acc, t, meta
                )
                return (psort, vel_tag, acc, t, meta,
                        since + jnp.int32(1), n_stale)

            c_n = jax.lax.cond(
                resort, do_sorted, do_frozen,
                (psort, vel_tag, acc, t, meta),
            )
            return c_n, (c_n[-1], resort)

        c0 = (psort, vel_tag, acc, t, meta, jnp.int32(0), jnp.int32(0))
        if n_steps > 1:
            c, trace = jax.lax.scan(body, c0, None, length=n_steps - 1)
        else:
            c, trace = c0, (jnp.zeros((0,), jnp.int32),
                            jnp.zeros((0,), jnp.bool_))
        psort, vel_tag, acc, t = c[0], c[1], c[2], c[3]
        inv = jnp.argsort(vel_tag[:, 3].astype(jnp.int32))
        out = ParticleState(
            pos=psort[inv, :3], vel=vel_tag[inv, :3], acc=acc[inv],
            mass=psort[inv, 3], time=t,
        )
        if with_trace:
            return out, trace
        return out

    return multi


# ---------------------------------------------------------------------------
# Energy observability (reference: integrator.cu:252-289)
# ---------------------------------------------------------------------------


def kinetic_energy(state: ParticleState) -> jax.Array:
    """KE = ½ Σ m·|v|² (reference: integrator.cu:51-78)."""
    return 0.5 * jnp.sum(state.mass * jnp.sum(state.vel * state.vel, axis=-1))


def potential_energy(
    pos,
    mass,
    G=1.0,
    softening=0.1,
    *,
    block_size: int = 256,
    accumulate: str = "f32",
) -> jax.Array:
    """PE = −G Σ_{i<j} m_i·m_j / √(r² + ε²) (reference: integrator.cu:81-119).

    Computed as half the full (i ≠ j) double sum, blocked over i so the pair
    matrix never materializes.

    ``accumulate`` selects the summation path (the PE terms are all one
    sign, so f32 rounding accumulates coherently — at N ≥ 1M the plain-f32
    sum error can approach the 1e-4 drift target it is supposed to measure;
    docs/specs/quality-attributes.md):

      * ``"f32"``   — plain hierarchical f32 (fast; per-step observability)
      * ``"kahan"`` — TPU-native compensated summation: Kahan carries both
        across source chunks inside a block row and across block partials;
        measurement error ~O(ε_machine), independent of N
      * ``"f64"``   — cast pair terms to f64 (requires ``jax_enable_x64``;
        CPU verification path — TPU has no native f64)
    """
    # Validate OUTSIDE jit: trace-time checks are skipped on cache hits,
    # and f64-without-x64 would silently compute in f32.
    if accumulate not in ("f32", "kahan", "f64"):
        raise ValueError(f"unknown accumulate mode {accumulate!r}")
    if accumulate == "f64" and not jax.config.jax_enable_x64:
        raise ValueError("accumulate='f64' requires jax_enable_x64")
    return _potential_energy_jit(
        pos, mass, G, softening, block_size=block_size, accumulate=accumulate
    )


@functools.partial(jax.jit, static_argnames=("block_size", "accumulate"))
def _potential_energy_jit(
    pos, mass, G, softening, *, block_size: int, accumulate: str
) -> jax.Array:
    n = pos.shape[0]
    b = min(block_size, max(n, 1))
    n_pad = -(-n // b) * b
    pos_p = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    mass_p = jnp.pad(mass, (0, n_pad - n))
    eps2 = softening * softening
    n_blocks = n_pad // b

    pos_blocks = pos_p.reshape(n_blocks, b, 3)
    mass_blocks = mass_p.reshape(n_blocks, b)

    def pair_terms(pb, mb, ps, ms):
        d = ps[None, :, :] - pb[:, None, :]             # (b, chunk, 3)
        r2_raw = jnp.sum(d * d, axis=-1)
        inv_r = jax.lax.rsqrt(r2_raw + eps2)
        e = mb[:, None] * ms[None, :] * inv_r           # (b, chunk)
        return jnp.where(r2_raw == 0.0, 0.0, e)        # exclude self pairs

    if accumulate == "f64":

        def one_block(args):
            pb, mb = args
            e = pair_terms(pb, mb, pos_p, mass_p).astype(jnp.float64)
            return jnp.sum(e)

        partials = jax.lax.map(one_block, (pos_blocks, mass_blocks))
        return (-0.5 * G * jnp.sum(partials)).astype(pos.dtype)

    if accumulate == "kahan":
        # Kahan level 1: per-row (s, c) carries over source chunks.
        def one_block(args):
            pb, mb = args

            def chunk_body(carry, src):
                s, c = carry
                ps, ms = src
                e = jnp.sum(pair_terms(pb, mb, ps, ms), axis=1)  # (b,)
                y = e - c
                t = s + y
                return (t, (t - s) - y), None

            z = jnp.zeros((b,), pos.dtype)
            (s, _), _ = jax.lax.scan(
                chunk_body, (z, z), (pos_blocks, mass_blocks)
            )
            return jnp.sum(s)  # b ≤ 256 values: tree-sum error negligible

        partials = jax.lax.map(one_block, (pos_blocks, mass_blocks))

        # Kahan level 2: across block partials.
        def part_body(carry, x):
            s, c = carry
            y = x - c
            t = s + y
            return (t, (t - s) - y), None

        (total, _), _ = jax.lax.scan(
            part_body,
            (jnp.zeros((), pos.dtype), jnp.zeros((), pos.dtype)),
            partials,
        )
        return -0.5 * G * total

    def one_block(args):
        pb, mb = args
        return jnp.sum(pair_terms(pb, mb, pos_p, mass_p), axis=1)

    per_particle = jax.lax.map(one_block, (pos_blocks, mass_blocks))
    return -0.5 * G * jnp.sum(per_particle)


def total_energy(state: ParticleState, G=1.0, softening=0.1) -> jax.Array:
    """KE + PE (reference: particle_system.cpp:316-318)."""
    return kinetic_energy(state) + potential_energy(
        state.pos, state.mass, G, softening
    )


def sampled_potential_energy(
    pos,
    mass,
    G=1.0,
    softening=0.1,
    *,
    samples: int = 16384,
    key=None,
) -> jax.Array:
    """Unbiased O(S²) Monte-Carlo PE estimate for at-scale observability.

    The exact blocked PE is O(N²) (~5×10¹¹ pair terms at 1M), too slow
    for interactive diagnostics; this estimates it from a uniform random
    S-subset, scaling the sampled pair sum by N(N−1)/(S(S−1)) — unbiased
    over the sample draw, relative error ~1/√(number of sampled pairs)
    (≈ 0.01% at S = 16384). The reference has no counterpart (it simply
    skips energy at scale); used by the app shell above 100K particles.
    """
    n = pos.shape[0]
    s = min(samples, n)
    if key is None:
        key = jax.random.PRNGKey(0)
    idx = jax.random.choice(key, n, shape=(s,), replace=False)
    pe_s = potential_energy(pos[idx], mass[idx], G, softening)
    scale = (n * (n - 1.0)) / (s * (s - 1.0))
    return pe_s * scale


def sampled_total_energy(
    state: ParticleState, G=1.0, softening=0.1, *, samples: int = 16384,
    key=None,
) -> jax.Array:
    """KE (exact, O(N)) + sampled PE — the at-scale diagnostics path."""
    return kinetic_energy(state) + sampled_potential_energy(
        state.pos, state.mass, G, softening, samples=samples, key=key
    )
