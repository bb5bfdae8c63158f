"""Integrator tests (reference: tests/test_integrator.cpp).

Single-step arithmetic, analytic kinetic energy, and the physics-fidelity
gate: two-body circular orbit energy drift < 1% over 100 steps.
"""

import jax.numpy as jnp
import numpy as np

from nbody_tpu.models import two_body_orbit
from nbody_tpu.ops.direct import direct_forces
from nbody_tpu.ops.integrator import (
    initialize_forces,
    kinetic_energy,
    make_multi_step,
    make_verlet_step,
    potential_energy,
    total_energy,
    verlet_step,
)
from nbody_tpu.state import ParticleState


def _const_force(acc_value):
    def f(pos, mass):
        return jnp.broadcast_to(jnp.asarray(acc_value, jnp.float32), pos.shape)

    return f


def test_single_step_position_arithmetic():
    """x' = x + v·dt + ½a·dt² exactly (reference: test_integrator.cpp:15-84)."""
    dt = 0.1
    state = ParticleState(
        pos=jnp.array([[1.0, 2.0, 3.0]]),
        vel=jnp.array([[0.5, -0.5, 1.0]]),
        acc=jnp.array([[2.0, 0.0, -4.0]]),
        mass=jnp.ones((1,)),
        time=jnp.zeros(()),
    )
    new = verlet_step(state, _const_force([2.0, 0.0, -4.0]), dt)
    expected_pos = np.array([[1.0, 2.0, 3.0]]) + 0.1 * np.array(
        [[0.5, -0.5, 1.0]]
    ) + 0.5 * 0.01 * np.array([[2.0, 0.0, -4.0]])
    np.testing.assert_allclose(np.asarray(new.pos), expected_pos, rtol=1e-6)
    # v' = v + ½(a_old + a_new)·dt with constant force → v + a·dt
    expected_vel = np.array([[0.5, -0.5, 1.0]]) + 0.1 * np.array([[2.0, 0.0, -4.0]])
    np.testing.assert_allclose(np.asarray(new.vel), expected_vel, rtol=1e-6)
    assert abs(float(new.time) - dt) < 1e-7


def test_kinetic_energy_analytic():
    """KE = 4.5 for m=1, |v|=3 (reference: test_integrator.cpp KE test)."""
    state = ParticleState(
        pos=jnp.zeros((1, 3)),
        vel=jnp.array([[3.0, 0.0, 0.0]]),
        acc=jnp.zeros((1, 3)),
        mass=jnp.ones((1,)),
        time=jnp.zeros(()),
    )
    assert abs(float(kinetic_energy(state)) - 4.5) < 1e-6


def test_potential_energy_two_body():
    """PE = −G·m²/√(r²+ε²) for a pair."""
    G, eps = 1.0, 0.1
    s = two_body_orbit(separation=2.0, softening=eps)
    pe = float(potential_energy(s.pos, s.mass, G, eps))
    expected = -G * 1.0 / np.sqrt(4.0 + eps * eps)
    np.testing.assert_allclose(pe, expected, rtol=1e-5)


def test_two_body_energy_drift():
    """Two-body circular orbit: |ΔE/E| < 1% over 100 steps, dt=1e-3
    (reference: test_integrator.cpp:90-162)."""
    G, eps, dt = 1.0, 0.1, 1e-3
    state = two_body_orbit(separation=2.0, softening=eps)

    def force_fn(pos, mass):
        return direct_forces(pos, mass, G, eps)

    state = initialize_forces(state, force_fn)
    e0 = float(total_energy(state, G, eps))
    step = make_verlet_step(force_fn, dt)
    for _ in range(100):
        state = step(state)
    e1 = float(total_energy(state, G, eps))
    assert abs((e1 - e0) / e0) < 0.01


def test_two_body_long_drift_scan():
    """Fused scan loop: drift < 0.1% over 5000 steps at dt=1e-3."""
    G, eps, dt = 1.0, 0.1, 1e-3
    state = two_body_orbit(separation=2.0, softening=eps)

    def force_fn(pos, mass):
        return direct_forces(pos, mass, G, eps)

    state = initialize_forces(state, force_fn)
    e0 = float(total_energy(state, G, eps))
    multi = make_multi_step(force_fn, dt, 5000)
    state = multi(state)
    e1 = float(total_energy(state, G, eps))
    assert abs((e1 - e0) / e0) < 1e-3
    # One full period is 2π·r/v; sanity-check the orbit stayed bounded.
    r = np.linalg.norm(np.asarray(state.pos), axis=-1)
    assert (r < 5.0).all()


def test_time_reversibility():
    """Verlet is time-reversible: forward k steps then backward k steps
    returns to the start (symplectic property the reference never tests —
    stronger gate than drift alone)."""
    G, eps, dt = 1.0, 0.05, 1e-3
    state = two_body_orbit(separation=2.0, softening=eps)

    def force_fn(pos, mass):
        return direct_forces(pos, mass, G, eps)

    state = initialize_forces(state, force_fn)
    fwd = make_multi_step(force_fn, dt, 200)
    bwd = make_multi_step(force_fn, -dt, 200)
    back = bwd(fwd(state))
    np.testing.assert_allclose(
        np.asarray(back.pos), np.asarray(state.pos), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(back.vel), np.asarray(state.vel), atol=1e-4
    )


def test_potential_energy_accumulate_modes(key):
    """Kahan-compensated PE matches the f64 reference sum to ~machine-ε
    (docs/specs/force-computation.md: Energy Accounting). The plain-f32
    path drifts coherently (all terms one sign), which is why the
    north-star measurement uses 'kahan'."""
    import jax
    import pytest

    from nbody_tpu.models import init_spherical
    from nbody_tpu.types import SphericalDistParams

    s = init_spherical(key, 4096, SphericalDistParams(radius=2.0))

    pe_f32 = float(potential_energy(s.pos, s.mass, 1.0, 0.1))
    pe_kahan = float(
        potential_energy(s.pos, s.mass, 1.0, 0.1, accumulate="kahan")
    )
    with jax.enable_x64():
        pe_f64 = float(
            potential_energy(s.pos, s.mass, 1.0, 0.1, accumulate="f64")
        )

    assert abs(pe_kahan - pe_f64) / abs(pe_f64) < 1e-6
    assert abs(pe_f32 - pe_f64) / abs(pe_f64) < 1e-4  # f32 is coarser

    # conftest enables x64 suite-wide; the guard must fire when it's off
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(ValueError, match="x64"):
            potential_energy(s.pos, s.mass, 1.0, 0.1, accumulate="f64")
    finally:
        jax.config.update("jax_enable_x64", prev)
    with pytest.raises(ValueError, match="unknown"):
        potential_energy(s.pos, s.mass, 1.0, 0.1, accumulate="bogus")


def test_sampled_potential_energy_unbiased(key):
    """Sampled PE estimator (at-scale observability) is within a few
    percent of the exact blocked PE."""
    from nbody_tpu.models import init_spherical
    from nbody_tpu.ops.integrator import sampled_potential_energy
    from nbody_tpu.types import SphericalDistParams

    s = init_spherical(key, 8192, SphericalDistParams(radius=5.0))
    exact = float(potential_energy(s.pos, s.mass, 1.0, 0.1))
    est = float(
        sampled_potential_energy(
            s.pos, s.mass, 1.0, 0.1, samples=2048, key=key
        )
    )
    assert abs(est - exact) / abs(exact) < 0.05
    # full-sample case degenerates to exact
    est_full = float(
        sampled_potential_energy(
            s.pos, s.mass, 1.0, 0.1, samples=8192, key=key
        )
    )
    assert abs(est_full - exact) / abs(exact) < 1e-5


def test_sorted_multi_step_matches_plain():
    """Sorted-state stepping (make_sorted_multi_step) is the same physics
    as plain stepping — rows permuted internally, restored at readout.
    Differences are only f32 accumulation order inside cells."""
    import jax

    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        _barnes_hut_forces,
        barnes_hut_forces_sorted,
    )
    from nbody_tpu.ops.integrator import make_sorted_multi_step

    # levels=3 is the floor: at levels=2 (64 cells × k=16 slots for
    # 2000 particles) half the rows overflow the slot cap and the two
    # paths' DIFFERENT overflow fallbacks dominate (far-A-at-center vs
    # full expansion at position — both audited, deliberately compared
    # only in the overflow-free regime). n/steps shrunk instead: the
    # sorted path runs the fused pipeline in interpret mode on CPU
    # (barnes_hut_forces_sorted maps "xla" → "pallas_interpret" — the
    # sorted contract exists only on the fused path), whose Python
    # emulation cost scales with n × steps (2000×4 measured 136 s).
    n, levels, steps, dt = 800, 3, 2, 1e-3
    from nbody_tpu.types import SphericalDistParams

    state = init_spherical(
        jax.random.PRNGKey(7), n, SphericalDistParams(radius=5.0)
    )

    # Plain path on the XLA near engine (fast oracle); the sorted path
    # necessarily runs interpret mode (see above). Kernel equivalence
    # itself is test_pallas_kernels.py's job.
    def force(pos, mass):
        return _barnes_hut_forces(
            pos, mass, 1.0, 0.1, 0.5, levels=levels, window=2048,
            near_engine="tiles", near_k=16, multipole_order=2,
            near_impl="xla",
        )

    def sorted_force(pos, mass, extra=None):
        return barnes_hut_forces_sorted(
            pos, mass, 1.0, 0.1, 0.5, levels=levels, near_k=16,
            multipole_order=2, near_impl="xla", extra=extra,
        )

    state = initialize_forces(state, force)
    plain = make_multi_step(force, dt, steps)(state)
    srt = make_sorted_multi_step(sorted_force, dt, steps)(state)

    # mass/time ride permutations untouched → exact
    np.testing.assert_array_equal(np.asarray(srt.mass), np.asarray(state.mass))
    assert abs(float(srt.time) - float(plain.time)) < 1e-6
    np.testing.assert_allclose(
        np.asarray(srt.pos), np.asarray(plain.pos), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(srt.vel), np.asarray(plain.vel), rtol=2e-3, atol=1e-4
    )
