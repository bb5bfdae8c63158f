"""North-star fidelity measurement: |ΔE/E| over 10k steps of 1M-particle
Barnes-Hut on one TPU chip (BASELINE.md target: < 1e-4; spec:
docs/specs/quality-attributes.md "North-star measurement").

Potential energy uses the Pallas all-pairs kernel with in-kernel Kahan
accumulation (ops/direct.py:pairwise_potential_pallas, ~1e-7 relative):
the 5×10¹¹ one-signed pair terms at 1M would otherwise accumulate f32
rounding of the same order as the drift target, and the XLA blocked
form is HBM-bound (~350 s/eval — long enough to crash the TPU worker).

Usage: python scripts/measure_drift.py [N] [STEPS] [CHUNK]
Writes one JSON line per checkpoint so a killed run still yields data.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.forces import make_force_fn
    from nbody_tpu.ops.integrator import (
        initialize_forces,
        kinetic_energy,
        make_multi_step,
        potential_energy,
    )
    from nbody_tpu.types import (
        ForceMethod,
        SimulationConfig,
        SphericalDistParams,
    )

    config = SimulationConfig(
        particle_count=N,
        force_method=ForceMethod.BARNES_HUT,
        bh_max_level=6 if N > 300_000 else 5,
        dt=1e-3,
    )
    force_fn = make_force_fn(config)
    # Hénon-style normalization: TOTAL mass 1 (per-particle 1/N). With
    # unit masses the bench scene has GM = 1e6 and core velocities ~300
    # units/s — dt=1e-3 moves particles a full cell per step and the
    # integration explodes (measured: E flips sign within 250 steps).
    # With M_tot = 1 the crossing time is ~30 time units, so 10k steps at
    # dt=1e-3 is a resolved, physically meaningful fidelity window.
    state = init_spherical(
        jax.random.PRNGKey(42),
        N,
        SphericalDistParams(radius=10.0, min_mass=1.0 / N, max_mass=1.0 / N),
    )
    state = jax.jit(lambda s: initialize_forces(s, force_fn))(state)

    from nbody_tpu.ops.direct import pairwise_potential_pallas

    @jax.jit
    def energy(s):
        # Pallas all-pairs PE (VMEM tiles, in-kernel Kahan): ~7 s at 1M.
        # The XLA blocked PE streams (B, N, 3) temps through HBM — ~350 s,
        # and a device program that long can CRASH the TPU worker.
        return kinetic_energy(s) + pairwise_potential_pallas(
            s.pos, s.mass, config.G, config.softening
        )

    t0 = time.time()
    e0 = float(energy(state))
    print(
        json.dumps(
            {"step": 0, "E": e0, "rel_drift": 0.0,
             "pe_secs": round(time.time() - t0, 1)}
        ),
        flush=True,
    )

    multi = jax.jit(make_multi_step(force_fn, config.dt, CHUNK))
    done = 0
    while done < STEPS:
        t0 = time.time()
        state = multi(state)
        e = float(energy(state))  # real D2H readback closes the bracket
        done += CHUNK
        drift = abs((e - e0) / e0)
        print(
            json.dumps(
                {
                    "step": done,
                    "E": e,
                    "rel_drift": drift,
                    "steps_per_sec": round(
                        CHUNK / (time.time() - t0), 2
                    ),  # includes one kahan PE eval
                }
            ),
            flush=True,
        )

    print(
        json.dumps(
            {
                "metric": f"abs_rel_energy_drift_{N // 1000}k_bh_{STEPS}steps",
                "value": drift,
                "target": 1e-4,
                "pass": bool(drift < 1e-4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
