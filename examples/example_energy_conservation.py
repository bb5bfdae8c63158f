"""Energy-conservation study: two-body circular orbit, long-horizon drift
tracking with CSV output and a dt sweep
(reference: examples/example_energy_conservation.cpp:91-213).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import csv
import os
import sys
import tempfile

import jax

from nbody_tpu.models import two_body_orbit
from nbody_tpu.ops.direct import direct_forces
from nbody_tpu.ops.integrator import (
    initialize_forces,
    make_multi_step,
    total_energy,
)


def drift_run(dt: float, steps: int, chunk: int = 1000):
    G, eps = 1.0, 0.1
    state = two_body_orbit(separation=2.0, softening=eps)

    def force_fn(pos, mass):
        return direct_forces(pos, mass, G, eps)

    state = initialize_forces(state, force_fn)
    e0 = float(total_energy(state, G, eps))
    multi = jax.jit(make_multi_step(force_fn, dt, chunk))
    rows = []
    for c in range(steps // chunk):
        state = multi(state)
        e = float(total_energy(state, G, eps))
        rows.append(((c + 1) * chunk, e, (e - e0) / e0))
    return e0, rows


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    print(f"two-body orbit, dt=1e-4, {steps} steps")
    e0, rows = drift_run(1e-4, steps)
    csv_path = os.path.join(tempfile.gettempdir(), "energy_conservation.csv")
    with open(csv_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["step", "total_energy", "relative_drift"])
        writer.writerows(rows)
    print(f"E0 = {e0:.6f}; final drift = {rows[-1][2]:.3e}; CSV: {csv_path}")

    print("\ndt sweep (10k steps each):")
    for dt in (1e-3, 5e-4, 1e-4):
        _, r = drift_run(dt, 10_000)
        print(f"  dt={dt:g}: |drift| = {abs(r[-1][2]):.3e}")


if __name__ == "__main__":
    main()
