"""Custom initial conditions: spiral galaxy scene
(reference: examples/example_custom_distribution.cpp:21-50)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import numpy as np

from nbody_tpu.models import spiral_galaxy
from nbody_tpu.ops.forces import make_force_fn
from nbody_tpu.ops.integrator import initialize_forces, make_verlet_step
from nbody_tpu.types import ForceMethod, SimulationConfig


def main():
    fast = os.environ.get("NBODY_EXAMPLE_FAST") == "1"  # CI smoke
    n = 2_000 if fast else 20_000
    state = spiral_galaxy(
        jax.random.PRNGKey(1), n, radius=10.0, arms=3, bulge_fraction=0.25
    )
    config = SimulationConfig(
        particle_count=n,
        force_method=ForceMethod.BARNES_HUT,
        bh_max_level=5,
        dt=5e-4,
    )
    force_fn = make_force_fn(config)
    state = initialize_forces(state, force_fn)
    step = jax.jit(make_verlet_step(force_fn, config.dt))

    for frame in range(2 if fast else 10):
        for _ in range(20):
            state = step(state)
        pos = np.asarray(state.pos)
        r = np.linalg.norm(pos[:, :2], axis=-1)
        print(
            f"t={float(state.time):.3f}  r_median={np.median(r):.2f}  "
            f"z_rms={pos[:, 2].std():.3f}"
        )

    print("galaxy evolved; use --render in the CLI to produce frames")


if __name__ == "__main__":
    main()
