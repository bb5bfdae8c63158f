"""Galaxy collision: two disks on an approach trajectory, rendered frames
(BASELINE.json config #5, scaled to one chip; add --devices N on a pod).

Usage: python examples/example_galaxy_collision.py [N] [frames]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import os
import sys
import tempfile

import jax

from nbody_tpu.models import galaxy_collision
from nbody_tpu.ops.forces import make_force_fn
from nbody_tpu.ops.integrator import initialize_forces, make_multi_step
from nbody_tpu.render import Camera, PointRenderer
from nbody_tpu.types import ForceMethod, RenderConfig, SimulationConfig


def main():
    fast = os.environ.get("NBODY_EXAMPLE_FAST") == "1"  # CI smoke
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (2_000 if fast else 50_000)
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else (2 if fast else 30)
    out_dir = os.path.join(tempfile.gettempdir(), "galaxy_collision")
    os.makedirs(out_dir, exist_ok=True)

    state = galaxy_collision(
        jax.random.PRNGKey(7), n, separation=30.0, approach_speed=0.8
    )
    config = SimulationConfig(
        particle_count=n,
        force_method=ForceMethod.BARNES_HUT,
        bh_max_level=5,
        dt=5e-3,
        softening=0.2,
    )
    force_fn = make_force_fn(config)
    state = initialize_forces(state, force_fn)
    chunk = jax.jit(make_multi_step(force_fn, config.dt, 10))

    camera = Camera(distance=70.0, azimuth=0.6, elevation=0.6)
    renderer = PointRenderer(
        RenderConfig(window_width=960, window_height=540), camera=camera
    )

    import numpy as np

    for f in range(frames):
        state = chunk(state)
        img = renderer.render(np.asarray(state.pos), np.asarray(state.vel))
        renderer.save_png(img, f"{out_dir}/frame_{f:04d}.png")
        if (f + 1) % 10 == 0:
            print(f"frame {f + 1}/{frames}, t={float(state.time):.2f}")
    print(f"frames written to {out_dir}")


if __name__ == "__main__":
    main()
