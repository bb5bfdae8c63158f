"""Basic usage: config → init → 1000 steps → save/load round trip.

TPU-native counterpart of the reference example
(reference: examples/example_basic.cpp).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import os
import tempfile

from nbody_tpu import (
    ForceMethod,
    InitDistribution,
    ParticleSystem,
    SimulationConfig,
)


def main():
    config = SimulationConfig(
        particle_count=5000,
        init_distribution=InitDistribution.SPHERICAL,
        force_method=ForceMethod.DIRECT_N2,
        dt=1e-3,
    )
    system = ParticleSystem()
    system.initialize(config)
    print(f"Initialized {system.particle_count} particles")
    e0 = system.compute_total_energy()

    for step in range(1000):
        system.update()
        if (step + 1) % 200 == 0:
            print(f"step {step + 1}: t={system.simulation_time:.3f}")

    e1 = system.compute_total_energy()
    print(f"energy drift over 1000 steps: {(e1 - e0) / e0:.2e}")

    path = os.path.join(tempfile.gettempdir(), "example_basic.nbody")
    system.save_state(path)
    restored = ParticleSystem()
    restored.load_state(path)
    assert restored.get_state() == system.get_state()
    print(f"checkpoint round trip OK ({path})")


if __name__ == "__main__":
    main()
