"""Three-way force method comparison: accuracy vs the exact reference and
timing (reference: examples/example_force_methods.cpp:34-66)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

import jax
import numpy as np

from nbody_tpu.models import init_spherical
from nbody_tpu.ops.barnes_hut import barnes_hut_forces
from nbody_tpu.ops.direct import direct_forces, direct_forces_reference
from nbody_tpu.ops.spatial_hash import spatial_hash_forces
from nbody_tpu.types import SphericalDistParams


def main():
    n = 5000
    s = init_spherical(
        jax.random.PRNGKey(42), n, SphericalDistParams(radius=10.0)
    )
    G, eps = 1.0, 0.1

    golden = np.asarray(direct_forces_reference(s.pos, s.mass, G, eps))
    gm = np.linalg.norm(golden, axis=-1)

    methods = {
        "direct-n2": lambda: direct_forces(s.pos, s.mass, G, eps),
        "barnes-hut θ=0.5": lambda: barnes_hut_forces(
            s.pos, s.mass, G, eps, 0.5, levels=5
        ),
        "spatial-hash": lambda: spatial_hash_forces(
            s.pos, s.mass, G, eps, cutoff=2.0, cell_size=1.0
        ),
    }

    print(f"{'method':20s} {'ms/eval':>10s} {'median rel err':>15s}")
    for name, fn in methods.items():
        acc = fn()
        acc.block_until_ready()  # pay compile
        t0 = time.perf_counter()
        acc = fn()
        acc.block_until_ready()
        ms = (time.perf_counter() - t0) * 1e3
        a = np.asarray(acc)
        err = np.linalg.norm(a - golden, axis=-1) / (gm + 1e-12)
        note = "(cutoff truncates far field)" if "hash" in name else ""
        print(f"{name:20s} {ms:10.2f} {np.median(err):15.4%} {note}")


if __name__ == "__main__":
    main()
