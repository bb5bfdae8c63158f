"""BH force accuracy vs the exact direct sum, across θ and multipole order.

CPU-friendly (small N). Reports RMS and p99 relative acceleration error —
the calibration data behind theta_to_ws's order-2 mapping.

Usage: python scripts/accuracy_bh.py [N] [levels]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from nbody_tpu.models.distributions import init_spherical
from nbody_tpu.ops.barnes_hut import barnes_hut_forces, theta_to_ws
from nbody_tpu.ops.direct import direct_forces_reference
from nbody_tpu.types import SphericalDistParams

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
LEVELS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def rel_err(a, ref):
    num = np.linalg.norm(np.asarray(a - ref), axis=1)
    den = np.linalg.norm(np.asarray(ref), axis=1) + 1e-12
    r = num / den
    return float(np.sqrt(np.mean(r * r))), float(np.percentile(r, 99))


def main():
    s = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0)
    )
    ref = direct_forces_reference(
        s.pos, s.mass, 1.0, 0.1, dtype=jnp.float64
    )
    print(f"N={N} levels={LEVELS} (d={1 << LEVELS})")
    for theta in (0.8, 0.5, 0.3):
        for order in (1, 2):
            a = barnes_hut_forces(
                s.pos, s.mass, 1.0, 0.1, theta,
                levels=LEVELS, multipole_order=order,
            )
            rms, p99 = rel_err(a, ref)
            ws = theta_to_ws(theta, order=order)
            print(
                f"theta={theta:4.2f} order={order} ws={ws}: "
                f"rms={rms:9.2e}  p99={p99:9.2e}"
            )


if __name__ == "__main__":
    main()
