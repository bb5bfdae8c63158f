"""TPU profile r3t — post-fused-pickup step bisection.

After landing the fused overflow fallback (r3s q6: force 45.7 → 31.6 ms
at 1M), bench.py moved only 49.7 → 43.6 ms/step. This script bisects the
full sorted Verlet step to find the residual:

  t0  production barnes_hut_forces_sorted, extra=None   (expect ~31.6)
  t1  t0 + the integrator's 4-col extra payload
  t2  full sorted_verlet_step (pos update + force + vel update)

Usage: python scripts/profile_r3t.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 1_000_000
REPS = 10
LEVELS = 6
G = 1.0
EPS = 0.1
THETA = 0.5
K = 16
DT = 1e-3


def bench(name, make_body, reps=REPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    def sync(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return float(jnp.sum(leaf))

    chk = sync(run(init))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(init))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:58s} {best / reps * 1000:8.2f} ms/iter "
          f"(chk {chk:.4e})", flush=True)
    return best / reps


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import barnes_hut_forces_sorted
    from nbody_tpu.ops.integrator import (
        SortedState,
        sorted_verlet_step,
    )
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready((pos0, mass))

    kw = dict(levels=LEVELS, near_k=K, multipole_order=2,
              near_impl="pallas")

    def mk_force(extra_cols):
        def make():
            def body(c, _):
                p = pos0 * (1 + c[0] * 1e-30)
                if extra_cols:
                    extra = jnp.concatenate(
                        [p, jax.lax.bitcast_convert_type(
                            jnp.arange(N, dtype=jnp.int32), jnp.float32
                        )[:, None]], axis=-1)
                    out = barnes_hut_forces_sorted(
                        p, mass, G, EPS, THETA, extra=extra, **kw)
                else:
                    out = barnes_hut_forces_sorted(
                        p, mass, G, EPS, THETA, **kw)
                s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
                return jnp.full((8,), s * 1e-30), None
            return body, jnp.zeros((8,))
        return make

    bench("t0 sorted force, extra=None", mk_force(False))
    bench("t1 sorted force + 4-col extra", mk_force(True))

    def sorted_force_fn(p, m, extra=None):
        return barnes_hut_forces_sorted(
            p, m, G, EPS, THETA, extra=extra, **kw)

    def mk_step():
        def body(s, _):
            return sorted_verlet_step(s, sorted_force_fn, DT), None
        init = SortedState(
            pos=pos0, vel=jnp.zeros_like(pos0),
            acc=jnp.zeros_like(pos0), mass=mass,
            to_orig=jnp.arange(N, dtype=jnp.int32),
            time=jnp.asarray(0.0, pos0.dtype),
        )
        return body, init

    bench("t2 full sorted_verlet_step", mk_step)


if __name__ == "__main__":
    main()
