"""TPU profile r3r — final r3 configuration, measured.

After r3q's hardware findings: row-major sweep output REVERTED (any
pickup from the (d, nc·c, 128) layout forces a ~26-32 ms XLA retiling
copy at 1M — q6−q5); production pickup is the raw-layout transpose +
row gather (~7.3 ms, profile_r3o.py n5−n4). Far taps stay on the XLA
scan in production until the fixed Pallas kernel (out block reordered
to satisfy Mosaic divisibility) proves itself here.

Rows (honest sum-readbacks, min of 3 timed scans of REPS):
  r1  full sorted force (production: raw pickup, XLA far taps)
  r2  full sorted Verlet step (force + glue)   → headline steps/s
  r3  far-taps XLA scan standalone (finest level, p=32)
  r4  far-taps Pallas kernel standalone (same shapes) + accuracy diff

Usage: python scripts/profile_r3r.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 1_000_000
REPS = 10
LEVELS = 6
D = 1 << LEVELS
G = 1.0
EPS = 0.1
THETA = 0.5
K = 16


def bench(name, make_body, reps=REPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    def sync(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return float(jnp.sum(leaf))

    try:
        chk = sync(run(init))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(init))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:52s} {best / reps * 1000:8.2f} ms/iter "
              f"(chk {chk:.4e})", flush=True)
        return best / reps
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def mk(rung, ref):
    def make():
        def body(c, _):
            p = ref * (1 + c[0] * 1e-30)
            out = rung(p)
            s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
            return jnp.full((8,), s * 1e-30), None
        return body, jnp.zeros((8,))
    return make


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        _far_conv_level,
        barnes_hut_forces_sorted,
        pyramid_from_packed,
        pyramid_geometry,
        theta_to_ws,
    )
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    vel0 = jax.device_put(state.vel)
    jax.block_until_ready((pos0, mass, vel0))

    ws = theta_to_ws(THETA, order=2)

    def sorted_force(p, m, extra):
        return barnes_hut_forces_sorted(
            p, m, G, EPS, THETA,
            levels=LEVELS, near_k=K, multipole_order=2, extra=extra,
        )

    def rung_force(p):
        return barnes_hut_forces_sorted(
            p, mass, G, EPS, THETA,
            levels=LEVELS, near_k=K, multipole_order=2,
        )

    t_force = bench("r1 full sorted force (production)", mk(rung_force, pos0))

    from nbody_tpu.ops.integrator import SortedState, sorted_verlet_step

    def rung_step(p):
        s = SortedState(
            pos=p, vel=vel0, acc=jnp.zeros_like(p), mass=mass,
            to_orig=jnp.arange(N, dtype=jnp.int32),
            time=jnp.zeros((), p.dtype),
        )
        out = sorted_verlet_step(s, sorted_force, 1e-3)
        return out.pos, out.vel

    t_step = bench("r2 full sorted step (force+glue)", mk(rung_step, pos0))
    if t_step:
        print(f"  => headline: {1.0 / t_step:.2f} steps/s @1M BH "
              f"(baseline 25; vs = {1.0 / t_step / 25:.3f}x)", flush=True)

    # --- far-taps A/B at the production finest level (p=32) -------------
    lo, cell = pyramid_geometry(
        jnp.min(pos0, axis=0), jnp.max(pos0, axis=0), LEVELS)
    coords = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import tile_build_pallas

    grid = build_sorted_grid(pos0, mass, coords, D, with_cell_start=False)
    tb = tile_build_pallas(
        grid, lo, cell, d=D, k=K, impl="pallas", with_moments=True)
    packed = tb.moments[:10].T.reshape(D, D, D, 10)
    pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
    pyr = jax.tree_util.tree_map(jax.block_until_ready, pyr)

    def scaled(s):
        # thread the scan carry through the operands so XLA can't hoist
        # the whole level out of the timing loop as a constant
        return jax.tree_util.tree_map(lambda x: x * s, pyr)

    def taps_xla(s):
        return _far_conv_level(scaled(s), LEVELS, ws, EPS, LEVELS,
                               impl="xla")

    def taps_pallas(s):
        return _far_conv_level(scaled(s), LEVELS, ws, EPS, LEVELS,
                               impl="pallas")

    one = jnp.ones(())
    bench("r3 far-taps XLA scan (finest p=32)",
          mk(taps_xla, one))
    bench("r4 far-taps Pallas kernel (finest p=32)",
          mk(taps_pallas, one))
    try:
        ra = jax.jit(taps_xla)(one)
        rp = jax.jit(taps_pallas)(one)
        for name, a, b in zip(("A", "J", "H"), ra, rp):
            num = float(jnp.max(jnp.abs(a - b)))
            den = float(jnp.max(jnp.abs(a))) + 1e-30
            print(f"  taps {name}: max rel diff = {num / den:.3e}",
                  flush=True)
    except Exception as e:
        print(f"  taps accuracy FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
