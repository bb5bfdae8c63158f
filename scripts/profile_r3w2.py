"""TPU profile r3w2 — INTEGRATED A/B of the 8-col payload route.

profile_r3w measured the sort+gather chain in isolation (8-col payload
8.9 ms vs 5-col + separate pay gather 15.7 ms at 1M) — but isolated sort
microbenches have already lied once (the multi-operand lax.sort won
isolated and regressed every integrated cell, BENCHMARKS.md). This
script measures FULL integrated multi-steps both ways in one process:

  w0  1M BH, OLD body: 5-col engine sort + separate (N,4) pay gather
  w1  1M BH, NEW body: extra rides the engine sort (8-col, id column
      dropped + ids recomputed from sorted positions)
  w2  1M sparse-cube hash tiles, OLD body
  w3  1M sparse-cube hash tiles, NEW body
  eq  one step both ways must match bit-exactly

Usage: python scripts/profile_r3w2.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 1_000_000
STEPS = 10
LEVELS = 6
G = 1.0
EPS = 0.1
THETA = 0.5
K = 16
DT = 1e-3


def bench(name, make_body, steps=STEPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=steps)
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
    per = best / steps * 1000
    print(f"{name:52s} {per:8.2f} ms/step ({1000 / per:6.2f} steps/s) "
          f"(chk {chk:.6e})", flush=True)
    return per


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import barnes_hut_forces_sorted
    from nbody_tpu.ops.spatial_hash import spatial_hash_forces_tiles_sorted
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))

    # sparse cube ~1 particle/unit^3 for the hash cells
    key = jax.random.PRNGKey(7)
    side = 100.0
    pos_cube = jax.random.uniform(key, (N, 3), minval=0.0, maxval=side)
    mass = jnp.full((N,), 1.0 / N, jnp.float32)

    def bh_force(p, m, extra=None):
        return barnes_hut_forces_sorted(
            p, m, G, EPS, THETA, levels=LEVELS, near_k=K,
            multipole_order=2, near_impl="pallas", extra=extra)

    def hash_force(p, m, extra=None):
        return spatial_hash_forces_tiles_sorted(
            p, m, G, EPS, cutoff=2.0, cell_size=2.0, d=64, k=8,
            impl="pallas", extra=extra)

    def mk_old(force, st0):
        """Separate (N,4) pay gather by the returned permutation."""
        def body(c, _):
            pos, vel_tag, acc, mass_, t = c
            dtc = jnp.asarray(DT, pos.dtype)
            pos_d = pos + vel_tag[:, :3] * dtc + (0.5 * dtc * dtc) * acc
            acc4 = jnp.pad(acc, ((0, 0), (0, 1)))
            pay = vel_tag + (0.5 * dtc) * acc4
            acc_s, psort, order = force(pos_d, mass_)[:3]
            pay = pay[order]
            vt = pay + (0.5 * dtc) * jnp.pad(acc_s, ((0, 0), (0, 1)))
            return (psort[:, :3], vt, acc_s, psort[:, 3], t + dtc), None

        def make():
            return body, st0
        return make

    def mk_new(force, st0):
        """Extra rides the engine's own sort gather (8-col payload)."""
        def body(c, _):
            pos, vel_tag, acc, mass_, t = c
            dtc = jnp.asarray(DT, pos.dtype)
            pos_d = pos + vel_tag[:, :3] * dtc + (0.5 * dtc * dtc) * acc
            acc4 = jnp.pad(acc, ((0, 0), (0, 1)))
            extra = vel_tag + (0.5 * dtc) * acc4
            acc_s, psort, order, extra_s = force(pos_d, mass_, extra)
            vt = extra_s + (0.5 * dtc) * jnp.pad(acc_s, ((0, 0), (0, 1)))
            return (psort[:, :3], vt, acc_s, psort[:, 3], t + dtc), None

        def make():
            return body, st0
        return make

    def carry0(pos):
        # acc=0 start: the first scanned step computes the force anyway,
        # and both A/B variants consume the IDENTICAL carry.
        tagf = jnp.arange(N, dtype=jnp.float32)[:, None]
        vel = jnp.zeros_like(pos)
        return (pos, jnp.concatenate([vel, tagf], -1),
                jnp.zeros_like(pos), mass, jnp.zeros((), jnp.float32))

    c_bh = carry0(state.pos)
    c_hs = carry0(pos_cube)
    jax.block_until_ready((c_bh, c_hs))

    t0 = bench("w0 1M BH OLD (separate pay gather)", mk_old(bh_force, c_bh))
    t1 = bench("w1 1M BH NEW (extra rides engine sort)", mk_new(bh_force, c_bh))
    t2 = bench("w2 1M sparse hash OLD", mk_old(hash_force, c_hs))
    t3 = bench("w3 1M sparse hash NEW", mk_new(hash_force, c_hs))
    print(f"BH delta: {t0 - t1:+.2f} ms/step; hash delta: {t2 - t3:+.2f}",
          flush=True)

    # bit-exact equivalence, one step each way
    bo, _ = jax.jit(lambda c: mk_old(bh_force, c_bh)()[0](c, None))(c_bh)
    bn, _ = jax.jit(lambda c: mk_new(bh_force, c_bh)()[0](c, None))(c_bh)
    for i, (a, b) in enumerate(zip(bo[:4], bn[:4])):
        md = float(jnp.max(jnp.abs(a - b)))
        print(f"eq BH carry[{i}]: max |diff| = {md:.3e}", flush=True)


if __name__ == "__main__":
    main()
