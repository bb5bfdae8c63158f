"""Reconcile the argsort discrepancy: 5.5 ms vs 91.6 ms in two harnesses.

Usage: python scripts/profile_sort2.py [N]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def bench(name, make_body, reps):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    c = run(init)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = run(init)
    leaf = jax.tree_util.tree_leaves(c)[0]
    chk = float(jnp.sum(leaf[:128] % 97))
    dt = time.perf_counter() - t0
    print(f"{name:52s} {dt / reps * 1000:8.2f} ms/iter (chk {chk:.0f})",
          flush=True)


def main():
    print(f"backend={jax.default_backend()} N={N}", flush=True)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 1 << 18, size=N).astype(np.int32))
    jax.block_until_ready(ids)

    # Style A (bh4): argsort(ids + c[0]), carry = order
    def mk_a():
        def body(c, _):
            order = jnp.argsort(ids + c[0])
            return order, None
        return body, jnp.zeros((N,), jnp.int32)

    # Style B (sort bench): keys chained through both outputs
    def mk_b():
        def body(c, _):
            k = jnp.sort(c)
            v = jnp.argsort(c)
            return (k >> 1) ^ (v & 0x3FFFF), None
        return body, ids

    # Style C: argsort of FRESH random-ish keys each iter (hash the carry)
    def mk_c():
        def body(c, _):
            keys = (c * 2654435761) & 0x3FFFF
            order = jnp.argsort(keys)
            return order, None
        return body, ids

    # Style D: argsort with gather (like build_sorted_grid uses order)
    def mk_d():
        def body(c, _):
            keys = (c * 2654435761) & 0x3FFFF
            order = jnp.argsort(keys).astype(jnp.int32)
            return keys[order] + order, None
        return body, ids

    for reps in (5, 10):
        bench(f"A bh4-style argsort reps={reps}", mk_a, reps)
    bench("B chained sort+argsort", mk_b, 10)
    bench("C argsort of hashed keys", mk_c, 10)
    bench("D argsort + gather", mk_d, 10)


if __name__ == "__main__":
    main()
