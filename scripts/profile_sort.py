"""Benchmark Pallas bitonic sort vs XLA argsort on the real TPU.

Usage: python scripts/profile_sort.py [N]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = 10


def bench(name, fn, x):
    @jax.jit
    def run(x):
        def body(c, _):
            k, v = fn(c)
            # true data dependency: next keys derived from BOTH outputs
            return (k >> 1) ^ (v & 0x3FFFF), None
        c, _ = jax.lax.scan(body, x, None, length=REPS)
        return c

    c = run(x)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    c = run(x)
    chk = float(jnp.sum(c[:128] % 97))
    dt = time.perf_counter() - t0
    print(f"{name:40s} {dt / REPS * 1000:8.2f} ms/iter (chk {chk:.0f})",
          flush=True)


def main():
    from nbody_tpu.ops.pallas_sort import bitonic_argsort

    print(f"backend={jax.default_backend()} N={N}", flush=True)
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 18, size=N).astype(np.int32))
    jax.block_until_ready(keys)

    # correctness first (compiled, on-device)
    ks, perm = jax.jit(bitonic_argsort)(keys)
    ks_np, perm_np = np.asarray(ks), np.asarray(perm)
    keys_np = np.asarray(keys)
    assert (ks_np == np.sort(keys_np)).all(), "sorted keys mismatch"
    assert (keys_np[perm_np] == ks_np).all(), "perm mismatch"
    assert np.array_equal(np.sort(perm_np), np.arange(N)), "not a permutation"
    print("compiled correctness OK", flush=True)

    bench("pallas bitonic_argsort", bitonic_argsort, keys)
    bench("xla argsort", lambda k: (jnp.sort(k), jnp.argsort(k)), keys)


if __name__ == "__main__":
    main()
