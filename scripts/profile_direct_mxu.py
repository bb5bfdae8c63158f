"""TPU speed A/B: production Pallas direct kernel vs MXU Gram form.

Companion to scripts/study_bf16_direct.py (CPU accuracy study, results
in BENCHMARKS.md plan #5): bf16 Gram is rejected on accuracy; the
viable MXU variant is the Gram product at precision=HIGHEST with
i-block re-centering. This script measures whether its ~2–2.5×
theoretical ceiling (the O(N²·3) dots move to the MXU; rsqrt/w stay
on the VPU) survives contact with hardware at 10K/100K.

Per CLAUDE.md timing rules: lax.scan inside one jit, warmup with a real
readback, min-of-3.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

G, EPS = 1.0, 0.1
BLOCK = 512  # i-rows per map step


def bench(name, fn, arg, reps=10):
    @jax.jit
    def run(p):
        def body(c, _):
            out = fn(c)
            return c * (1.0 + 1e-30 * out[0, 0]), out[0]
        c, outs = jax.lax.scan(body, p, None, length=reps)
        return c, outs

    try:
        c, _ = run(arg)
        float(jnp.sum(c))  # real warmup readback
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            c, _ = run(arg)
            float(jnp.sum(c))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:44s} {best / reps * 1000:9.2f} ms/iter", flush=True)
        return best / reps
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:240]}",
              flush=True)
        return None


def gram_forces(pos, mass):
    """MXU Gram form, HIGHEST precision, i-block re-centering."""
    n = pos.shape[0]
    nb = n // BLOCK
    hi = jax.lax.Precision.HIGHEST
    m = mass

    def acc_block(i, _):
        pb = jax.lax.dynamic_slice(pos, (i * BLOCK, 0), (BLOCK, 3))
        c = jnp.mean(pb, axis=0)
        qi = pb - c
        qj = pos - c
        gram = jnp.dot(qi, qj.T, precision=hi)
        r2 = (
            jnp.sum(qi * qi, axis=1)[:, None]
            + jnp.sum(qj * qj, axis=1)[None, :]
            - 2.0 * gram
        )
        r2 = jnp.maximum(r2, 0.0) + EPS * EPS
        inv = jax.lax.rsqrt(r2)
        w = m[None, :] * inv * inv * inv
        rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0) + i * BLOCK
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, pos.shape[0]), 1)
        w = jnp.where(rows == cols, 0.0, w)
        a = jnp.dot(w, qj, precision=hi) - jnp.sum(
            w, axis=1, keepdims=True
        ) * qi
        return i + 1, G * a

    _, accs = jax.lax.scan(acc_block, 0, None, length=nb)
    return accs.reshape(n, 3)


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.direct import direct_forces, direct_forces_pallas
    from nbody_tpu.ops.morton import morton_encode
    from nbody_tpu.types import SphericalDistParams
    import numpy as np

    print("backend:", jax.default_backend(), flush=True)
    for n in (10_000 // BLOCK * BLOCK, 99840, ):
        s = init_spherical(
            jax.random.PRNGKey(3), n, SphericalDistParams(radius=10.0)
        )
        pos_np = np.asarray(s.pos)
        lo = pos_np.min(axis=0)
        cell = (pos_np - lo).max() / 1024.0
        coords = np.clip(((pos_np - lo) / cell).astype(np.int32), 0, 1023)
        order = np.argsort(np.asarray(morton_encode(jnp.asarray(coords))))
        pos = jax.device_put(jnp.asarray(pos_np[order]))
        mass = jax.device_put(jnp.asarray(np.asarray(s.mass)[order]))
        jax.block_until_ready((pos, mass))

        print(f"--- N={n}", flush=True)
        a_prod = direct_forces_pallas(pos, mass, G, EPS)
        a_gram = gram_forces(pos, mass)
        num = float(jnp.sqrt(jnp.mean(jnp.sum((a_gram - a_prod) ** 2, -1))))
        den = float(jnp.sqrt(jnp.mean(jnp.sum(a_prod**2, -1))))
        print(f"gram-vs-production rel RMS: {num / den:.3e}", flush=True)

        bench("production Pallas direct", lambda p: direct_forces_pallas(
            p, mass, G, EPS), pos)
        bench("XLA blocked direct", lambda p: direct_forces(
            p, mass, G, EPS), pos)
        bench("MXU Gram HIGHEST recentered", lambda p: gram_forces(
            p, mass), pos)


if __name__ == "__main__":
    main()
