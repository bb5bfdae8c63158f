"""Accuracy study: MXU-form direct N² forces in bf16 (VERDICT r2 #8).

The direct kernel (ops/direct.py) evaluates pairs on the VPU in f32:
~20 flops/pair all on the vector unit. The MXU formulation moves the
O(N²) dot products onto the matmul unit:

    r²_ij = |p_i|² + |p_j|² − 2 p_i·p_j          (Gram matmul)
    w_ij  = m_j · (r²_ij + ε²)^{−3/2}            (VPU elementwise)
    a_i   = W @ P_j − rowsum(W) · p_i            (two more matmuls)

which is ~2× fewer VPU flops/pair — IF the precision holds. The Gram
expansion catastrophically cancels for NEAR pairs (r² ≪ |p|²), and
bf16 has 8 mantissa bits, so the viability question is purely numeric:
how much error does each matmul precision leave, and does re-centering
tiles of Morton-sorted particles (distance is translation-invariant;
subtracting a shared tile-pair midpoint shrinks |p| to local scale)
recover it?

This script measures exactly that on CPU (no TPU needed): relative
force RMS error vs an f64 all-pairs reference for
  * the production f32 VPU math (baseline),
  * Gram form in f32 (HIGHEST analogue),
  * Gram form with the dot in bf16, global coordinates,
  * Gram form with the dot in bf16, Morton-tile re-centered,
  * diff form (pᵢ−pⱼ then square) with the SQUARE in bf16 — no
    cancellation, bf16 only loses mantissa on the diff itself.

Speed A/B lives in scripts/profile_direct_mxu.py (TPU). Reference
kernel being challenged: src/cuda/force_direct.cu (f32 CUDA tile
kernel); our production kernel: ops/direct.py:134.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

N = 4096
TILE = 256
G_CONST = 1.0
EPS = 0.1


def ref_forces_f64(pos, mass):
    p = pos.astype(jnp.float64)
    m = mass.astype(jnp.float64)
    d = p[None, :, :] - p[:, None, :]
    r2 = jnp.sum(d * d, axis=-1) + EPS * EPS
    w = m[None, :] * r2**-1.5
    w = w - jnp.diag(jnp.diag(w))
    return G_CONST * jnp.einsum("ij,ijk->ik", w, d)


def vpu_f32(pos, mass):
    """Production math: diff then square, all f32 (ops/direct.py)."""
    p = pos.astype(jnp.float32)
    m = mass.astype(jnp.float32)
    d = p[None, :, :] - p[:, None, :]
    r2 = jnp.sum(d * d, axis=-1) + EPS * EPS
    inv = jax.lax.rsqrt(r2)
    w = m[None, :] * inv * inv * inv
    w = w - jnp.diag(jnp.diag(w))
    return G_CONST * (w @ p - jnp.sum(w, axis=1, keepdims=True) * p)


def gram_forces(pos, mass, dot_dtype, recenter):
    """Gram-form forces; the O(N²·3) dot runs in ``dot_dtype``.

    ``recenter``: subtract the midpoint of each (i-tile, j-tile)
    centroid pair before the Gram product (translation-invariant).
    Tiles are contiguous runs of the MORTON-SORTED array, so near pairs
    share near-identical centroids and the cancellation magnitude
    shrinks from |scene| to |tile extent|.
    """
    p32 = pos.astype(jnp.float32)
    m32 = mass.astype(jnp.float32)
    n = p32.shape[0]
    nt = n // TILE
    pt = p32.reshape(nt, TILE, 3)
    cent = pt.mean(axis=1)  # (nt, 3)
    out = jnp.zeros((n, 3), jnp.float32)
    acc = []
    for i in range(nt):
        pi = pt[i]
        ai = jnp.zeros((TILE, 3), jnp.float32)
        for j in range(nt):
            pj = pt[j]
            if recenter:
                mid = 0.5 * (cent[i] + cent[j])
                qi, qj = pi - mid, pj - mid
            else:
                qi, qj = pi, pj
            qi_d = qi.astype(dot_dtype)
            qj_d = qj.astype(dot_dtype)
            gram = jnp.dot(
                qi_d, qj_d.T, preferred_element_type=jnp.float32
            )
            r2 = (
                jnp.sum(qi * qi, axis=1)[:, None]
                + jnp.sum(qj * qj, axis=1)[None, :]
                - 2.0 * gram
                + EPS * EPS
            )
            r2 = jnp.maximum(r2, EPS * EPS)  # cancellation floor
            inv = jax.lax.rsqrt(r2)
            w = m32[j * TILE : (j + 1) * TILE][None, :] * inv**3
            if i == j:
                w = w - jnp.diag(jnp.diag(w))
            # acc via matmuls too (the production MXU form)
            ai = ai + (
                w @ qj - jnp.sum(w, axis=1, keepdims=True) * qi
            )
        acc.append(ai)
    return G_CONST * jnp.concatenate(acc, axis=0)


def diff_bf16(pos, mass):
    """Diff-form with the SQUARE in bf16 (no cancellation; tests how
    much pure bf16 rounding on r² costs)."""
    p = pos.astype(jnp.float32)
    m = mass.astype(jnp.float32)
    d = (p[None, :, :] - p[:, None, :]).astype(jnp.bfloat16)
    r2 = (
        jnp.sum(d.astype(jnp.float32) * d.astype(jnp.float32), axis=-1)
    )
    r2bf = jnp.sum(
        (d * d).astype(jnp.float32), axis=-1
    )  # squares accumulated from bf16 products
    del r2
    r2bf = r2bf + EPS * EPS
    inv = jax.lax.rsqrt(r2bf)
    w = m[None, :] * inv**3
    w = w - jnp.diag(jnp.diag(w))
    return G_CONST * (w @ p - jnp.sum(w, axis=1, keepdims=True) * p)


def rel_rms(a, ref):
    num = jnp.sqrt(jnp.mean(jnp.sum((a - ref) ** 2, axis=-1)))
    den = jnp.sqrt(jnp.mean(jnp.sum(ref**2, axis=-1)))
    return float(num / den)


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.morton import morton_encode
    from nbody_tpu.types import SphericalDistParams

    for radius, label in ((10.0, "r=10 sphere (default scene)"),
                          (1000.0, "r=1000 sphere (large coords)")):
        s = init_spherical(
            jax.random.PRNGKey(3), N, SphericalDistParams(radius=radius)
        )
        pos = np.asarray(s.pos, np.float64)
        mass = np.asarray(s.mass, np.float64)
        # Morton order so tiles are spatially local
        lo = pos.min(axis=0)
        ext = (pos - lo).max()
        cell = ext / 1024.0
        coords = np.clip(((pos - lo) / cell).astype(np.int32), 0, 1023)
        codes = np.asarray(morton_encode(jnp.asarray(coords)))
        order = np.argsort(codes)
        pos, mass = jnp.asarray(pos[order]), jnp.asarray(mass[order])

        ref = ref_forces_f64(pos, mass)
        rows = [
            ("VPU f32 (production math)", vpu_f32(pos, mass)),
            ("Gram f32 global", gram_forces(pos, mass, jnp.float32, False)),
            ("Gram f32 recentered", gram_forces(pos, mass, jnp.float32, True)),
            ("Gram bf16 global", gram_forces(pos, mass, jnp.bfloat16, False)),
            ("Gram bf16 recentered", gram_forces(pos, mass, jnp.bfloat16, True)),
            ("diff-form bf16 squares", diff_bf16(pos, mass)),
        ]
        print(f"\n=== {label}, N={N}, tile={TILE} ===")
        for name, acc in rows:
            print(f"{name:32s} rel force RMS = {rel_rms(acc, ref):.3e}")


if __name__ == "__main__":
    main()
