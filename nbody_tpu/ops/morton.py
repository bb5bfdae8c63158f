"""Morton (Z-order) codes — vectorized bit interleaving.

TPU-native counterpart of the reference's Morton kernels
(reference: src/cuda/force_barnes_hut.cu:23-38, 113-127): 30-bit codes,
10 bits per axis, built by parallel bit expansion. Here the bit tricks run
vectorized over (N,) int32 arrays on the VPU.

The grid-pyramid Barnes-Hut (ops/barnes_hut.py) does not need Morton
order (its sweeps are dense), but Z-order sorting improves the locality
of the sorted-window engine for cube-ish neighborhoods and is exposed for
that and for interop/debugging parity with the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MORTON_BITS = 10  # per axis → 30-bit codes (reference: 10 bits/axis)


def expand_bits(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so each lands at 3× its position
    (reference: expandBits, force_barnes_hut.cu:23-30)."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def compact_bits(v: jax.Array) -> jax.Array:
    """Inverse of expand_bits: gather every 3rd bit back together."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x09249249)
    v = (v | (v >> 2)) & jnp.uint32(0x030C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0300F00F)
    v = (v | (v >> 8)) & jnp.uint32(0x030000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def morton_encode(coords: jax.Array) -> jax.Array:
    """(N, 3) int cell coords (each < 2^10) → (N,) uint32 Morton codes
    (reference: computeMortonCode, force_barnes_hut.cu:33-38)."""
    x = expand_bits(coords[..., 0])
    y = expand_bits(coords[..., 1])
    z = expand_bits(coords[..., 2])
    return (x << 2) | (y << 1) | z


def morton_decode(codes: jax.Array) -> jax.Array:
    """(N,) uint32 Morton codes → (N, 3) int32 cell coords."""
    x = compact_bits(codes >> 2)
    y = compact_bits(codes >> 1)
    z = compact_bits(codes)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def morton_codes_for_positions(
    pos: jax.Array, lo: jax.Array, extent: jax.Array
) -> jax.Array:
    """Positions → Morton codes over a normalized 1024³ grid
    (reference: computeMortonCodesKernel, force_barnes_hut.cu:113-127)."""
    scale = (1 << MORTON_BITS) / jnp.maximum(extent, 1e-30)
    coords = jnp.clip(
        ((pos - lo) * scale).astype(jnp.int32), 0, (1 << MORTON_BITS) - 1
    )
    return morton_encode(coords)
