"""Direct O(N²) all-pairs gravity.

TPU-native counterpart of the reference's shared-memory-tiled CUDA kernel
(reference: src/cuda/force_direct.cu:10-98). Three implementations:

  * ``direct_forces_reference`` — tiny-N broadcast version; the golden
    reference for tests (plays the role of computeGravitationalForceCPU,
    reference: force_direct.cu:109-117), optionally in float64 on CPU.
  * ``direct_forces`` — blocked XLA version: lax.map over i-blocks against
    the full j-axis; XLA fuses the elementwise chain into the j-reduction so
    the (B, N) pair matrix never materializes in HBM. Runs on any backend.
  * ``direct_forces_pallas`` — the hot TPU kernel: (i, j) grid of VMEM tiles,
    pairwise weights on the VPU, and the 3-component accumulation routed
    through the MXU as a (Bi, Bj) @ (Bj, 3) matmul. This is the VMEM-tile
    analogue of the reference's shared-memory tile loop
    (force_direct.cu:38-78), with rsqrt in place of rsqrtf.

Physics (identical to reference): Plummer-softened gravity
  a_i = G · Σ_j m_j · (x_j − x_i) / (|x_j − x_i|² + ε²)^{3/2}
with the self/coincident term contributing exactly zero (displacement is
the zero vector).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pairwise_acc_block(pos_i, pos_j, mass_j, softening):
    """Acceleration of pos_i (B,3) due to pos_j (M,3) / mass_j (M,).

    Returns (B, 3) un-scaled by G. Coincident pairs contribute zero.
    """
    dx = pos_j[None, :, :] - pos_i[:, None, :]          # (B, M, 3)
    r2_raw = jnp.sum(dx * dx, axis=-1)                   # (B, M)
    r2 = r2_raw + softening * softening
    inv_r = jax.lax.rsqrt(r2)
    w = mass_j[None, :] * inv_r * inv_r * inv_r          # (B, M)
    w = jnp.where(r2_raw == 0.0, 0.0, w)
    return jnp.einsum("bm,bmd->bd", w, dx)


def direct_forces_reference(pos, mass, G=1.0, softening=0.1, dtype=None):
    """Small-N exact broadcast implementation (test golden reference)."""
    if dtype is not None:
        pos = pos.astype(dtype)
        mass = mass.astype(dtype)
    acc = _pairwise_acc_block(pos, pos, mass, softening)
    return (G * acc).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_size",))
def direct_forces(pos, mass, G=1.0, softening=0.1, *, block_size: int = 256):
    """Blocked XLA all-pairs forces; works on CPU and TPU, any N."""
    n = pos.shape[0]
    b = min(block_size, max(n, 1))
    n_pad = -(-n // b) * b
    pos_p = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    # Padding with zero mass makes padded j-columns contribute nothing.
    mass_p = jnp.pad(mass, (0, n_pad - n))

    pos_blocks = pos_p.reshape(n_pad // b, b, 3)

    def one_block(pb):
        return _pairwise_acc_block(pb, pos_p, mass_p, softening)

    acc = jax.lax.map(one_block, pos_blocks).reshape(n_pad, 3)
    return G * acc[:n]


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _direct_kernel(pos_i_ref, pos_jt_ref, mass_j_ref, acc_ref, *, G, eps):
    """One (i, j) tile of the all-pairs interaction.

    pos_i_ref : (Bi, 3)  target positions (lane-padded; tiny)
    pos_jt_ref: (3, Bj)  source positions, transposed so Bj rides the lanes
    mass_j_ref: (1, Bj)  source masses
    acc_ref   : (Bi, 3)  output accumulator (revisited across the j grid dim)

    G and eps are compile-time constants: the force strategy is rebuilt (and
    recompiled) when the user changes them, matching the facade's
    rebuild-on-set semantics (reference: particle_system.cpp:173-207).
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xi = pos_i_ref[:, 0:1]                   # (Bi, 1)
    yi = pos_i_ref[:, 1:2]
    zi = pos_i_ref[:, 2:3]
    xj = pos_jt_ref[0:1, :]                  # (1, Bj)
    yj = pos_jt_ref[1:2, :]
    zj = pos_jt_ref[2:3, :]

    dx = xj - xi                             # (Bi, Bj)
    dy = yj - yi
    dz = zj - zi
    r2_raw = dx * dx + dy * dy + dz * dz
    inv_r = jax.lax.rsqrt(r2_raw + eps * eps)
    w = mass_j_ref[0:1, :] * (inv_r * inv_r * inv_r)
    w = jnp.where(r2_raw == 0.0, 0.0, w)     # self/coincident → zero

    # Accumulate Σ_j w·(x_j − x_i) as three VPU lane-reductions over the
    # displacement form. NOT as the algebraically-equivalent
    # W@X − rowsum(W)·x matmul: (a) TPU f32 dots default to bf16 MXU passes
    # (~3-digit precision), and (b) the matmul form catastrophically cancels
    # the common-mode position offset. The displacement form is exactly the
    # conditioning of the reference's FMA loop (force_direct.cu:58-70).
    acc_ref[:, 0:1] += jnp.sum(w * dx, axis=1, keepdims=True)
    acc_ref[:, 1:2] += jnp.sum(w * dy, axis=1, keepdims=True)
    acc_ref[:, 2:3] += jnp.sum(w * dz, axis=1, keepdims=True)

    @pl.when(j == n_j - 1)
    def _():
        acc_ref[:] *= G


@functools.partial(
    jax.jit,
    static_argnames=("G", "softening", "block_i", "block_j", "interpret"),
)
def direct_forces_pallas(
    pos,
    mass,
    G=1.0,
    softening=0.1,
    *,
    block_i: int = 1024,
    block_j: int = 1024,
    interpret: bool = False,
):
    """All-pairs forces as a Pallas (i, j)-tiled TPU kernel."""
    n = pos.shape[0]
    bi = min(block_i, max(8, -(-n // 8) * 8))
    bj = min(block_j, max(128, -(-n // 128) * 128))
    n_i = -(-n // bi) * bi
    n_j = -(-n // bj) * bj
    n_pad = max(n_i, n_j)

    pos_p = jnp.pad(pos.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    mass_p = jnp.pad(mass.astype(jnp.float32), (0, n_pad - n))[None, :]
    pos_t = pos_p.T  # (3, n_pad)

    grid = (n_pad // bi, n_pad // bj)
    acc = pl.pallas_call(
        functools.partial(
            _direct_kernel, G=float(G), eps=float(softening)
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bi, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bi, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(n_pad) * int(n_pad) * 20,
            bytes_accessed=int(n_pad) * 16 * (grid[0] + grid[1]),
            transcendentals=int(n_pad) * int(n_pad),
        ),
        interpret=interpret,
    )(pos_p, pos_t, mass_p)
    return acc[:n]


def _pe_kernel(pos_i_ref, pos_jt_ref, mass_i_ref, mass_j_ref, out_ref, *,
               eps):
    """One (i, j) tile of the pairwise potential sum.

    Accumulates Σ_block m_i·m_j/√(r²+ε²) into out cols [0]=sum, [1]=Kahan
    compensation (revisited across the j grid dim) — the all-pairs PE at
    the direct kernel's VMEM throughput. The XLA blocked PE streams
    (B, N, 3) displacement temps through HBM (~350 s at 1M — and a
    device program that long can crash the TPU worker); this runs in
    seconds.
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = pos_i_ref[:, 0:1]                   # (Bi, 1)
    yi = pos_i_ref[:, 1:2]
    zi = pos_i_ref[:, 2:3]
    xj = pos_jt_ref[0:1, :]                  # (1, Bj)
    yj = pos_jt_ref[1:2, :]
    zj = pos_jt_ref[2:3, :]

    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2_raw = dx * dx + dy * dy + dz * dz
    inv_r = jax.lax.rsqrt(r2_raw + eps * eps)
    e = mass_i_ref[:, 0:1] * mass_j_ref[0:1, :] * inv_r
    e = jnp.where(r2_raw == 0.0, 0.0, e)     # self/coincident excluded
    part = jnp.sum(e).reshape(1, 1)          # (Bi, Bj) tree-reduced

    # Kahan across the j revisits: the partials are one-signed, so plain
    # f32 accumulation would drift coherently over ~1000 blocks. All
    # operands stay (1, 1)-shaped: Mosaic rejects scalar VMEM stores.
    s = out_ref[0:1, 0:1]
    comp = out_ref[0:1, 1:2]
    y = part - comp
    t = s + y
    out_ref[0:1, 0:1] = t
    out_ref[0:1, 1:2] = (t - s) - y


@functools.partial(
    jax.jit,
    static_argnames=("G", "softening", "block_i", "block_j", "interpret"),
)
def pairwise_potential_pallas(
    pos,
    mass,
    G=1.0,
    softening=0.1,
    *,
    block_i: int = 1024,
    block_j: int = 1024,
    interpret: bool = False,
):
    """PE = −G Σ_{i<j} m_i·m_j/√(r²+ε²) via the VMEM all-pairs kernel.

    Per-(i,j)-tile sums are exact trees; Kahan carries the j-accumulation;
    the final cross-block reduction is an XLA tree — overall relative
    error ~1e-6, far below the 1e-4 drift target it serves
    (docs/specs/quality-attributes.md)."""
    n = pos.shape[0]
    bi = min(block_i, max(8, -(-n // 8) * 8))
    bj = min(block_j, max(128, -(-n // 128) * 128))
    n_i = -(-n // bi) * bi
    n_j = -(-n // bj) * bj
    n_pad = max(n_i, n_j)

    pos_p = jnp.pad(pos.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    mass_p = jnp.pad(mass.astype(jnp.float32), (0, n_pad - n))
    grid = (n_pad // bi, n_pad // bj)

    parts = pl.pallas_call(
        functools.partial(_pe_kernel, eps=float(softening)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bi, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bj), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bj), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            # (8, 128): Mosaic requires sublane-dim blocks divisible by
            # 8 — rows 1..7 of each block stay zero.
            (8, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0] * 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n_pad) * n_pad * 9,
            bytes_accessed=grid[0] * grid[1] * (bi * 4 + bj * 4) * 4,
            transcendentals=int(n_pad) * n_pad,
        ),
        interpret=interpret,
    )(pos_p, pos_p.T, mass_p[:, None], mass_p[None, :])
    return -0.5 * G * jnp.sum(parts[:, 0])
