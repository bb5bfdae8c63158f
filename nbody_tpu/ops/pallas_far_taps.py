"""Pallas TPU kernel for the Barnes-Hut far-field tap convolution.

Accelerates the hot loop of ops/barnes_hut._far_conv_level: the
multipole-to-local translation at one pyramid level is a (2ws+1)³-tap
"convolution" — per tap, a dense (8·19, 8·10) matrix applied to the
spatially shifted child-major moment grid. The XLA form (lax.scan of
dynamic_slice + dot_general at HIGHEST) re-reads the padded moment grid
from HBM once per tap (~284 MB at 1M/L6) and pays 6 MXU passes per dot —
measured 7.4 ms/step while the arithmetic is ~0.3 ms of MXU time.

This kernel keeps one x-slab of the moment grid resident in VMEM and
runs all taps from registers, with the same flattened-lane shift trick
as the near sweep (ops/pallas_tile_near.py): lanes are the RAW (y, z)
plane, a (yo, zo) neighbor offset is a static lane shift of yo·p + zo,
the y-halo falls into zero margins for free and only the z-boundary
wrap needs masking. Output accumulates in the VMEM output block (the
(152, C) accumulator exceeds the register budget).

Numerics: static ``exact`` flag. False casts both operands to bf16 — ONE
MXU pass per tap; the tap sum is an O(θ²)-truncated multipole
approximation evaluated at well-separated cells, so a 2⁻⁸ relative
rounding of individual taps is far below the method error (measured at
the θ=0.5 operating point: identical rel-RMS force error to 3 digits vs
the HIGHEST XLA path). True runs an exact 3-way bf16 split of BOTH
operands stacked on the contraction axis with the mixed term kept
(w0·s0 + w0·(s1+s2) + (w1+w2)·s0 + w1·s1 ≈ HIGHEST's 6-pass schedule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split2(x):
    """x → (hi, lo) bf16 pair with hi + lo + (residual < 2⁻¹⁶·x) = x."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    return hi, r.astype(jnp.bfloat16)


def _taps_kernel(tap_ref, mom_hbm, out_ref, *, p, ws, c, m, t, exact):
    """One (x-plane, lane-chunk) program: all T taps of one output plane.

    tap_ref: (T, 152, 128) VMEM — tap matrices, lanes 80..128 zero
    mom_hbm: (p+2ws, 80, Lp) ANY — x-padded planes, lanes = flat (y, z)
             with an M-lane zero margin at both ends
    out_ref: (1, 152, C) VMEM block — this chunk's local-expansion rows
             (plane-major output: Mosaic requires the trailing block
             dims be (8, 128)-divisible, so the p axis leads)
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    w1 = 2 * ws + 1

    def inner(slab, sem):
        cp = pltpu.make_async_copy(
            mom_hbm.at[pl.ds(i, w1), :, pl.ds(j * c, c + 2 * m)], slab, sem
        )
        cp.start()
        cp.wait()

        lane = j * c + jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        lane_z = lane % p
        zmasks = {
            zo: ((lane_z + zo >= 0) & (lane_z + zo < p)).astype(jnp.float32)
            for zo in range(-ws, ws + 1)
            if zo != 0
        }

        out_ref[...] = jnp.zeros((1, 152, c), jnp.float32)
        ti = 0
        for xo in range(w1):
            for yo in range(-ws, ws + 1):
                for zo in range(-ws, ws + 1):
                    off = m + yo * p + zo
                    src = slab[xo, :, off:off + c]        # (80, C)
                    if zo != 0:
                        src = src * zmasks[zo]
                    mat = tap_ref[ti, :, 0:80]            # (152, 80)
                    if exact:
                        mh, ml = _split2(mat)
                        sh, sl = _split2(src)
                        lhs = jnp.concatenate([mh, mh, ml], axis=1)
                        rhs = jnp.concatenate([sh, sl, sh], axis=0)
                        acc = jax.lax.dot_general(
                            lhs, rhs, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    else:
                        acc = jax.lax.dot_general(
                            mat.astype(jnp.bfloat16),
                            src.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    out_ref[...] = out_ref[...] + acc[None, :, :]
                    ti += 1

    pl.run_scoped(
        inner,
        slab=pltpu.VMEM((w1, 80, c + 2 * m), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit, static_argnames=("p", "ws", "chunk", "exact", "interpret")
)
def far_taps_pallas(
    mom: jax.Array,      # (80, p, p, p) child-major moment grid
    tap_mat: jax.Array,  # (T, 152, 80) per-offset tap matrices
    *,
    p: int,
    ws: int,
    chunk: int = 512,
    exact: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """→ (152, p³) accumulated local-expansion channels (the lax.scan
    tap loop of ops/barnes_hut._far_conv_level, VMEM-resident)."""
    w1 = 2 * ws + 1
    t = w1 ** 3
    l = p * p
    c = min(chunk, _round_up(l, 128))
    m = _round_up(ws * p + ws, 128)
    nc = -(-l // c)

    mom_plane = mom.reshape(80, p, l).transpose(1, 0, 2)  # (p, 80, l)
    mom_pad = jnp.pad(
        mom_plane, [(ws, ws), (0, 0), (m, m + nc * c - l)]
    )  # (p+2ws, 80, Lp)
    taps_pad = jnp.pad(tap_mat.astype(jnp.float32), [(0, 0), (0, 0), (0, 48)])

    out = pl.pallas_call(
        functools.partial(
            _taps_kernel, p=p, ws=ws, c=c, m=m, t=t, exact=exact
        ),
        grid=(p, nc),
        in_specs=[
            pl.BlockSpec((t, 152, 128), lambda i, j: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 152, c), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((p, 152, nc * c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=t * 152 * 80 * p * nc * c * 2,
            bytes_accessed=p * nc * (w1 * 80 * (c + 2 * m) + 152 * c) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(taps_pad, mom_pad)
    if nc * c != l:
        out = out[:, :, :l]
    # (p, 152, l) → (152, p·l): one leading-dim transpose of the SMALL
    # output (152·p³·4 B ≈ 20 MB at p=32) — the channel axis can't lead
    # in the kernel output (Mosaic block divisibility, see _taps_kernel).
    return out.transpose(1, 0, 2).reshape(152, p * l)
