"""Pallas TPU kernel for the sorted-window short-range sweep.

VMEM-resident accelerator for nbody_tpu/ops/sorted_window.py — the hot
loop of the spatial-hash force and the Barnes-Hut "window" near engine
(reference kernels: force_spatial_hash.cu:83-152, the 27-cell SIMT
sweep). The XLA formulation streams (B, W)-sized match/weight/delta
intermediates through HBM; here each program holds one target block and
one source window in VMEM.

Layout contract (built by sorted_window.window_sweep), each choice
pinned by a Mosaic constraint probed on hardware:

  * sources are channel-major f32 (8, N): [x, y, z, m, cx, cy, cz, ·]
    with the integer cell coords carried as exact f32 — ONE array, ONE
    window DMA per offset. A window is a LANE slice whose dynamic start
    must be PROVABLY 128-aligned: the scalar prefetch carries
    ``start // 128`` and the kernel multiplies back (row-major windows
    are rejected: DMA trailing dims must be 128-aligned);
  * targets are (3, n_pad) transposed blocks (lane-aligned); in-kernel
    they are flipped to (B, 1) sublane columns by an EXACT eye-matmul
    (one-hot × f32 at precision=HIGHEST is bit-exact — 3 × 8-bit bf16
    mantissas cover f32), because Mosaic has no cheap vector transpose;
  * pair math runs on (B sublanes, 128 lanes) chunks of the window —
    32-vreg operands; full-window operands spill the register allocator;
  * the (B, 3) accumulator flips back to the (3, B) output block with a
    second eye-matmul;
  * pair validity is exact cell-coordinate equality against the window
    (same predicate as the XLA path: a misplaced window can only MISS
    pairs, counted by the caller's overflow audit, never double-count);
    the optional cutoff tests the RAW squared distance before softening
    (reference force_spatial_hash.cu:120-139 semantics).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _eye(b: int) -> jax.Array:
    r = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    return (r == c).astype(jnp.float32)


def _kernel(
    starts_ref,  # (n_blocks·n_off,) i32 scalar-prefetch: starts // 128
                 # FLAT: 2-D prefetch operands are lane-padded to 128 in
                 # SMEM and blow its 1 MB limit at 1M particles
    nch_ref,     # (n_blocks·n_off,) i32 scalar-prefetch: live 128-lane
                 # chunks per window (ceil((needed_end − aligned)/128))
    tposT_ref,   # (3, B) f32 VMEM block
    tcrdT_ref,   # (3, B) f32 VMEM block (exact integer coords)
    src_hbm,     # (8, cols) f32 ANY
    out_ref,     # (3, B) f32 VMEM block
    *,
    offsets: Tuple[Tuple[int, int], ...],
    wbuf: int,
    z_hw: int,
    eps: float,
    cut2: Optional[float],
):
    i = pl.program_id(0)
    eps2 = eps * eps

    def inner(win, sem):
        b = tposT_ref.shape[1]
        eye = _eye(b)
        hp = jax.lax.Precision.HIGHEST
        # (3, B) -> (B, 3) exactly (module docstring)
        tpos = jax.lax.dot_general(
            eye, tposT_ref[...], (((1,), (1,)), ((), ())), precision=hp
        )
        tcrd = jax.lax.dot_general(
            eye, tcrdT_ref[...], (((1,), (1,)), ((), ())), precision=hp
        )
        tx, ty, tz = tpos[:, 0:1], tpos[:, 1:2], tpos[:, 2:3]
        tcx, tcy, tcz = tcrd[:, 0:1], tcrd[:, 1:2], tcrd[:, 2:3]

        ax = jnp.zeros((b, 1), jnp.float32)
        ay = jnp.zeros((b, 1), jnp.float32)
        az = jnp.zeros((b, 1), jnp.float32)
        n_off = len(offsets)
        for o, (dxo, dyo) in enumerate(offsets):
            s128 = starts_ref[i * n_off + o]
            # DYNAMIC SPAN (the structural win over the static form): the
            # pair loop runs only the window's LIVE 128-lane chunks. Rows
            # past needed_end can never match — cell ids are sorted, so
            # every source with a matching shifted cell lies in
            # [cell_start[base0], cell_start[base1]) (see _window_starts)
            # — making the truncation bit-identical while the per-window
            # cost tracks the block's ACTUAL neighbor span instead of the
            # worst-case static window (the dense 1M scene needs
            # window=2048 only in the core; the mean live span is ~⅓ of
            # that, and edge/empty columns skip the DMA entirely).
            nw = nch_ref[i * n_off + o]

            @pl.when(nw > 0)
            def _(o=o, s128=s128):
                cp = pltpu.make_async_copy(
                    src_hbm.at[:, pl.ds(s128 * 128, wbuf)], win, sem
                )
                cp.start()
                cp.wait()

            def chunk(j, carry, dxo=dxo, dyo=dyo):
                cax, cay, caz = carry
                # dynamic lane offset: j·128 is provably 128-divisible
                win_v = win[:, pl.ds(j * 128, 128)]
                sx = win_v[0:1, :]              # (1, 128)
                sy = win_v[1:2, :]
                sz = win_v[2:3, :]
                sm = win_v[3:4, :]
                match = (
                    (win_v[4:5, :] == tcx + float(dxo))
                    & (win_v[5:6, :] == tcy + float(dyo))
                    & (jnp.abs(win_v[6:7, :] - tcz) <= float(z_hw))
                )  # (B, 128)
                dxv = sx - tx
                dyv = sy - ty
                dzv = sz - tz
                r2 = dxv * dxv + dyv * dyv + dzv * dzv
                inv = jax.lax.rsqrt(r2 + eps2)
                wgt = sm * (inv * inv * inv)
                if cut2 is not None:
                    match2 = match & (r2 <= cut2)
                else:
                    match2 = match
                wgt = jnp.where(match2 & (r2 > 0.0), wgt, 0.0)
                return (
                    cax + jnp.sum(wgt * dxv, axis=1, keepdims=True),
                    cay + jnp.sum(wgt * dyv, axis=1, keepdims=True),
                    caz + jnp.sum(wgt * dzv, axis=1, keepdims=True),
                )

            ax, ay, az = jax.lax.fori_loop(0, nw, chunk, (ax, ay, az))
        acc = jnp.concatenate([ax, ay, az], axis=1)  # (B, 3)
        # (B, 3) -> (3, B): contract acc's B with eye's dim 0
        out_ref[...] = jax.lax.dot_general(
            acc, eye, (((0,), (0,)), ((), ())), precision=hp
        )

    pl.run_scoped(
        inner,
        win=pltpu.VMEM((8, wbuf), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "block_size", "window", "z_hw", "eps", "cut2",
        "interpret",
    ),
)
def window_sweep_pallas(
    psort: jax.Array,       # (N, 4) sorted x,y,z,m
    csort: jax.Array,       # (N, 3) sorted int cell coords
    win_starts: jax.Array,  # (n_blocks, n_off) i32 window starts
    win_chunks: jax.Array,  # (n_blocks, n_off) i32 live 128-lane chunks
    *,
    offsets: Tuple[Tuple[int, int], ...],
    block_size: int,
    window: int,
    z_hw: int,
    eps: float,
    cut2: Optional[float],
    interpret: bool = False,
) -> jax.Array:
    """Per-target accelerations in SORTED order, (n_pad, 3) un-scaled."""
    n = psort.shape[0]
    b = block_size
    n_pad = -(-n // b) * b
    n_blocks = n_pad // b
    # +128 alignment buffer, rounded so the kernel's lane-chunk loop
    # tiles the window exactly (extra coverage can only reduce misses:
    # validity is exact cell matching, never double-counted).
    wbuf = _round_up(window + 128, 128)

    # Targets transposed; sentinel coords on the tail pad never match.
    tposT = jnp.pad(psort[:, :3], ((0, n_pad - n), (0, 0))).T
    tcrdT = jnp.pad(
        csort.astype(jnp.float32),
        ((0, n_pad - n), (0, 0)),
        constant_values=float(1 << 26),
    ).T

    # Sources channel-major with f32 cell coords (exact for ids < 2^24).
    cols = _round_up(n + wbuf + 128, 128)
    src = jnp.concatenate(
        [
            psort,
            csort.astype(jnp.float32),
            jnp.zeros((n, 1), jnp.float32),
        ],
        axis=-1,
    ).T  # (8, N)
    src = jnp.pad(src, ((0, 0), (0, cols - n)))
    src = src.at[4:7, n:].set(float(1 << 27))  # pad coords never match

    starts128 = jnp.clip(
        win_starts // 128, 0, (cols - wbuf) // 128
    ).reshape(-1)
    nchunks = jnp.clip(win_chunks, 0, wbuf // 128).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, b), lambda i, s, c: (0, i)),
            pl.BlockSpec((3, b), lambda i, s, c: (0, i)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((3, b), lambda i, s, c: (0, i)),
    )
    n_off = len(offsets)
    out = pl.pallas_call(
        functools.partial(
            _kernel, offsets=offsets, wbuf=wbuf, z_hw=z_hw,
            eps=float(eps), cut2=cut2,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_off * b * wbuf * 15,
            bytes_accessed=n_blocks * (n_off * 8 * wbuf + 2 * b * 3) * 4,
            transcendentals=n_blocks * n_off * b * wbuf,
        ),
        interpret=interpret,
    )(starts128, nchunks, tposT, tcrdT, src)
    return out.T


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
