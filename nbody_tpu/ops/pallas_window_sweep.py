"""Pallas TPU kernel for the sorted-window short-range sweep.

VMEM-resident accelerator for nbody_tpu/ops/sorted_window.py — the hot
loop of the spatial-hash force and the Barnes-Hut "window" near engine
(reference kernels: force_spatial_hash.cu:83-152, the 27-cell SIMT
sweep). The XLA formulation streams (B, W)-sized match/weight/delta
intermediates through HBM (measured 318 ms for the 1M hash step); here
each program holds one target block and one source window in VMEM.

Layout contract (built by sorted_window.window_sweep):

  * targets: the cell-sorted particle arrays, blocked (B, ·) — B rows on
    sublanes, the few columns on lanes (position xyz / cell coords);
  * sources: TRANSPOSED copies (4, N) / (3, N) so a window is a LANE
    slice; window starts are data-dependent (cell_start lookups), so they
    arrive via SCALAR PREFETCH, aligned DOWN to a 128-lane boundary in
    XLA — every DMA is then a tiling-aligned dynamic lane slice, with a
    +128 buffer so alignment never loses coverage;
  * pair validity is decided in-kernel by exact integer cell-coordinate
    equality against the window (same predicate as the XLA path, so a
    misplaced window can only MISS pairs — and misses are counted by the
    caller's overflow accounting, never silently dropped);
  * per (block, offset): plain 2D (B, W) VPU blocks — broadcast of
    (B, 1) target columns against (1, W) source rows; the weight applies
    softening after the optional cutoff tests the RAW squared distance
    (reference force_spatial_hash.cu:120-139 semantics).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    starts_ref,  # (n_blocks, n_off) i32 scalar-prefetch
    tpos_ref,    # (B, 3) f32 VMEM block
    tcrd_ref,    # (B, 3) i32 VMEM block
    psrc_hbm,    # (4, Np) f32 ANY
    csrc_hbm,    # (3, Np) i32 ANY
    out_ref,     # (B, 3) f32 VMEM block
    *,
    offsets: Tuple[Tuple[int, int], ...],
    wbuf: int,
    z_hw: int,
    eps: float,
    cut2: Optional[float],
):
    i = pl.program_id(0)
    eps2 = eps * eps

    def inner(win_p, win_c, sem_p, sem_c):
        tx = tpos_ref[:, 0:1]   # (B, 1)
        ty = tpos_ref[:, 1:2]
        tz = tpos_ref[:, 2:3]
        tcx = tcrd_ref[:, 0:1]
        tcy = tcrd_ref[:, 1:2]
        tcz = tcrd_ref[:, 2:3]

        b = tx.shape[0]
        ax = jnp.zeros((b, 1), jnp.float32)
        ay = jnp.zeros((b, 1), jnp.float32)
        az = jnp.zeros((b, 1), jnp.float32)
        for o, (dxo, dyo) in enumerate(offsets):
            s = starts_ref[i, o]
            cp = pltpu.make_async_copy(
                psrc_hbm.at[:, pl.ds(s, wbuf)], win_p, sem_p
            )
            cc = pltpu.make_async_copy(
                csrc_hbm.at[:, pl.ds(s, wbuf)], win_c, sem_c
            )
            cp.start()
            cc.start()
            cp.wait()
            cc.wait()

            sx = win_p[0:1]      # (1, W)
            sy = win_p[1:2]
            sz = win_p[2:3]
            sm = win_p[3:4]
            match = (
                (win_c[0:1] == tcx + dxo)
                & (win_c[1:2] == tcy + dyo)
                & (jnp.abs(win_c[2:3] - tcz) <= z_hw)
            )  # (B, W)
            dxv = sx - tx
            dyv = sy - ty
            dzv = sz - tz
            r2 = dxv * dxv + dyv * dyv + dzv * dzv
            inv = jax.lax.rsqrt(r2 + eps2)
            wgt = sm * (inv * inv * inv)
            if cut2 is not None:
                match = match & (r2 <= cut2)
            wgt = jnp.where(match & (r2 > 0.0), wgt, 0.0)
            ax = ax + jnp.sum(wgt * dxv, axis=1, keepdims=True)
            ay = ay + jnp.sum(wgt * dyv, axis=1, keepdims=True)
            az = az + jnp.sum(wgt * dzv, axis=1, keepdims=True)
        out_ref[:, 0:1] = ax
        out_ref[:, 1:2] = ay
        out_ref[:, 2:3] = az

    pl.run_scoped(
        inner,
        win_p=pltpu.VMEM((4, wbuf), jnp.float32),
        win_c=pltpu.VMEM((3, wbuf), jnp.int32),
        sem_p=pltpu.SemaphoreType.DMA(()),
        sem_c=pltpu.SemaphoreType.DMA(()),
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
    win_starts: jax.Array,  # (n_blocks, n_off) i32, 128-aligned
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
    wbuf = window + 128

    # Targets: sentinel coords on the tail pad never match any window row.
    tpos = jnp.pad(psort[:, :3], ((0, n_pad - n), (0, 0)))
    tcrd = jnp.pad(
        csort, ((0, n_pad - n), (0, 0)), constant_values=-(1 << 28)
    )

    # Sources transposed; lane-count padded so every aligned window fits.
    cols = _round_up(n + wbuf, 128)
    psrcT = jnp.pad(psort.T, ((0, 0), (0, cols - n)))
    csrcT = jnp.pad(
        csort.T, ((0, 0), (0, cols - n)), constant_values=-(1 << 29)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((b, 3), lambda i, s: (i, 0)),
            pl.BlockSpec((b, 3), lambda i, s: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((b, 3), lambda i, s: (i, 0)),
    )
    n_off = len(offsets)
    return pl.pallas_call(
        functools.partial(
            _kernel, offsets=offsets, wbuf=wbuf, z_hw=z_hw,
            eps=float(eps), cut2=cut2,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_off * b * wbuf * 15,
            bytes_accessed=n_blocks * (n_off * 7 * wbuf + 2 * b * 3) * 4,
            transcendentals=n_blocks * n_off * b * wbuf,
        ),
        interpret=interpret,
    )(win_starts, tpos, tcrd, psrcT, csrcT)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
