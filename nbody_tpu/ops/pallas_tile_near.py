"""Pallas TPU kernel for the dense cell-tile near-field sweep.

Drop-in accelerator for the hot loop of nbody_tpu/ops/tile_sweep.py. The
XLA formulation streams (K, pc)-sized intermediates through HBM (fusion
limits); this kernel keeps the working set in VMEM.

Mosaic constraint shaping (learned the hard way):
  * dynamic lane-dim offsets are rejected → the z shifts are PRE-MATERIALIZED
    in XLA as 2ws+1 statically shifted copies, making z a plain indexable
    axis and the lane dim a full static D-wide row;
  * DMA slices need tiling-aligned trailing dims → Y is padded to 8, the
    lane dim is exactly D (power of two);
  * VMEM is ~16 MB → the grid is (D, y-halves) so each program's slab
    (K, 4, 2ws+1 x-rows, 2ws+1 z-shifts, Yhalf+2ws+pad, D) stays ≤ ~12 MB.

Layout: slot axis on sublanes... strictly: per (xo, zo, yo) offset the
kernel reads source rows (K_s, Y, D) and sweeps K_t target rows with
pure VPU math; empty slots carry mass 0 at their cell center and are
inert. Coincident/self pairs need masking only at ε = 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _near_kernel(
    tiles_hbm, acc_ref, *, k, d, dl, ws, yh, yhp, eps, zero_guard
):
    """One (x-plane, y-chunk) program.

    tiles_hbm: (K, 4, D+2ws, 2ws+1, Yp, DL) — dim 3 indexes the z-shift,
               lane dim DL is D rounded to 128 (DMA tiling)
    acc_ref:   (K, 3, 1, YH, D) VMEM
    """
    w1 = 2 * ws + 1
    eps2 = eps * eps
    i = pl.program_id(0)   # x-plane
    h = pl.program_id(1)   # y-chunk

    def inner(slab, sem):
        # slab: (K, 4, w1, w1, YHP, DL); source y rows for this chunk
        # start at h*yh in padded coords.
        cp = pltpu.make_async_copy(
            tiles_hbm.at[:, :, pl.ds(i, w1), :, pl.ds(h * yh, yhp)],
            slab,
            sem,
        )
        cp.start()
        cp.wait()

        # target rows: central x (xo = ws), unshifted z (zo = ws), y rows
        # ws..ws+yh within the slab
        tx = slab[:, 0, ws, ws, ws : ws + yh, :]   # (K, YH, DL)
        ty = slab[:, 1, ws, ws, ws : ws + yh, :]
        tz = slab[:, 2, ws, ws, ws : ws + yh, :]

        acc = jnp.zeros((k, 3, yh, dl), jnp.float32)

        def off_body(o, acc):
            xo = o // (w1 * w1)
            yo = (o // w1) % w1
            zo = o % w1
            sx = slab[:, 0, xo, zo, pl.ds(yo, yh), :]   # (K, YH, DL)
            sy = slab[:, 1, xo, zo, pl.ds(yo, yh), :]
            sz = slab[:, 2, xo, zo, pl.ds(yo, yh), :]
            sm = slab[:, 3, xo, zo, pl.ds(yo, yh), :]
            rows = []
            for kt in range(k):
                dx = sx - tx[kt]
                dy = sy - ty[kt]
                dz = sz - tz[kt]
                r2 = dx * dx + dy * dy + dz * dz
                inv = jax.lax.rsqrt(r2 + eps2)
                w = sm * (inv * inv * inv)
                if zero_guard:
                    w = jnp.where(r2 == 0.0, 0.0, w)
                rows.append(
                    jnp.stack(
                        [
                            jnp.sum(w * dx, axis=0),
                            jnp.sum(w * dy, axis=0),
                            jnp.sum(w * dz, axis=0),
                        ]
                    )
                )
            return acc + jnp.stack(rows, axis=0)

        acc = jax.lax.fori_loop(0, w1 * w1 * w1, off_body, acc)
        acc_ref[:, :, 0, :, :] = acc[:, :, :, :d]

    pl.run_scoped(
        inner,
        slab=pltpu.VMEM(
            (k, 4, 2 * ws + 1, 2 * ws + 1, yhp, dl), jnp.float32
        ),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit, static_argnames=("k", "d", "ws", "eps", "interpret")
)
def tile_sweep_pallas(
    tiles_t: jax.Array,
    *,
    k: int,
    d: int,
    ws: int,
    eps: float,
    interpret: bool = False,
) -> jax.Array:
    """(K, 4, D, D, D) slot tensor → (K, 3, D, D, D) per-slot accelerations.

    Input layout matches tile_sweep.py's transposed tiles (slots leading,
    cells on lanes). Returns un-scaled accelerations (multiply by G).
    """
    w1 = 2 * ws + 1
    # y chunk per program, sized so the slab fits VMEM with the lane dim
    # padded to 128 (DMA tiling requirement)
    dl = _round_up(d, 128)
    budget = (10 * 1024 * 1024) // (k * 4 * w1 * w1 * dl * 4)
    yh = 8
    while yh * 2 <= min(d, max(budget, 8)):
        yh *= 2
    yh = min(yh, d)
    yhp = _round_up(yh + 2 * ws, 8)

    # Pad x and y by ws; z padding is folded into the shifted copies.
    zpad = jnp.pad(
        tiles_t, [(0, 0), (0, 0), (ws, ws), (ws, yhp - yh - ws), (ws, ws)]
    )  # (K, 4, D+2ws, Yp, D+2ws)
    # Pre-materialize the z shifts with the lane dim padded to 128:
    # (K, 4, D+2ws, w1, Yp, DL). Pad slots carry mass 0 → inert.
    shifted = jnp.stack(
        [
            jnp.pad(zpad[..., zo : zo + d], [(0, 0)] * 4 + [(0, dl - d)])
            for zo in range(w1)
        ],
        axis=3,
    )

    zero_guard = eps == 0.0

    out = pl.pallas_call(
        functools.partial(
            _near_kernel,
            k=k,
            d=d,
            dl=dl,
            ws=ws,
            yh=yh,
            yhp=yhp,
            eps=float(eps),
            zero_guard=zero_guard,
        ),
        grid=(d, d // yh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (k, 3, 1, yh, d),
            lambda i, h: (0, 0, i, h, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((k, 3, d, d, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(w1**3) * k * k * d * d * d * 12,
            bytes_accessed=int(d) * 2 * (k * 4 * w1 * w1 * yhp * d) * 4,
            transcendentals=int(w1**3) * k * k * d * d * d,
        ),
        interpret=interpret,
    )(shifted)
    return out
