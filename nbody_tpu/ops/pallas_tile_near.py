"""Pallas TPU kernel for the dense cell-tile near-field sweep.

Drop-in accelerator for the hot loop of nbody_tpu/ops/tile_sweep.py. The
XLA formulation streams every (K, 4, D³) intermediate through HBM (fusion
limits); this kernel keeps one x-slab of the padded tile tensor plus the
accumulator resident in VMEM and runs the whole (2ws+1)³-offset sweep at
register bandwidth:

  grid:      (D,) — one program per target x-plane
  resident:  source slab (K, 4, 2ws+1, D+2ws, D+2ws) ≈ 6 MB at K=16, D=64
  loop:      fori_loop over the (2ws+1)³ offsets; per offset a dynamic
             2-D shift of the slab and K target-slot rows of VPU math
  output:    per-slot accelerations (K, 3, D, D) for the plane

Empty slots carry mass 0 at their cell center, so they are inert without
masks; coincident/self pairs are zeroed by the r² > 0 test only when ε = 0
(for ε > 0 the zero displacement already nullifies them).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _near_kernel(tiles_hbm, acc_ref, *, k, d, ws, yp, zp, eps, zero_guard):
    """One target x-plane.

    tiles_hbm: (K, 4, D+2ws, Yp, Zp) in ANY/HBM — padded tensor with the
               sublane (Y) dim rounded to 8 and the lane (Z) dim rounded to
               128 so the per-program slab DMA is tiling-aligned (BlockSpec
               windows cannot overlap, so the slab copy is explicit)
    acc_ref:   (K, 3, 1, D, D) VMEM — output accumulators
    """
    w1 = 2 * ws + 1
    eps2 = eps * eps
    i = pl.program_id(0)

    def inner(slab, sem):
        cp = pltpu.make_async_copy(
            tiles_hbm.at[:, :, pl.ds(i, w1)], slab, sem
        )
        cp.start()
        cp.wait()

        # target plane: the slab's central x-row, unpadded y/z crop
        tx = slab[:, 0, ws, ws : ws + d, ws : ws + d]  # (K, D, D)
        ty = slab[:, 1, ws, ws : ws + d, ws : ws + d]
        tz = slab[:, 2, ws, ws : ws + d, ws : ws + d]

        acc = jnp.zeros((k, 3, d, d), jnp.float32)
        # The z offset shifts the LANE dimension — Mosaic requires static
        # (or 128-aligned) lane starts, so z is a static Python loop; the
        # (x, y) offsets stay a dynamic fori_loop (dim-2 slicing is free,
        # dim-3 sublane dynamic starts are supported).
        for zo in range(w1):

            def off_body(o, acc, zo=zo):
                xo = o // w1
                yo = o % w1
                sx = slab[:, 0, xo, pl.ds(yo, d), zo : zo + d]  # (K, D, D)
                sy = slab[:, 1, xo, pl.ds(yo, d), zo : zo + d]
                sz = slab[:, 2, xo, pl.ds(yo, d), zo : zo + d]
                sm = slab[:, 3, xo, pl.ds(yo, d), zo : zo + d]

                rows = []
                for kt in range(k):
                    dx = sx - tx[kt]                   # (K_s, D, D)
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
                return acc + jnp.stack(rows, axis=0)   # (K, 3, D, D)

            acc = jax.lax.fori_loop(0, w1 * w1, off_body, acc)
        acc_ref[:, :, 0, :, :] = acc

    pl.run_scoped(
        inner,
        slab=pltpu.VMEM((k, 4, w1, yp, zp), jnp.float32),
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

    def round_up(x, m):
        return -(-x // m) * m

    yp = round_up(d + 2 * ws, 8)
    zp = round_up(d + 2 * ws, 128)
    pad = [
        (0, 0),
        (0, 0),
        (ws, ws),
        (ws, yp - d - ws),
        (ws, zp - d - ws),
    ]
    tiles_pad = jnp.pad(tiles_t, pad)  # pad slots are inert (mass 0)

    # ε = 0 needs the coincident-pair guard; ε > 0 does not (w is finite
    # and the zero displacement nullifies the contribution).
    zero_guard = eps == 0.0

    return pl.pallas_call(
        functools.partial(
            _near_kernel, k=k, d=d, ws=ws, yp=yp, zp=zp, eps=float(eps),
            zero_guard=zero_guard,
        ),
        grid=(d,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (k, 3, 1, d, d), lambda i: (0, 0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((k, 3, d, d, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(w1**3) * k * k * d * d * d * 12,
            bytes_accessed=int(d) * (k * 4 * w1 * (d + 2 * ws) ** 2) * 4,
            transcendentals=int(w1**3) * k * k * d * d * d,
        ),
        interpret=interpret,
    )(tiles_pad)
