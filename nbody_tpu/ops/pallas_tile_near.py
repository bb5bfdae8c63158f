"""Pallas TPU kernel for the dense cell-tile near-field sweep.

Drop-in accelerator for the hot loop of nbody_tpu/ops/tile_sweep.py — the
exact near-field pair sum of the Barnes-Hut pipeline (the analogue of the
reference's traversal near-misses, force_barnes_hut.cu:130-201). The XLA
formulation streams every (K, cells) intermediate through HBM (measured
210 ms at 1M/L6/k16); this kernel keeps the working set in VMEM and sweeps
all (2ws+1)³ neighbor offsets with STATIC lane shifts.

v4 layout — each earlier version taught a Mosaic constraint the hard way:
  v1/v2: dynamic sublane/lane offsets → rejected or catastrophically slow.
  v3: x-plane programs with the full flattened (y, z) plane on lanes
      (4608 lanes = 36 vregs/operand) → the register allocator spilled
      295 MB; and a 3D (K_t, K_s, L) broadcast formulation before that
      compiled > 30 min server-side.

  * tiles rearranged to (X + 2ws, 4, K, Lp): x-planes lead, channels
    (x,y,z,m) next, slot axis K on sublanes, and the (y, z) plane
    FLATTENED onto lanes with halo pads so a neighbor offset (dy, dz) is
    a STATIC lane shift of dy·Zp + dz.
  * 2D grid (x-plane, lane-chunk): each program DMAs a (2ws+1, 4, K,
    C + 2M) slab window — C target lanes plus M = round_up(ws·Zp+ws, 128)
    shift margin per side (the lane axis is M-padded so every window is
    in bounds and 128-aligned) — and evaluates all (2ws+1)³ offsets ×
    K_t target rows as 2D (K_s, C) VPU blocks, the native vreg tiling.
    Narrow operands (C=512 → 4 vregs) keep register pressure low.
  * empty slots carry mass 0 at their cell center and are inert;
    coincident/self pairs need masking only at ε = 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _near_kernel(tiles_hbm, acc_ref, *, k, ws, zp, c, m, eps, zero_guard):
    """One (x-plane, lane-chunk) program.

    tiles_hbm: (D+2ws, 4, K, Lp) ANY — x-padded planes, lanes = flattened
               padded (y, z) with an M-lane margin at both ends
    acc_ref:   (1, 3, K, C) VMEM — this chunk's per-slot accelerations
    """
    w1 = 2 * ws + 1
    eps2 = eps * eps
    i = pl.program_id(0)
    j = pl.program_id(1)

    def inner(slab, sem):
        cp = pltpu.make_async_copy(
            tiles_hbm.at[pl.ds(i, w1), :, :, pl.ds(j * c, c + 2 * m)],
            slab,
            sem,
        )
        cp.start()
        cp.wait()

        # Geometric occupancy skip (masses are non-negative; a zero-mass
        # source contributes exact zeros, so skipping is numerically
        # identical): chunks whose TARGET lanes hold no real particle —
        # ~45% of chunks on the default spherical scene lie outside the
        # ball — write zeros and do no work. Inert-slot accelerations
        # become 0 instead of filler-center values; the pickup only
        # gathers real rows.
        t_any = jnp.sum(slab[ws, 3, :, m:m + c])

        @pl.when(t_any == 0.0)
        def _empty_chunk():
            acc_ref[0] = jnp.zeros((3, k, c), jnp.float32)

        @pl.when(t_any != 0.0)
        def _live_chunk():
            # Target rows: central x-plane, unshifted lanes.
            tx = slab[ws, 0, :, m:m + c]            # (K, C)
            ty = slab[ws, 1, :, m:m + c]
            tz = slab[ws, 2, :, m:m + c]

            # Source-broadcast accumulation: each (offset, source-slot)
            # step broadcasts ONE source row (1, C) against the whole
            # (K, C) target block and fma-accumulates — no cross-sublane
            # reductions, no stacks, accumulators live across the sweep
            # (3 × (K, C) vregs; chunk C is sized to keep the working
            # set within the register budget).
            ax = jnp.zeros((k, c), jnp.float32)
            ay = jnp.zeros((k, c), jnp.float32)
            az = jnp.zeros((k, c), jnp.float32)
            for xo in range(w1):
                for yo in range(-ws, ws + 1):
                    for zo in range(-ws, ws + 1):
                        off = m + yo * zp + zo
                        for ks in range(k):
                            sx = slab[xo, 0, ks, off:off + c]  # (C,)
                            sy = slab[xo, 1, ks, off:off + c]
                            sz = slab[xo, 2, ks, off:off + c]
                            sm = slab[xo, 3, ks, off:off + c]
                            dx = sx[None] - tx         # (K, C)
                            dy = sy[None] - ty
                            dz = sz[None] - tz
                            r2 = dx * dx + dy * dy + dz * dz
                            inv = jax.lax.rsqrt(r2 + eps2)
                            w = sm[None] * (inv * inv * inv)
                            if zero_guard:
                                w = jnp.where(r2 == 0.0, 0.0, w)
                            ax = ax + w * dx
                            ay = ay + w * dy
                            az = az + w * dz
            acc_ref[0] = jnp.stack([ax, ay, az])  # (3, K, C)

    pl.run_scoped(
        inner,
        slab=pltpu.VMEM((w1, 4, k, c + 2 * m), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "d", "ws", "eps", "chunk", "pre_transposed", "raw_output",
        "interpret",
    ),
)
def tile_sweep_pallas(
    tiles_t: jax.Array,
    *,
    k: int,
    d: int,
    ws: int,
    eps: float,
    chunk: int = 512,
    pre_transposed: bool = False,
    raw_output: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """(K, 4, D, D, D) slot tensor → (K, 3, D, D, D) per-slot accelerations.

    Input layout matches tile_sweep.py's transposed tiles (slots leading,
    cells on lanes); with ``pre_transposed=True`` the input is already in
    the kernel's plane-major (D, 4, K, D, D) layout (the producer emits
    it via an MXU eye-einsum — XLA's native 5-D transpose of these 67 MB
    runs at ~1.7 GB/s). Returns un-scaled accelerations (multiply by G).
    """
    w1 = 2 * ws + 1
    yp = d + 2 * ws
    zp = d + 2 * ws
    l = yp * zp
    p2 = ws * zp + ws  # max |lane shift| for any (dy, dz) offset
    c = chunk
    m = _round_up(p2, 128)
    nc = -(-l // c)
    lpad = m + nc * c + m

    # (K, 4, D, D, D) → (x, ch, slot, y, z) → (D+2ws, 4, K, Lp)
    if pre_transposed:
        t = tiles_t  # already (D_x, 4, K, D_y, D_z)
    else:
        t = tiles_t.transpose(2, 1, 0, 3, 4)  # (D_x, 4, K, D_y, D_z)
    t = jnp.pad(
        t, [(ws, ws), (0, 0), (0, 0), (ws, ws), (ws, ws)]
    )  # (D+2ws, 4, K, Yp, Zp)
    t = t.reshape(d + 2 * ws, 4, k, l)
    t = jnp.pad(t, [(0, 0), (0, 0), (0, 0), (m, lpad - l - 2 * m + m)])

    zero_guard = eps == 0.0
    out = pl.pallas_call(
        functools.partial(
            _near_kernel, k=k, ws=ws, zp=zp, c=c, m=m, eps=float(eps),
            zero_guard=zero_guard,
        ),
        grid=(d, nc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 3, k, c), lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, 3, k, nc * c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(w1**3) * k * k * d * nc * c * 12,
            bytes_accessed=int(d) * nc * (w1 * 4 * k * (c + 2 * m)
                                          + 3 * k * c) * 4,
            transcendentals=int(w1**3) * k * k * d * nc * c,
        ),
        interpret=interpret,
    )(t)
    if raw_output:
        # Native (D, 3, K, NC·C) layout — lane (y+ws)·zp + (z+ws) for
        # real cell (y, z). Consumers gather per-channel directly and
        # skip TWO XLA 5-D transposes (~1.7 GB/s each on 150-200 MB).
        return out
    # (D, 3, K, NC·C) → (K, 3, D, D, D): strip chunk padding + halo pads.
    out = out[:, :, :, :l].reshape(d, 3, k, yp, zp)
    out = out[:, :, :, ws:ws + d, ws:ws + d]
    return out.transpose(2, 1, 0, 3, 4)
