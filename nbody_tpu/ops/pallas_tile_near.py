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


def _near_kernel(tiles_hbm, acc_ref, *, k, ws, zp, c, m, eps, zero_guard,
                 cutoff2):
    """One (x-plane, lane-chunk) program.

    tiles_hbm: (D+2ws, 4, K, Lp) ANY — x-padded planes, lanes = flattened
               padded (y, z) with an M-lane margin at both ends
    acc_ref:   (1, 3, K, C) VMEM — this chunk's per-slot accelerations
    """
    w1 = 2 * ws + 1
    eps2 = eps * eps
    i = pl.program_id(0)
    j = pl.program_id(1)

    # Slot rows are rank-ordered by construction (a particle gets slot
    # `rank within cell`), so the k axis splits into GROUPS of 8 rows
    # with monotone liveness: group g of a window is all-zero-mass unless
    # some cell in it holds more than 8g particles. At mean occupancy ~4
    # the tail groups (slots 8+) are live only in the dense core — the
    # sweep's k² cost then tracks the LIVE occupancy, not the slot cap.
    # Group 0 needs no guard inside a live chunk: rank-0 rows are
    # populated wherever ANY particle is. Granularity matters: a per-ROW
    # skip (one branch per 9 vector steps) measured 2.4–3.5× SLOWER than
    # no skip at all — branches break Mosaic's software pipelining, so
    # they must guard big straight-line blocks (27·8·GT steps here).
    kg = 8
    ng = -(-k // kg)

    def _sweep_rows(slab, rows, tx, ty, tz, ax, ay, az):
        """Accumulate all (2ws+1)³ offsets of source slot rows ``rows``
        against the (GT, C) target block; each step broadcasts ONE source
        row (1, C) and fma-accumulates — no cross-sublane reductions."""
        for xo in range(w1):
            for yo in range(-ws, ws + 1):
                for zo in range(-ws, ws + 1):
                    off = m + yo * zp + zo
                    for ks in rows:
                        sx = slab[xo, 0, ks, off:off + c]  # (C,)
                        sy = slab[xo, 1, ks, off:off + c]
                        sz = slab[xo, 2, ks, off:off + c]
                        sm = slab[xo, 3, ks, off:off + c]
                        dx = sx[None] - tx         # (GT, C)
                        dy = sy[None] - ty
                        dz = sz[None] - tz
                        r2 = dx * dx + dy * dy + dz * dz
                        inv = jax.lax.rsqrt(r2 + eps2)
                        w = sm[None] * (inv * inv * inv)
                        if cutoff2 is not None:
                            # hash predicate: RAW r² vs cutoff², BEFORE
                            # softening is added (reference:
                            # force_spatial_hash.cu:120-139)
                            w = jnp.where(r2 <= cutoff2, w, 0.0)
                        if zero_guard:
                            w = jnp.where(r2 == 0.0, 0.0, w)
                        ax = ax + w * dx
                        ay = ay + w * dy
                        az = az + w * dz
        return ax, ay, az

    def inner(slab, tailx, taily, tailz, sem):
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
            # Tail-source liveness over the FULL slab window (any plane,
            # any margin lane that an offset can reach) — one scalar per
            # tail group, hoisted out of the target loop.
            tail_any = [
                jnp.sum(slab[:, 3, g * kg:(g + 1) * kg, :])
                for g in range(1, ng)
            ]

            for tg in range(ng):
                r0, r1 = tg * kg, min((tg + 1) * kg, k)
                gt = r1 - r0
                # Target rows: central x-plane, unshifted lanes.
                tx = slab[ws, 0, r0:r1, m:m + c]            # (GT, C)
                ty = slab[ws, 1, r0:r1, m:m + c]
                tz = slab[ws, 2, r0:r1, m:m + c]
                tg_any = (
                    t_any if ng == 1
                    else jnp.sum(slab[ws, 3, r0:r1, m:m + c])
                )

                @pl.when(tg_any == 0.0)
                def _dead_targets(r0=r0, gt=gt):
                    acc_ref[0, :, r0:r0 + gt] = jnp.zeros(
                        (3, gt, c), jnp.float32)

                @pl.when(tg_any != 0.0)
                def _live_targets(tg=tg, r0=r0, gt=gt,
                                  tx=tx, ty=ty, tz=tz):
                    # Head sources (slots 0..7): always live here, pure
                    # register accumulation, branch-free.
                    z = jnp.zeros((gt, c), jnp.float32)
                    ax, ay, az = _sweep_rows(
                        slab, range(0, min(kg, k)), tx, ty, tz, z, z, z)

                    # Tail sources: one branch per group of 8 rows; the
                    # dead branch writes zeros so the unconditional add
                    # below is correct either way.
                    for sg in range(1, ng):
                        s0, s1 = sg * kg, min((sg + 1) * kg, k)

                        @pl.when(tail_any[sg - 1] == 0.0)
                        def _dead_tail():
                            tailx[0:gt] = jnp.zeros((gt, c), jnp.float32)
                            taily[0:gt] = jnp.zeros((gt, c), jnp.float32)
                            tailz[0:gt] = jnp.zeros((gt, c), jnp.float32)

                        @pl.when(tail_any[sg - 1] != 0.0)
                        def _live_tail(s0=s0, s1=s1, gt=gt,
                                       tx=tx, ty=ty, tz=tz):
                            z = jnp.zeros((gt, c), jnp.float32)
                            bx, by, bz = _sweep_rows(
                                slab, range(s0, s1), tx, ty, tz, z, z, z)
                            tailx[0:gt] = bx
                            taily[0:gt] = by
                            tailz[0:gt] = bz

                        if ng > 1:
                            ax = ax + tailx[0:gt]
                            ay = ay + taily[0:gt]
                            az = az + tailz[0:gt]

                    acc_ref[0, 0, r0:r0 + gt] = ax
                    acc_ref[0, 1, r0:r0 + gt] = ay
                    acc_ref[0, 2, r0:r0 + gt] = az

    scratch_rows = kg if ng > 1 else 1  # unused at ng == 1; keep tiny
    pl.run_scoped(
        inner,
        slab=pltpu.VMEM((w1, 4, k, c + 2 * m), jnp.float32),
        tailx=pltpu.VMEM((scratch_rows, c), jnp.float32),
        taily=pltpu.VMEM((scratch_rows, c), jnp.float32),
        tailz=pltpu.VMEM((scratch_rows, c), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "d", "ws", "eps", "chunk", "cutoff2", "pre_transposed",
        "raw_output", "interpret",
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
    cutoff2: float | None = None,
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
            cutoff2=None if cutoff2 is None else float(cutoff2),
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
