"""Pallas TPU kernel for the dense cell-tile near-field sweep.

Drop-in accelerator for the hot loop of nbody_tpu/ops/tile_sweep.py — the
exact near-field pair sum of the Barnes-Hut pipeline (the analogue of the
reference's traversal near-misses, force_barnes_hut.cu:130-201). The XLA
formulation streams every (K, cells) intermediate through HBM and runs at
~0.2 T elementwise-ops/s (measured 210 ms at 1M/L6/k16); this kernel keeps
one x-slab of the tile grid in VMEM and sweeps all (2ws+1)³ neighbor
offsets with STATIC lane shifts.

v3 layout (two earlier versions died on Mosaic's dynamic-sublane loads):

  * tiles rearranged to (X + 2ws, 4, K, Lp): x-planes lead (DMA'd with a
    dynamic LEADING index — the one dynamic offset Mosaic likes), channels
    (x,y,z,m) next, slot axis K on sublanes, and the (y, z) plane FLATTENED
    onto lanes with halo pads, so that the neighbor offset (dy, dz) is a
    STATIC lane shift of dy·Zp + dz.
  * one program per x-plane: DMA the (2ws+1)-plane slab, then for each of
    the (2ws+1)³ offsets evaluate all K_t × K_s slot pairs as ONE
    broadcasted (K, K, L) VPU block — empty slots carry mass 0 and sit at
    their cell center, so they are inert.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _near_kernel(tiles_hbm, acc_ref, *, k, d, ws, zp, l, p2, lpad, eps,
                 zero_guard):
    """One x-plane program.

    tiles_hbm: (D+2ws, 4, K, Lp) ANY — x-padded planes, lanes = flattened
               padded (y, z) with an extra ±P2 shift margin
    acc_ref:   (1, 3, K, Lp) VMEM — this plane's per-slot accelerations
    """
    w1 = 2 * ws + 1
    eps2 = eps * eps
    i = pl.program_id(0)

    def inner(slab, sem):
        cp = pltpu.make_async_copy(tiles_hbm.at[pl.ds(i, w1)], slab, sem)
        cp.start()
        cp.wait()

        # Target rows: central x-plane, unshifted lanes.
        tx = slab[ws, 0, :, p2:p2 + l]          # (K, L)
        ty = slab[ws, 1, :, p2:p2 + l]
        tz = slab[ws, 2, :, p2:p2 + l]

        # Mosaic-friendly shape discipline: every op below is a 2D
        # (K_s sublanes, L lanes) block — the native vreg tiling. A 3D
        # (K_t, K_s, L) broadcast formulation compiled >30 min server-side
        # (register-allocating the K_t×K_s cross product); this unrolled
        # K_t loop emits ~w1³·k small 2D blocks instead and the source
        # slices (per offset) are reused across all k target rows.
        accs = [jnp.zeros((3, l), jnp.float32) for _ in range(k)]
        for xo in range(w1):
            for yo in range(-ws, ws + 1):
                for zo in range(-ws, ws + 1):
                    off = p2 + yo * zp + zo
                    sx = slab[xo, 0, :, off:off + l]   # (K_s, L)
                    sy = slab[xo, 1, :, off:off + l]
                    sz = slab[xo, 2, :, off:off + l]
                    sm = slab[xo, 3, :, off:off + l]
                    for kt in range(k):
                        dx = sx - tx[kt][None]         # (K_s, L)
                        dy = sy - ty[kt][None]
                        dz = sz - tz[kt][None]
                        r2 = dx * dx + dy * dy + dz * dz
                        inv = jax.lax.rsqrt(r2 + eps2)
                        w = sm * (inv * inv * inv)
                        if zero_guard:
                            w = jnp.where(r2 == 0.0, 0.0, w)
                        accs[kt] = accs[kt] + jnp.stack(
                            [
                                jnp.sum(w * dx, axis=0),
                                jnp.sum(w * dy, axis=0),
                                jnp.sum(w * dz, axis=0),
                            ]
                        )
        acc = jnp.stack(accs, axis=1)  # (3, K, L)
        acc_ref[0] = jnp.zeros((3, k, lpad), jnp.float32)
        acc_ref[0, :, :, p2:p2 + l] = acc

    w1 = 2 * ws + 1
    pl.run_scoped(
        inner,
        slab=pltpu.VMEM((w1, 4, k, lpad), jnp.float32),
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
    yp = d + 2 * ws
    zp = d + 2 * ws
    l = yp * zp
    p2 = ws * zp + ws  # max |lane shift| for any (dy, dz) offset
    lpad = _round_up(l + 2 * p2, 128)

    # (K, 4, D, D, D) → (x, ch, slot, y, z) → (D+2ws, 4, K, Lp)
    t = tiles_t.transpose(2, 1, 0, 3, 4)  # (D_x, 4, K, D_y, D_z)
    t = jnp.pad(
        t, [(ws, ws), (0, 0), (0, 0), (ws, ws), (ws, ws)]
    )  # (D+2ws, 4, K, Yp, Zp)
    t = t.reshape(d + 2 * ws, 4, k, l)
    t = jnp.pad(t, [(0, 0), (0, 0), (0, 0), (p2, lpad - l - 2 * p2 + p2)])

    zero_guard = eps == 0.0
    out = pl.pallas_call(
        functools.partial(
            _near_kernel, k=k, d=d, ws=ws, zp=zp, l=l, p2=p2, lpad=lpad,
            eps=float(eps), zero_guard=zero_guard,
        ),
        grid=(d,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 3, k, lpad), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, 3, k, lpad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(w1**3) * k * k * d * l * 12,
            bytes_accessed=int(d) * (w1 * 4 * k * lpad + 3 * k * lpad) * 4,
            transcendentals=int(w1**3) * k * k * d * l,
        ),
        interpret=interpret,
    )(t)
    # (D, 3, K, Lp) → (K, 3, D, D, D): strip the shift margin + halo pads.
    out = out[:, :, :, p2:p2 + l].reshape(d, 3, k, yp, zp)
    out = out[:, :, :, ws:ws + d, ws:ws + d]
    return out.transpose(2, 1, 0, 3, 4)
