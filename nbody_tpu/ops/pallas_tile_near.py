"""Pallas TPU kernel for the dense cell-tile near-field sweep.

Drop-in accelerator for the hot loop of nbody_tpu/ops/tile_sweep.py — the
exact near-field pair sum of the Barnes-Hut pipeline (the analogue of the
reference's traversal near-misses, force_barnes_hut.cu:130-201). The XLA
formulation streams every (K, cells) intermediate through HBM (measured
210 ms at 1M/L6/k16); this kernel keeps the working set in VMEM and sweeps
all (2ws+1)³ neighbor offsets with STATIC lane shifts.

v5 layout — raw flattened lanes, boundary masks in-kernel:
  * input is PLANE-MAJOR (D, 4, K, D²): x-planes lead, channels (x,y,z,m)
    next, slot axis K on sublanes, and the (y, z) plane flattened onto
    lanes RAW — no interleaved halo pads. This is one cheap transpose away
    from the scatter kernel's chunk-blocked output (256-byte contiguous
    runs), where the old halo-padded layout cost ~22 ms/step of XLA
    transpose+pad passes at 1M (scripts/profile_r3h.py bisections).
  * a neighbor offset (dy, dz) is a STATIC lane shift of dy·D + dz. In
    flattened (y, z) lanes the y-halo is FREE: a y out of [0, D) shifts
    the lane out of the data region into the zero margins, so only the
    z-boundary wrap (z + dz outside [0, D) drags y by ±1) needs masking —
    2·ws masks of (1, C) per program, multiplied into the source mass.
  * 2D grid (x-plane, lane-chunk): each program DMAs a (2ws+1, 4, K,
    C + 2M) slab window — C target lanes plus M = round_up(ws·D+ws, 128)
    shift margin per side — and evaluates all (2ws+1)³ offsets × K_t
    target rows as 2D (K_s, C) VPU blocks, the native vreg tiling.
    Narrow operands (C=512 → 4 vregs) keep register pressure low.
  * empty slots carry mass 0 at their cell center and are inert;
    coincident/self pairs need masking only at ε = 0.

(v4 and earlier used pre-padded (y, z) halos; each version taught a Mosaic
constraint: dynamic sublane/lane offsets are rejected or catastrophically
slow, full-width operands spill — see git history for the archaeology.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rowmajor_perm3(k: int):
    """(3·3k, 8k) bf16 permutation for the in-kernel layout flip: maps
    accumulator row ch·k + slot → output column slot·8 + ch, stacked ×3
    vertically so a 3-way bf16-split lhs reassembles the f32 value in ONE
    MXU pass (see pallas_scatter._split3_dot — each output element sums
    exactly the 3 split terms of its single source row, so the flip is
    BIT-EXACT). Built from iotas (Pallas kernels cannot capture array
    constants).

    The 8-lane slot stride (not 3) makes the flat output a width-8
    row-major array — the pickup gathers (cell·k + slot) rows of width 8
    and keeps columns 0..2, with NO strided slice of the full array
    first (a (…, 128)[:, :, :3k] slice-copy measured ~26 ms at 1M —
    XLA's narrow strided copies run at ~2 GB/s)."""
    r_iota = jax.lax.broadcasted_iota(
        jnp.int32, (9 * k, 8 * k), 0
    ) % (3 * k)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (9 * k, 8 * k), 1)
    ch = r_iota // k
    s = r_iota % k
    return (col_iota == s * 8 + ch).astype(jnp.bfloat16)


def _near_kernel(*refs, k, ws, d, c, m, eps, zero_guard,
                 cutoff2, with_far, row_major):
    """One (x-plane, lane-chunk) program.

    tiles_hbm: (D+2ws, 4, K, Lp) ANY — x-padded planes, lanes = flattened
               RAW (y, z) with an M-lane zero margin at both ends
    acc_ref:   (1, 3, K, C) VMEM — this chunk's per-slot accelerations;
               with ``row_major`` instead (1, C, 128): lanes = slot·8+ch
               (8k used), rows = cells — the pickup gathers width-8 rows
               straight off the flat view, no XLA transpose/slice

    With ``with_far`` two more refs lead: geom (1, 128) VMEM
    [lo_x, lo_y, lo_z, cell] and far (1, 19, C) VMEM — the far-field
    local expansion [A3 | J6 | H10] of this chunk's cells (channel order
    of ops/barnes_hut.far_field_grid). Each live target slot adds
    a_far = A + J·δ + ½(H·δ)·δ at ITS OWN position (δ = slot − center),
    deleting the separate 19-channel per-particle gather + symmetric
    tensor math stage (measured 17.6 ms at 1M, scripts/profile_r3m.py) —
    the per-slot math here rides the already-resident target registers.
    """
    if with_far:
        geom_ref, tiles_hbm, far_ref, acc_ref = refs
    else:
        tiles_hbm, acc_ref = refs
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

    def _sweep_rows(slab, zmasks, rows, tx, ty, tz, ax, ay, az):
        """Accumulate all (2ws+1)³ offsets of source slot rows ``rows``
        against the (GT, C) target block; each step broadcasts ONE source
        row (1, C) and fma-accumulates — no cross-sublane reductions."""
        for xo in range(w1):
            for yo in range(-ws, ws + 1):
                for zo in range(-ws, ws + 1):
                    off = m + yo * d + zo
                    for ks in rows:
                        sx = slab[xo, 0, ks, off:off + c]  # (C,)
                        sy = slab[xo, 1, ks, off:off + c]
                        sz = slab[xo, 2, ks, off:off + c]
                        sm = slab[xo, 3, ks, off:off + c][None]  # (1, C)
                        if zo != 0:
                            # z-boundary wrap guard (see module docstring)
                            sm = sm * zmasks[zo]
                        dx = sx[None] - tx         # (GT, C)
                        dy = sy[None] - ty
                        dz = sz[None] - tz
                        r2 = dx * dx + dy * dy + dz * dz
                        inv = jax.lax.rsqrt(r2 + eps2)
                        w = sm * (inv * inv * inv)
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

    def inner(slab, tailx, taily, tailz, acc48, sem):
        cp = pltpu.make_async_copy(
            tiles_hbm.at[pl.ds(i, w1), :, :, pl.ds(j * c, c + 2 * m)],
            slab,
            sem,
        )
        cp.start()
        cp.wait()

        # z-wrap masks, one per nonzero z offset: a target lane whose
        # z + zo leaves [0, D) would read a REAL particle of the wrong
        # cell ((y±1, z∓(D-1)) — the flattened-lane wrap); zero its mass.
        # y overflow needs no mask: the lane leaves the data region into
        # the zero margins. Computed once per program; 2·ws live vregs.
        lane = j * c + jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        lane_z = lane % d
        zmasks = {
            zo: ((lane_z + zo >= 0) & (lane_z + zo < d)).astype(
                jnp.float32
            )
            for zo in range(-ws, ws + 1)
            if zo != 0
        }

        if with_far:
            # Cell centers of this chunk's lanes (for δ = slot − center).
            lo_x = geom_ref[0, 0]
            lo_y = geom_ref[0, 1]
            lo_z = geom_ref[0, 2]
            cw = geom_ref[0, 3]
            cxs = lo_x + (i.astype(jnp.float32) + 0.5) * cw      # scalar
            cys = lo_y + ((lane // d).astype(jnp.float32) + 0.5) * cw
            czs = lo_z + (lane_z.astype(jnp.float32) + 0.5) * cw  # (1, C)

        def _far_eval(tx, ty, tz):
            """A + J·δ (+ ½(H·δ)·δ for 19-channel order-2 grids) at
            δ = target − center, as (GT, C) blocks. Component orders
            mirror ops/barnes_hut.sym_matvec / sym3_matvec: J6
            [xx,yy,zz,xy,xz,yz], H10 [xxx,yyy,zzz,xxy,xxz,xyy,yyz,xzz,
            yzz,xyz]. Filler slots sit AT the center (δ=0) → exactly A;
            they are never picked up anyway."""
            n_far = far_ref.shape[1]
            dx = tx - cxs                                        # (GT, C)
            dy = ty - cys
            dz = tz - czs
            f = [far_ref[0, ch][None] for ch in range(n_far)]    # (1, C)
            jdx = f[3] * dx + f[6] * dy + f[7] * dz
            jdy = f[6] * dx + f[4] * dy + f[8] * dz
            jdz = f[7] * dx + f[8] * dy + f[5] * dz
            fx = f[0] + jdx
            fy = f[1] + jdy
            fz = f[2] + jdz
            if n_far > 9:
                # hd = (H·δ) in 6-form, then ½·(hd·δ)
                hxx = f[9] * dx + f[12] * dy + f[13] * dz
                hyy = f[14] * dx + f[10] * dy + f[15] * dz
                hzz = f[16] * dx + f[17] * dy + f[11] * dz
                hxy = f[12] * dx + f[14] * dy + f[18] * dz
                hxz = f[13] * dx + f[18] * dy + f[16] * dz
                hyz = f[18] * dx + f[15] * dy + f[17] * dz
                fx = fx + 0.5 * (hxx * dx + hxy * dy + hxz * dz)
                fy = fy + 0.5 * (hxy * dx + hyy * dy + hyz * dz)
                fz = fz + 0.5 * (hxz * dx + hyz * dy + hzz * dz)
            return fx, fy, fz

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
            if row_major:
                acc_ref[0] = jnp.zeros((c, 128), jnp.float32)
            else:
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
                    if row_major:
                        z = jnp.zeros((gt, c), jnp.float32)
                        for ch in range(3):
                            acc48[ch * k + r0:ch * k + r0 + gt] = z
                    else:
                        acc_ref[0, :, r0:r0 + gt] = jnp.zeros(
                            (3, gt, c), jnp.float32)

                @pl.when(tg_any != 0.0)
                def _live_targets(tg=tg, r0=r0, gt=gt,
                                  tx=tx, ty=ty, tz=tz):
                    # Far-field local expansion seeds the accumulator
                    # (per-slot, at the slot's own position) — the near
                    # pair sweep then adds on top and ONE pickup gather
                    # serves both fields.
                    if with_far:
                        ax, ay, az = _far_eval(tx, ty, tz)  # (GT, C)
                    else:
                        z = jnp.zeros((gt, c), jnp.float32)
                        ax, ay, az = z, z, z
                    # Head sources (slots 0..7): always live here, pure
                    # register accumulation, branch-free.
                    ax, ay, az = _sweep_rows(
                        slab, zmasks, range(0, min(kg, k)),
                        tx, ty, tz, ax, ay, az)

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
                                slab, zmasks, range(s0, s1),
                                tx, ty, tz, z, z, z)
                            tailx[0:gt] = bx
                            taily[0:gt] = by
                            tailz[0:gt] = bz

                        if ng > 1:
                            ax = ax + tailx[0:gt]
                            ay = ay + taily[0:gt]
                            az = az + tailz[0:gt]

                    if row_major:
                        acc48[0 * k + r0:0 * k + r0 + gt] = ax
                        acc48[1 * k + r0:1 * k + r0 + gt] = ay
                        acc48[2 * k + r0:2 * k + r0 + gt] = az
                    else:
                        acc_ref[0, 0, r0:r0 + gt] = ax
                        acc_ref[0, 1, r0:r0 + gt] = ay
                        acc_ref[0, 2, r0:r0 + gt] = az

            if row_major:
                # Layout flip to pickup-friendly rows on the MXU: one
                # lhsT-form dot with the stacked split3 permutation is
                # BIT-EXACT (one source row per output element) — the
                # XLA transpose it replaces cost ~3.5 ms/step at 1M.
                x = acc48[...]                                    # (3k, C)
                w0 = x.astype(jnp.bfloat16)
                r1_ = x - w0.astype(jnp.float32)
                w1 = r1_.astype(jnp.bfloat16)
                w2 = (r1_ - w1.astype(jnp.float32)).astype(jnp.bfloat16)
                lhs3 = jnp.concatenate([w0, w1, w2], axis=0)      # (9k, C)
                res = jax.lax.dot_general(
                    lhs3, _rowmajor_perm3(k),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                                 # (C, 8k)
                acc_ref[0, :, 0:8 * k] = res
                if 8 * k < 128:
                    acc_ref[0, :, 8 * k:128] = jnp.zeros(
                        (c, 128 - 8 * k), jnp.float32)

    scratch_rows = kg if ng > 1 else 1  # unused at ng == 1; keep tiny
    acc48_rows = 3 * k if row_major else 1  # unused otherwise; keep tiny
    pl.run_scoped(
        inner,
        slab=pltpu.VMEM((w1, 4, k, c + 2 * m), jnp.float32),
        tailx=pltpu.VMEM((scratch_rows, c), jnp.float32),
        taily=pltpu.VMEM((scratch_rows, c), jnp.float32),
        tailz=pltpu.VMEM((scratch_rows, c), jnp.float32),
        acc48=pltpu.VMEM((acc48_rows, c), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def sweep_lane_geometry(d: int, chunk: int = 512):
    """(c, nc, L) lane-chunk geometry of ``tile_sweep_pallas_plane`` for
    grid dim ``d``: chunk width c, chunk count nc, padded lane count
    L = nc·c ≥ d². The single source of truth shared with table-resident
    stepping (ops/table_step.py), which keeps state in the padded layout
    so frozen-step arithmetic aligns with the sweep output exactly
    (at d = 64, L = d² — no padding at all)."""
    l = d * d
    c = min(chunk, _round_up(l, 128))
    nc = -(-l // c)
    return c, nc, nc * c


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "d", "ws", "eps", "chunk", "cutoff2", "interpret",
        "row_major",
    ),
)
def tile_sweep_pallas_plane(
    tiles_plane: jax.Array,
    *,
    k: int,
    d: int,
    ws: int,
    eps: float,
    chunk: int = 512,
    cutoff2: float | None = None,
    far_plane: jax.Array | None = None,
    lo: jax.Array | None = None,
    cell: jax.Array | None = None,
    interpret: bool = False,
    row_major: bool = False,
) -> jax.Array:
    """(D, 4, K, D²) plane-major slot tensor → (D, 3, K, NC·C) raw
    per-slot accelerations (lane y·D + z for cell (y, z); lanes ≥ D² are
    chunk padding). Returns un-scaled accelerations (multiply by G).

    ``row_major=True`` (requires 8·k ≤ 128) returns (D, NC·C, 128)
    instead: rows = cells, lanes = slot·8 + ch (channels 3..7 of each
    slot zero) — the flat view is a width-8 row-major array whose
    (cell·(128/8) + slot) rows feed the pickup gather directly,
    replacing a ~3.5 ms/1M XLA transpose (and a ~26 ms narrow strided
    slice a 3-lane stride would need) with one exact in-kernel
    permutation matmul per program.

    ``far_plane`` (D, n_far, D²) — per-cell far-field local expansion
    [A3 | J6 (| H10)] in the SAME plane-major lane layout (requires
    ``lo``/``cell`` grid geometry): each live slot seeds its accumulator
    with the expansion evaluated at its own position, so the near pickup
    gather serves BOTH fields and the separate per-particle far pickup
    (gather + symmetric tensor math, 17.6 ms at 1M) disappears.

    This is the production entry point: its input is ONE contiguous-run
    transpose away from the scatter kernel's slot-major chunk output, and
    its raw output feeds the pickup gather with no intermediate halo
    relayouts (the pads below are a single fused XLA copy).
    """
    w1 = 2 * ws + 1
    l = d * d
    c = min(chunk, _round_up(l, 128))
    m = _round_up(ws * d + ws, 128)
    nc = -(-l // c)

    # The input's lane dim may be the raw d² OR already chunk-padded to
    # nc·c (table-resident stepping keeps state in the padded layout so
    # the kick never slices the sweep output, ops/table_step.py) — pad
    # whatever remains.
    lanes_in = tiles_plane.shape[-1]
    if lanes_in not in (l, nc * c):
        raise ValueError(
            f"tiles_plane lane dim {lanes_in} is neither d²={l} nor the "
            f"chunk-padded {nc * c}"
        )
    t = jnp.pad(
        tiles_plane,
        [(ws, ws), (0, 0), (0, 0), (m, m + nc * c - lanes_in)],
    )  # (D+2ws, 4, K, Lp)

    if row_major and 8 * k > 128:
        raise ValueError(f"row_major output needs 8·k ≤ 128, got k={k}")
    with_far = far_plane is not None
    zero_guard = eps == 0.0
    kernel = functools.partial(
        _near_kernel, k=k, ws=ws, d=d, c=c, m=m, eps=float(eps),
        zero_guard=zero_guard,
        cutoff2=None if cutoff2 is None else float(cutoff2),
        with_far=with_far, row_major=row_major,
    )
    if with_far:
        n_far = far_plane.shape[1]
        fp = jnp.pad(
            far_plane.astype(jnp.float32),
            [(0, 0), (0, 0), (0, nc * c - far_plane.shape[-1])],
        )
        geom = jnp.zeros((1, 128), jnp.float32)
        geom = geom.at[0, :3].set(lo.astype(jnp.float32))
        geom = geom.at[0, 3].set(jnp.asarray(cell, jnp.float32))
        in_specs = [
            pl.BlockSpec((1, 128), lambda i, j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, n_far, c), lambda i, j: (i, 0, j)),
        ]
        operands = (geom, t, fp)
        far_bytes = n_far * c * 4
    else:
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        operands = (t,)
        far_bytes = 0
    if row_major:
        out_specs = pl.BlockSpec(
            (1, c, 128), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((d, nc * c, 128), jnp.float32)
    else:
        out_specs = pl.BlockSpec(
            (1, 3, k, c), lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((d, 3, k, nc * c), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(d, nc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(w1**3) * k * k * d * nc * c * 12,
            bytes_accessed=int(d) * nc * (w1 * 4 * k * (c + 2 * m)
                                          + 3 * k * c + far_bytes // 4) * 4,
            transcendentals=int(w1**3) * k * k * d * nc * c,
        ),
        interpret=interpret,
    )(*operands)
    return out


def tile_sweep_pallas(
    tiles_t: jax.Array,
    *,
    k: int,
    d: int,
    ws: int,
    eps: float,
    chunk: int = 512,
    cutoff2: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """(K, 4, D, D, D) slot tensor → (K, 3, D, D, D) per-slot accelerations.

    Convenience wrapper over ``tile_sweep_pallas_plane`` for callers (and
    the interpret-mode equivalence tests) that hold tiles in the
    slot-leading layout; the production path feeds the plane layout
    directly and picks from the raw output (ops/tile_sweep.py).
    """
    t = tiles_t.transpose(2, 1, 0, 3, 4).reshape(d, 4, k, d * d)
    out = tile_sweep_pallas_plane(
        t, k=k, d=d, ws=ws, eps=eps, chunk=chunk, cutoff2=cutoff2,
        interpret=interpret,
    )
    l = d * d
    out = out[:, :, :, :l].reshape(d, 3, k, d, d)
    return out.transpose(2, 1, 0, 3, 4)
