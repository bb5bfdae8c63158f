"""Pallas TPU bitonic argsort — experimental/benchmark kernel.

STATUS: NOT on the library hot path. The r1 motivation (XLA argsort
"~90 ms at 1M") turned out to be a benchmarking artifact — with a proper
warm-up readback the clean number is ~4 ms (CLAUDE.md, r2 re-measurement),
so `build_sorted_grid` keeps `jnp.argsort` and this kernel remains as a
measured prototype of dense compare-exchange sorting on the VPU (useful if
a future fused build wants the sort INSIDE a kernel pipeline).

The reference pays ~1 ms for the same step on an RTX 3080 via Thrust's
radix sort (reference: src/cuda/force_barnes_hut.cu:276-280 and the
counting-sort pipeline in force_spatial_hash.cu:52-80). TPUs have no
scatter hardware, so radix scatters are out; what TPUs DO have is a very
wide VPU and ~16 MB of VMEM — enough to hold whole (key, val) blocks and
run a classic BITONIC NETWORK as dense compare-exchange passes with zero
HBM traffic in between.

Layout: element i of a 2^18-element block lives at (row, lane) =
(i & (R−1), i >> rbits) of an (R=2048, 128) int32 array — LOW index bits on
rows — and every XOR-partner exchange is two `pltpu.roll`s (axis 0 for row
bits, axis 1 for lane bits) plus a parity select: no reshapes, no gathers.
Blocks are block-major, so cross-block passes (j ≥ 18) compare equal
(row, lane) positions of two VMEM-resident blocks — purely elementwise.

Not stable (equal keys keep an arbitrary relative order) — the sorted-grid
consumers only need cell GROUPING, with any injective rank within a cell.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Elements per block: (2048 rows × 128 lanes) = 2^18 × 4 B = 1 MB per array.
_BLOCK_LOG2 = 18
_LANE_LOG2 = 7  # 128 lanes
_INT_MAX = jnp.iinfo(jnp.int32).max


def _cmp_exchange(ak, av, bk, bv, desc):
    """Compare-exchange (a, b): a keeps lo, b keeps hi when ascending."""
    # No where() on boolean operands — Mosaic can't select between i1s.
    swap = jnp.logical_or(
        jnp.logical_and(desc, ak < bk),
        jnp.logical_and(jnp.logical_not(desc), ak > bk),
    )
    nak = jnp.where(swap, bk, ak)
    nbk = jnp.where(swap, ak, bk)
    nav = jnp.where(swap, bv, av)
    nbv = jnp.where(swap, av, bv)
    return nak, nav, nbk, nbv


def _desc_mask(shape, k, rbits, desc_extra):
    """Direction bit k of the element index as a boolean (R, 128) mask."""
    if k < rbits:
        ri = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        return ((ri >> k) & 1) == 1
    if k < rbits + _LANE_LOG2:
        li = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return ((li >> (k - rbits)) & 1) == 1
    return jnp.broadcast_to(desc_extra == 1, shape)


def _xor_pass(keys, vals, j, k, rbits, desc_extra):
    """One bitonic pass: partner = i ^ 2^j, direction = bit k of i.

    Row bits (j < rbits) exchange along axis 0, lane bits along axis 1 —
    both as two circular rolls + a parity select (the wrong-direction roll
    is masked out, so the wrap-around never escapes).
    """
    shape = keys.shape
    if j < rbits:
        axis, t, bit = 0, 1 << j, j
    else:
        axis, t, bit = 1, 1 << (j - rbits), j - rbits
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    hi_side = ((idx >> bit) & 1) == 1  # elements whose partner is BELOW

    size = shape[axis]
    up = (size - t) % size  # roll "up" = negative shift (partner above)
    pk = jnp.where(hi_side,
                   pltpu.roll(keys, shift=t, axis=axis),
                   pltpu.roll(keys, shift=up, axis=axis))
    pv = jnp.where(hi_side,
                   pltpu.roll(vals, shift=t, axis=axis),
                   pltpu.roll(vals, shift=up, axis=axis))

    desc = _desc_mask(shape, k, rbits, desc_extra)
    # lo side keeps min when ascending; flips with desc / hi side.
    want_max = jnp.logical_xor(hi_side, desc)
    take = jnp.logical_or(
        jnp.logical_and(want_max, pk > keys),
        jnp.logical_and(jnp.logical_not(want_max), pk < keys),
    )
    return jnp.where(take, pk, keys), jnp.where(take, pv, vals)


def _local_sort_kernel(k_ref, v_ref, ko_ref, vo_ref, *, rbits, m_local,
                       alt_blocks):
    """Full bitonic sort of one block (stages 1..m_local).

    alt_blocks: multi-block runs sort odd program ids DESCENDING at the
    final local stage (= direction bit m_local of the global index).
    """
    # Round-trip through the output refs each pass: carrying the whole
    # network as SSA dataflow makes Mosaic's register allocator keep every
    # pass live (measured 147 MB of spill slots at 2^18 elements).
    ko_ref[0] = k_ref[0]
    vo_ref[0] = v_ref[0]
    zero = jnp.zeros((), jnp.int32)
    desc_last = (pl.program_id(0) & 1) if alt_blocks else zero
    for k in range(1, m_local + 1):
        de = desc_last if k == m_local else zero
        for j in range(k - 1, -1, -1):
            keys, vals = _xor_pass(ko_ref[0], vo_ref[0], j, k, rbits, de)
            ko_ref[0] = keys
            vo_ref[0] = vals


def _cross_pass_kernel(ka_ref, va_ref, kb_ref, vb_ref,
                       kao_ref, vao_ref, kbo_ref, vbo_ref, *, k, j):
    """One cross-block pass: partner blocks, elementwise compare-exchange.

    Direction = bit (k − _BLOCK_LOG2) of the LOW block index.
    """
    p = pl.program_id(0)
    bd = 1 << (j - _BLOCK_LOG2)
    b0 = (p // bd) * 2 * bd + p % bd
    desc = ((b0 >> (k - _BLOCK_LOG2)) & 1) == 1
    nak, nav, nbk, nbv = _cmp_exchange(
        ka_ref[0], va_ref[0], kb_ref[0], vb_ref[0], desc)
    kao_ref[0] = nak
    vao_ref[0] = nav
    kbo_ref[0] = nbk
    vbo_ref[0] = nbv


def _merge_block_kernel(k_ref, v_ref, ko_ref, vo_ref, *, rbits, k):
    """Within-block merge: passes j = _BLOCK_LOG2−1 .. 0 of stage k."""
    b = pl.program_id(0)
    desc = (b >> (k - _BLOCK_LOG2)) & 1
    ko_ref[0] = k_ref[0]
    vo_ref[0] = v_ref[0]
    for j in range(_BLOCK_LOG2 - 1, -1, -1):
        keys, vals = _xor_pass(ko_ref[0], vo_ref[0], j, k, rbits, desc)
        ko_ref[0] = keys
        vo_ref[0] = vals


def _to_blocks(x, nb, r):
    """(N,) element order (block-major, lanes-high) → (nb, R, 128)."""
    return x.reshape(nb, 128, r).transpose(0, 2, 1)


def _from_blocks(x):
    nb, r, _ = x.shape
    return x.transpose(0, 2, 1).reshape(nb * r * 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_pairs(keys, vals, *, interpret: bool = False):
    """Sort int32 (keys, vals) pairs by key, ascending. Returns (k, v).

    N is padded to the next power of two (min 1024) with INT_MAX keys.
    Not stable. For N < 1024 or non-TPU backends callers should prefer
    jnp.argsort — this path still works but wins nothing.
    """
    n = keys.shape[0]
    m = max(10, (n - 1).bit_length())
    n_pad = 1 << m
    keys = jnp.pad(keys.astype(jnp.int32), (0, n_pad - n),
                   constant_values=_INT_MAX)
    vals = jnp.pad(vals.astype(jnp.int32), (0, n_pad - n))

    m_local = min(m, _BLOCK_LOG2)
    rbits = m_local - _LANE_LOG2
    r = 1 << rbits
    nb = n_pad >> m_local

    kb = _to_blocks(keys, nb, r)
    vb = _to_blocks(vals, nb, r)

    blk = pl.BlockSpec((1, r, 128), lambda p: (p, 0, 0),
                       memory_space=pltpu.VMEM)
    shp = [jax.ShapeDtypeStruct(kb.shape, jnp.int32)] * 2

    kb, vb = pl.pallas_call(
        functools.partial(_local_sort_kernel, rbits=rbits, m_local=m_local,
                          alt_blocks=nb > 1),
        grid=(nb,),
        in_specs=[blk, blk],
        out_specs=[blk, blk],
        out_shape=shp,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(kb, vb)

    # Stages above the block size: cross-block passes then in-block merges.
    for k in range(_BLOCK_LOG2 + 1, m + 1):
        for j in range(k - 1, _BLOCK_LOG2 - 1, -1):
            bd = 1 << (j - _BLOCK_LOG2)

            def lo_map(p, bd=bd):
                return ((p // bd) * 2 * bd + p % bd, 0, 0)

            def hi_map(p, bd=bd):
                return ((p // bd) * 2 * bd + p % bd + bd, 0, 0)

            lo = pl.BlockSpec((1, r, 128), lo_map, memory_space=pltpu.VMEM)
            hi = pl.BlockSpec((1, r, 128), hi_map, memory_space=pltpu.VMEM)
            klo, vlo, khi, vhi = pl.pallas_call(
                functools.partial(_cross_pass_kernel, k=k, j=j),
                grid=(nb // 2,),
                in_specs=[lo, lo, hi, hi],
                out_specs=[lo, lo, hi, hi],
                out_shape=shp + shp,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
                interpret=interpret,
            )(kb, vb, kb, vb)
            # lo/hi outputs each cover disjoint block sets of the same
            # logical array; stitch by block parity group.
            sel = (jnp.arange(nb) // bd) % 2 == 0
            kb = jnp.where(sel[:, None, None], klo, khi)
            vb = jnp.where(sel[:, None, None], vlo, vhi)
        kb, vb = pl.pallas_call(
            functools.partial(_merge_block_kernel, rbits=rbits, k=k),
            grid=(nb,),
            in_specs=[blk, blk],
            out_specs=[blk, blk],
            out_shape=shp,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(kb, vb)

    keys_s = _from_blocks(kb)[:n]
    vals_s = _from_blocks(vb)[:n]
    return keys_s, vals_s


def bitonic_argsort(keys, *, interpret: bool = False):
    """argsort for int32 keys via the Pallas bitonic network.

    Returns (sorted_keys, perm) with keys[perm] == sorted_keys.
    """
    n = keys.shape[0]
    vals = jnp.arange(n, dtype=jnp.int32)
    return bitonic_sort_pairs(keys, vals, interpret=interpret)
