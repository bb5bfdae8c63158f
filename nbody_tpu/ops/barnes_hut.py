"""Barnes-Hut long-range gravity — O(N log N) hierarchical multipole.

TPU-native REDESIGN of the reference's octree Barnes-Hut
(reference: src/cuda/force_barnes_hut.cu, include/nbody/barnes_hut_tree.hpp).
The reference builds a pointer octree on the CPU every step (its own
roadmap flags this as the bottleneck, force_barnes_hut.cu:291-316) and
traverses it with a per-thread depth-256 stack (130-201) — both patterns are
hostile to TPU (no per-lane stacks, pointer chasing defeats the VPU).

Here the octree becomes a **dense multipole grid pyramid** and the stack
traversal becomes **level-synchronous dense window sweeps**:

  1. Build: scatter particles into the finest 2^L-per-axis cell grid
     (monopole: mass M and mass-weighted position S per cell), then form
     coarser levels by 2× reductions — the Morton-order bottom-up pass of
     the reference (force_barnes_hut.cu:438-486) becomes three reshape-sums.
  2. Far field: at each level ℓ, a cell C is accepted for a target cell c
     iff their PARENTS are within the well-separation window (Chebyshev
     distance ≤ ws) but C itself is outside it. This telescopes exactly:
     every source cell is accepted at precisely one level, or lands in the
     finest-level near field. ws = ceil(1/θ) guarantees an effective
     opening angle ≤ θ (cell size / minimum gap ≤ 1/ws).
     The sweep is GATHER-FREE: for each parent-window offset (a lax.scan of
     (2ws+1)³ static offsets), source cells are a dynamic_slice of the
     zero-padded parent-major grid, and all 8×8 child-pair interactions are
     evaluated densely with a static accept mask. Monopoles are evaluated
     from source-cell centers of mass at target-cell centers, accumulated
     into a per-cell far-field acceleration, and upsampled down the pyramid.
  3. Near field (exact): particles sorted by finest cell id (row-major, z
     fastest) — the (2ws+1)² xy-window × z-run neighborhood is (2ws+1)²
     CONTIGUOUS runs of the sorted array; each run contributes up to K
     candidates (static shape), pairwise-summed with the same softened
     force law as the direct kernel.
  4. Particle pickup: far-field acceleration read at the particle's finest
     cell + exact near field.

Approximation contract: monopole-only multipoles, far field evaluated at
cell centers (piecewise-constant within a finest cell). Error is bounded by
the MAC like classic BH; θ→0 (ws→grid) degenerates to the exact direct sum
because everything lands in the exact near field. Like the reference's
stack-overflow fallback (force_barnes_hut.cu:166-171) the near-field K cap
degrades gracefully and is reported via ``overflow`` diagnostics.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

from nbody_tpu.types import SimulationConfig


def theta_to_ws(theta: float, max_ws: int = 16, order: int = 1) -> int:
    """Map the BH opening angle θ to the well-separation width ws.

    Accepted cells have a gap of ≥ ws cells, so the effective opening
    angle s/d ≤ 1/ws ≤ θ. θ ≤ 1/max_ws clamps (cost grows as 1/θ³,
    exactly like classic BH).

    With quadrupole sources (order=2) the error at a given ws drops one
    power of (s/d), so half the separation achieves the same accuracy:
    ws = ceil(1/(2θ)) — measured at the reference scene, ws=1+quadrupole
    is ~2× MORE accurate than ws=2 monopole (the θ=0.5 operating point)
    while sweeping 4.6× fewer windows.
    """
    if theta <= 0:
        return max_ws
    denom = 2.0 if order >= 2 else 1.0
    return max(1, min(max_ws, math.ceil(1.0 / (denom * theta))))


# ---------------------------------------------------------------------------
# Pyramid build (reference: bottom-up COM pass, force_barnes_hut.cu:438-486)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Pyramid:
    """Multipole grids per level: masses[ℓ] is (2^ℓ)³, msums[ℓ] is (2^ℓ)³×3.

    ``lo``/``cell`` define the finest-level geometry: a cube anchored at
    ``lo`` with finest cell edge ``cell`` (equal on all axes).

    ``quads`` (order-2 pyramids only, else empty): per level, the raw
    second moments ABOUT THE CELL CENTER, (2^ℓ)³×6 in the symmetric order
    [xx, yy, zz, xy, xz, yz]. Center-relative storage keeps the f32
    moments well-conditioned (|x−ctr| ~ cell edge, not domain size).
    """

    masses: tuple
    msums: tuple
    lo: jax.Array
    cell: jax.Array
    quads: tuple = ()
    # order-2 only: center-relative dipole moments Σ m·(x − ctr), (2^ℓ)³×3
    srels: tuple = ()


def _outer6(v: jax.Array) -> jax.Array:
    """(…, 3) → (…, 6) symmetric outer product [xx, yy, zz, xy, xz, yz]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([x * x, y * y, z * z, x * y, x * z, y * z], axis=-1)


def pyramid_geometry(lo: jax.Array, hi: jax.Array, levels: int):
    """(lo, cell) of the cube grid enclosing [lo, hi] at 2^levels per axis."""
    d = 1 << levels
    cube = jnp.maximum(jnp.max(hi - lo), 1e-6) * (1.0 + 1e-5)
    return lo, cube / d


def scatter_finest_moments(
    pos: jax.Array,
    mass: jax.Array,
    coords: jax.Array,
    lo: jax.Array,
    cell: jax.Array,
    d: int,
    order: int = 1,
) -> jax.Array:
    """Scatter-add particle moments into the finest grid.

    Returns packed (d, d, d, C) moments: C=10 for order 2
    ([m, m·xr, m·xr⊗xr], xr center-relative), C=4 for order 1
    ([m, m·x] absolute). SPLIT OUT of ``build_pyramid`` so the sharded
    path (parallel/tree.py) can psum-combine per-device partial moments —
    scatter-add commutes with the device sum.
    """
    cid = (coords[:, 0] * d + coords[:, 1]) * d + coords[:, 2]
    if order >= 2:
        # ONE packed (N, 10) scatter-add with LINEAR row indices:
        # [m, m·xr, m·xr⊗xr], xr the center-relative position (wide rows +
        # linear indices amortize the scatter on TPU).
        ctr = lo + (coords.astype(pos.dtype) + 0.5) * cell
        xr = pos - ctr
        vals = jnp.concatenate(
            [mass[:, None], mass[:, None] * xr, mass[:, None] * _outer6(xr)],
            axis=-1,
        )
        return (
            jnp.zeros((d * d * d, 10), pos.dtype)
            .at[cid]
            .add(vals)
            .reshape(d, d, d, 10)
        )
    return (
        jnp.zeros((d * d * d, 4), pos.dtype)
        .at[cid]
        .add(jnp.concatenate([mass[:, None], mass[:, None] * pos], axis=-1))
        .reshape(d, d, d, 4)
    )


def _sorted_finest_moments(
    grid, ids_sorted, lo, cell, d: int, order: int, *, interpret: bool = False
):
    """Finest-level moments from CELL-SORTED rows via the MXU segment-sum
    (ops/pallas_scatter.py) — the TPU fast path: the unsorted
    ``.at[cid].add`` scatter costs ~50 ms at 1M rows, the segment sum a
    few ms. EXACT for any density: chunks denser than one source window
    loop further windows in-kernel (the old lax.cond fallback to the XLA
    scatter cost ~16 ms on EVERY step at 1M — scripts/profile_r3k.py —
    because XLA speculates both branches). Returns packed (d,d,d,C)."""
    psort = grid.psort
    ctr = lo + (grid.csort.astype(psort.dtype) + 0.5) * cell
    m = psort[:, 3:4]
    if order >= 2:
        xr = psort[:, :3] - ctr
        vals = jnp.concatenate([m, m * xr, m * _outer6(xr)], axis=-1)
    else:
        vals = jnp.concatenate([m, m * psort[:, :3]], axis=-1)

    from nbody_tpu.ops.pallas_scatter import monotone_segment_sum

    nc = d * d * d
    r_chunk, w_win = 256, 2560
    n_chunks = -(-nc // r_chunk)
    car = jnp.arange(n_chunks, dtype=jnp.int32)
    # chunk-boundary starts: from the d³ segment index when the grid
    # carries one, else a few thousand searchsorted queries
    # (build_sorted_grid(with_cell_start=False), large grids)
    from nbody_tpu.ops.sorted_window import cell_starts_at

    if grid.cell_start is not None:
        starts = grid.cell_start[jnp.minimum(car * r_chunk, nc)]
        ends = grid.cell_start[jnp.minimum((car + 1) * r_chunk, nc)]
    else:
        starts = cell_starts_at(
            ids_sorted, jnp.minimum(car * r_chunk, nc)
        )
        ends = cell_starts_at(
            ids_sorted, jnp.minimum((car + 1) * r_chunk, nc)
        )
    # nonempty/nwin passed explicitly: the wrapper's fallback recomputes
    # them from a 1M-row cummax envelope (ids_sorted is already monotone
    # with no sentinels — ends > starts is the same predicate for free).
    span = ends - (starts // 128) * 128
    packed_cm = monotone_segment_sum(
        vals, ids_sorted, starts, num_dest=nc, r=r_chunk, w=w_win,
        nonempty=ends > starts,
        nwin=-(-span // w_win), interpret=interpret,
    )
    # (measured: an eye-matmul "transpose" here regressed — XLA's own
    # transpose wins for this shape)
    return packed_cm.T.reshape(d, d, d, vals.shape[1])


def build_pyramid(
    pos: jax.Array, mass: jax.Array, levels: int, order: int = 1
) -> Pyramid:
    """Scatter-add the finest level, then 2× reductions up to the root.

    order=1: monopoles (mass + mass-weighted position).
    order=2: also second moments about cell centers; the level-up pass is
    the parallel-axis translation  q_p = Σ_c [q_c + δ⊗s_c + s_c⊗δ + m_c δ⊗δ]
    with δ = child_center − parent_center = ±(child edge)/2 per axis.
    (The reference's bottom-up COM pass, force_barnes_hut.cu:438-486,
    extended one multipole order.)
    """
    d = 1 << levels
    lo, cell = pyramid_geometry(
        jnp.min(pos, axis=0), jnp.max(pos, axis=0), levels
    )
    coords = jnp.clip(((pos - lo) / cell).astype(jnp.int32), 0, d - 1)
    packed = scatter_finest_moments(pos, mass, coords, lo, cell, d, order)
    return pyramid_from_packed(packed, lo, cell, levels, order)


def pyramid_from_packed(
    packed: jax.Array,
    lo: jax.Array,
    cell: jax.Array,
    levels: int,
    order: int = 1,
) -> Pyramid:
    """Upward pass: packed finest moments → full multipole pyramid."""
    pos_dtype = packed.dtype
    d = 1 << levels
    if order >= 2:
        m_fine = packed[..., 0]
        sr_fine = packed[..., 1:4]  # center-relative Σ m·xr
        q_fine = packed[..., 4:10]
    else:
        m_fine = packed[..., 0]
        s_fine = packed[..., 1:4]

    masses = [m_fine]
    quads = []
    if order >= 2:
        srels = [sr_fine]
        quads = [q_fine]
    else:
        msums = [s_fine]
    for lvl in range(levels):
        dm = masses[-1].shape[0] // 2
        m_c = masses[-1].reshape(dm, 2, dm, 2, dm, 2)
        masses.append(m_c.sum(axis=(1, 3, 5)))
        if order >= 2:
            # δ per octant: child center − parent center = ±(child edge)/2.
            # Child level after `lvl` reductions has edge cell·2^lvl.
            e = cell * (1 << lvl) * 0.5
            par = jnp.asarray([-0.5, 0.5], pos_dtype) * 2.0 * e  # (2,) = ∓e
            dx = par.reshape(1, 2, 1, 1, 1, 1)
            dy = par.reshape(1, 1, 1, 2, 1, 1)
            dz = par.reshape(1, 1, 1, 1, 1, 2)
            s_c = srels[-1].reshape(dm, 2, dm, 2, dm, 2, 3)
            q_c = quads[-1].reshape(dm, 2, dm, 2, dm, 2, 6)
            sx, sy, sz = s_c[..., 0], s_c[..., 1], s_c[..., 2]
            q_p = jnp.stack(
                [
                    q_c[..., 0] + 2 * dx * sx + m_c * dx * dx,
                    q_c[..., 1] + 2 * dy * sy + m_c * dy * dy,
                    q_c[..., 2] + 2 * dz * sz + m_c * dz * dz,
                    q_c[..., 3] + dx * sy + dy * sx + m_c * dx * dy,
                    q_c[..., 4] + dx * sz + dz * sx + m_c * dx * dz,
                    q_c[..., 5] + dy * sz + dz * sy + m_c * dy * dz,
                ],
                axis=-1,
            )
            quads.append(q_p.sum(axis=(1, 3, 5)))
            s_p = s_c + m_c[..., None] * jnp.stack(
                [
                    jnp.broadcast_to(dx, m_c.shape),
                    jnp.broadcast_to(dy, m_c.shape),
                    jnp.broadcast_to(dz, m_c.shape),
                ],
                axis=-1,
            )
            srels.append(s_p.sum(axis=(1, 3, 5)))
        else:
            msums.append(
                msums[-1].reshape(dm, 2, dm, 2, dm, 2, 3).sum(axis=(1, 3, 5))
            )
    if order >= 2:
        # Reconstruct ABSOLUTE msums (public contract: com = msum / m) from
        # the center-relative sums: msum = s_rel + m·ctr.
        msums = []
        # masses is still ordered fine → coarse here: index i has edge 2^i.
        for lvl_i, (m_l, s_l) in enumerate(zip(masses, srels)):
            dl = m_l.shape[0]
            edge = cell * (1 << lvl_i)
            idx = (jnp.arange(dl, dtype=pos_dtype) + 0.5) * edge
            ctr_l = lo + jnp.stack(
                jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1
            )
            msums.append(s_l + m_l[..., None] * ctr_l)
        srels.reverse()
        quads.reverse()
    masses.reverse()
    msums.reverse()
    return Pyramid(
        tuple(masses),
        tuple(msums),
        lo,
        cell,
        tuple(quads),
        tuple(srels) if order >= 2 else (),
    )


def _window_offsets_and_masks(ws: int):
    """Static parent-window offsets and 8×8 child accept masks.

    Returns (po (n,3) int32, accept (n,8,8) bool) where accept[p, kt, ks]
    is True iff child cells at parent offset po[p] with child indices
    kt (target) / ks (source) are Chebyshev-separated by more than ws.
    Parent-window membership (cheb(po) ≤ ws) is the offset list itself.
    """
    rng = np.arange(-ws, ws + 1)
    po = np.array(
        [(x, y, z) for x in rng for y in rng for z in rng], np.int32
    )
    kids = np.array(
        [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.int32
    )
    # child-cell offset = 2·po + ks − kt; accepted iff cheb > ws
    delta = (
        2 * po[:, None, None, :]
        + kids[None, None, :, :]
        - kids[None, :, None, :]
    )  # (n, 8t, 8s, 3)
    accept = np.abs(delta).max(axis=-1) > ws
    return po, accept


def _conv_taps_kernel(dvec: jax.Array, eps: float):
    """Per-tap multipole-to-local translation matrices.

    dvec: (T, 3) source-center − target-center displacement per tap.
    Returns (T, 19, 10): rows = output channels [A3, J6, H10], cols = input
    moment channels [m, s3, q6], built from the Plummer-kernel derivative
    tensors T1..T4 of T1_i(D) = D_i·u^{-3/2}, u = |D|²+ε²:

      A_i = m·T1_i + s_j·T2_ij + ½ q_jk·T3_ijk
      J_ij = −(m·T2_ij + s_k·T3_ijk + ½ q_kl·T4_ijkl)
      H_ijk = m·T3_ijk + s_l·T4_ijkl              (q·T5 truncated)

    All entries are elementwise in the tap axis — the MXU conv does the
    actual spatial accumulation.
    """
    D = [dvec[:, 0], dvec[:, 1], dvec[:, 2]]
    u = dvec[:, 0] ** 2 + dvec[:, 1] ** 2 + dvec[:, 2] ** 2 + eps * eps
    u = jnp.maximum(u, 1e-30)
    u3 = u ** (-1.5)
    u5 = u3 / u
    u7 = u5 / u
    u9 = u7 / u

    def kd(i, j):
        return 1.0 if i == j else 0.0

    def t1(i):
        return D[i] * u3

    def t2(i, j):
        return kd(i, j) * u3 - 3.0 * D[i] * D[j] * u5

    def t3(i, j, k):
        return (
            -3.0 * (kd(i, j) * D[k] + kd(i, k) * D[j] + kd(j, k) * D[i]) * u5
            + 15.0 * D[i] * D[j] * D[k] * u7
        )

    def t4(i, j, k, l):
        return (
            -3.0
            * (kd(i, j) * kd(k, l) + kd(i, k) * kd(j, l) + kd(j, k) * kd(i, l))
            * u5
            + 15.0
            * (
                kd(i, j) * D[k] * D[l]
                + kd(i, k) * D[j] * D[l]
                + kd(j, k) * D[i] * D[l]
                + kd(k, l) * D[i] * D[j]
                + kd(j, l) * D[i] * D[k]
                + kd(i, l) * D[j] * D[k]
            )
            * u7
            - 105.0 * D[i] * D[j] * D[k] * D[l] * u9
        )

    SYM6 = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
    SYM10 = [
        (0, 0, 0), (1, 1, 1), (2, 2, 2), (0, 0, 1), (0, 0, 2),
        (0, 1, 1), (1, 1, 2), (0, 2, 2), (1, 2, 2), (0, 1, 2),
    ]
    q_mult = [1.0, 1.0, 1.0, 2.0, 2.0, 2.0]  # off-diagonal double count

    rows = []
    # A channels
    for i in range(3):
        cols = [t1(i)] + [t2(i, j) for j in range(3)]
        cols += [
            0.5 * q_mult[c] * t3(i, *SYM6[c]) for c in range(6)
        ]
        rows.append(cols)
    # J channels (symmetric 6)
    for (i, j) in SYM6:
        cols = [-t2(i, j)] + [-t3(i, j, k) for k in range(3)]
        cols += [
            -0.5 * q_mult[c] * t4(i, j, *SYM6[c]) for c in range(6)
        ]
        rows.append(cols)
    # H channels (symmetric 10); quad column truncated (5th derivative)
    zero = jnp.zeros_like(u)
    for (i, j, k) in SYM10:
        cols = [t3(i, j, k)] + [t4(i, j, k, l) for l in range(3)]
        cols += [zero] * 6
        rows.append(cols)
    return jnp.stack(
        [jnp.stack(c, axis=-1) for c in rows], axis=-2
    )  # (T, 19, 10)


def _far_conv_level(
    pyr: Pyramid, lvl: int, ws: int, eps: float, levels: int,
    precision=jax.lax.Precision.HIGHEST,
    impl: str = "xla",
):
    """One level's accepted far-field contributions as (2ws+1)³ MXU matmuls.

    Because the local expansion is about CELL CENTERS, the source→target
    displacement is constant per (parent offset, child pair) tap, so each
    parent offset contributes ONE (8·19, 8·10) multipole-to-local matrix
    (from _conv_taps_kernel, telescoping acceptance folded in) applied to
    the shifted child-major moment grid (8·10, p³): a lax.scan of dense
    dot_generals — the MXU does the channel reduction, dynamic_slice does
    the spatial shift. (Measured 10.6× faster than the equivalent
    conv_general_dilated, whose TPU lowering is poor at these channel
    counts.) This is the TPU-native form of the reference's per-cell
    traversal (force_barnes_hut.cu:130-201).
    """
    dl = 1 << lvl
    p = dl // 2
    pc = p * p * p
    s_l = pyr.cell * (1 << (levels - lvl))
    w1 = 2 * ws + 1
    dtype = pyr.masses[0].dtype

    po_np, accept_np = _window_offsets_and_masks(ws)  # (T,3), (T,8,8)
    kids = np.array(
        [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.int32
    )
    # Tap displacement per (po, kt, ks): D = (2·po + ks − kt)·s_child
    delta_int = (
        2 * po_np[:, None, None, :]
        + kids[None, None, :, :]
        - kids[None, :, None, :]
    )  # (T, 8, 8, 3)
    T = po_np.shape[0]
    dvec = jnp.asarray(delta_int.reshape(T * 64, 3), dtype) * s_l
    K = _conv_taps_kernel(dvec, eps)  # (T·64, 19, 10)
    mask = jnp.asarray(
        accept_np.astype(np.float32).reshape(T * 64), dtype
    )
    K = K * mask[:, None, None]
    # (T, kt, ks, 19, 10) → per-offset tap matrices (T, kt·19, ks·10)
    tap_mat = (
        K.reshape(T, 8, 8, 19, 10)
        .transpose(0, 1, 3, 2, 4)
        .reshape(T, 8 * 19, 8 * 10)
    )

    # Child-major moment channels (8·10, p, p, p), channel = kid·10 + ch
    # (must match tap_mat's column order ks·10 + in_ch).
    def cm(x, c):
        return (
            x.reshape(p, 2, p, 2, p, 2, c)
            .transpose(1, 3, 5, 6, 0, 2, 4)
            .reshape(8, c, p, p, p)
        )

    mom = jnp.concatenate(
        [
            cm(pyr.masses[lvl][..., None], 1),
            cm(pyr.srels[lvl], 3),
            cm(pyr.quads[lvl], 6),
        ],
        axis=1,
    ).reshape(80, p, p, p)

    if impl in ("pallas", "pallas_interpret") and p * p >= 128:
        # VMEM-resident tap loop (ops/pallas_far_taps.py): the XLA scan
        # re-reads the padded moment grid from HBM per tap (~284 MB and
        # 7.4 ms/step at 1M/L6 for ~0.3 ms of MXU math). bf16 taps: the
        # tap sum is already an O(θ²)-truncated multipole approximation
        # at well-separated cells — per-tap 2⁻⁸ rounding is far below
        # the method error (accuracy gate: scripts/profile_r3q.py).
        from nbody_tpu.ops.pallas_far_taps import far_taps_pallas

        out = far_taps_pallas(
            mom, tap_mat, p=p, ws=ws,
            interpret=impl == "pallas_interpret",
        )
        out = out.reshape(8, 19, pc)
        return out[:, 0:3], out[:, 3:9], out[:, 9:19]

    mom_pad = jnp.pad(mom, [(0, 0), (ws, ws), (ws, ws), (ws, ws)])
    po_arr = jnp.asarray(po_np + ws)  # slice starts into the padded grid

    def tap_body(acc, args):
        off, mat = args
        zero = jnp.zeros((), off.dtype)
        src = jax.lax.dynamic_slice(
            mom_pad, (zero, off[0], off[1], off[2]), (80, p, p, p)
        ).reshape(80, pc)
        out = jax.lax.dot_general(
            mat,
            src,
            (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=dtype,
        )
        return acc + out, None

    acc0 = jnp.zeros((152, pc), dtype)
    out, _ = jax.lax.scan(tap_body, acc0, (po_arr, tap_mat))
    out = out.reshape(8, 19, pc)
    return out[:, 0:3], out[:, 3:9], out[:, 9:19]


def far_field_grid(
    pyr: Pyramid, ws: int, G: float, eps: float, levels: int,
    precision=jax.lax.Precision.HIGHEST,
    impl: str = "xla",
):
    """Far field as a LOCAL EXPANSION per finest cell.

    Returns (A, J6, H10): acceleration (d,d,d,3), its SYMMETRIC Jacobian in
    6-component form (d,d,d,6) ordered [xx, yy, zz, xy, xz, yz], and — for
    order-2 pyramids — the symmetric Hessian in 10-component form
    [xxx, yyy, zzz, xxy, xxz, xyy, yyz, xzz, yzz, xyz] (None for order-1),
    all about cell centers. The downward pass translates the expansion to
    child centers EXACTLY (A += J·δ + ½δᵀHδ, J += H·δ, H inherited) — the
    FMM local-expansion trick; a piecewise-constant inheritance would leave
    an O(θ) target-discretization error. Particles evaluate
    a(x) = A[c] + J[c]·δ + ½(H[c]·δ)·δ.

    Two per-level engines:
      * order-2 pyramids → ``_far_conv_level``: ONE MXU convolution per
        level (monopole+dipole+quadrupole sources, order-2 local
        expansion); the fast path.
      * order-1 pyramids → the VPU scan: COM-centered monopoles with
        order-1 expansion; all per-level sweeps run with the flattened
        cell axis LAST (the TPU lane dimension) and the tiny
        child/component axes leading — (8, c, P³) — full lane utilization.
        Each accepted monopole contributes a += w·d,
        ∇a = w·(3·d⊗d/u − I); acceptance is one scalar multiply from the
        precomputed mask table.
    """
    po_np, accept_np = _window_offsets_and_masks(ws)
    po_all = jnp.asarray(po_np + ws)  # slice starts into the padded grid
    accept_f = jnp.asarray(accept_np.astype(np.float32))
    kids = np.array(
        [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.int32
    )
    dtype = pyr.masses[0].dtype
    use_quad = len(pyr.quads) > 0

    acc = None  # (dl, dl, dl, 3) expansion value at the previous level
    jac = None  # (dl, dl, dl, 6) symmetric expansion gradient
    hes = None  # (dl, dl, dl, 10) symmetric expansion Hessian (order 2)
    for lvl in range(1, levels + 1):
        dl = 1 << lvl
        p = dl // 2
        pc = p * p * p
        s_l = pyr.cell * (1 << (levels - lvl))  # cell edge at this level

        if use_quad:
            acc_pm, jac_pm, hes_pm = _far_conv_level(
                pyr, lvl, ws, eps, levels, precision=precision, impl=impl
            )
        else:
            hes_pm = None
            # Child-major grids with cells flattened on lanes.
            m = (
                pyr.masses[lvl]
                .reshape(p, 2, p, 2, p, 2)
                .transpose(1, 3, 5, 0, 2, 4)
                .reshape(8, p, p, p)
            )
            s = (
                pyr.msums[lvl]
                .reshape(p, 2, p, 2, p, 2, 3)
                .transpose(1, 3, 5, 6, 0, 2, 4)
                .reshape(8, 3, p, p, p)
            )

            # Target child-cell centers: (8, 3, p³)
            q = jnp.stack(
                jnp.meshgrid(
                    jnp.arange(p), jnp.arange(p), jnp.arange(p), indexing="ij"
                ),
                axis=0,
            ).astype(dtype).reshape(3, pc)
            centers = (
                pyr.lo.reshape(3, 1)
                + (
                    2.0 * q[None, :, :]
                    + jnp.asarray(kids, dtype)[:, :, None]
                    + 0.5
                )
                * s_l
            )  # (8, 3, p³)

            # Source COM precomputed ONCE per level (not per offset).
            inv_m = 1.0 / jnp.maximum(m, 1e-30)
            com = s * inv_m[:, None]                    # (8, 3, p, p, p)
            pad3 = [(ws, ws), (ws, ws), (ws, ws)]
            m_pad = jnp.pad(m, [(0, 0)] + pad3)
            com_pad = jnp.pad(com, [(0, 0), (0, 0)] + pad3)

            eps2 = eps * eps

            def body(carry, x, m_pad=m_pad, com_pad=com_pad,
                     centers=centers, p=p, pc=pc):
                po, acc_tab = x  # (3,), (8, 8) float mask
                zero = jnp.zeros((), po.dtype)
                msrc = jax.lax.dynamic_slice(
                    m_pad, (zero, po[0], po[1], po[2]), (8, p, p, p)
                ).reshape(8, pc)
                csrc = jax.lax.dynamic_slice(
                    com_pad, (zero, zero, po[0], po[1], po[2]),
                    (8, 3, p, p, p),
                ).reshape(8, 3, pc)
                comx, comy, comz = csrc[:, 0], csrc[:, 1], csrc[:, 2]
                out_a, out_j = carry
                a_rows = []
                j_rows = []
                for kt in range(8):
                    dx = comx - centers[kt, 0]           # (8, pc)
                    dy = comy - centers[kt, 1]
                    dz = comz - centers[kt, 2]
                    r2 = dx * dx + dy * dy + dz * dz + eps2
                    inv = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
                    inv2 = inv * inv
                    # empty cells: m = 0 ⇒ w = 0; acceptance is one
                    # broadcast multiply from the (8,) mask column.
                    amask = acc_tab[kt][:, None]
                    w = (msrc * amask) * (inv2 * inv)
                    t3 = 3.0 * w * inv2
                    a_rows.append(
                        jnp.stack(
                            [
                                jnp.sum(w * dx, axis=0),
                                jnp.sum(w * dy, axis=0),
                                jnp.sum(w * dz, axis=0),
                            ]
                        )
                    )
                    wsum = jnp.sum(w, axis=0)
                    j_rows.append(
                        jnp.stack(
                            [
                                jnp.sum(t3 * dx * dx, axis=0) - wsum,
                                jnp.sum(t3 * dy * dy, axis=0) - wsum,
                                jnp.sum(t3 * dz * dz, axis=0) - wsum,
                                jnp.sum(t3 * dx * dy, axis=0),
                                jnp.sum(t3 * dx * dz, axis=0),
                                jnp.sum(t3 * dy * dz, axis=0),
                            ]
                        )
                    )
                out_a = out_a + jnp.stack(a_rows, axis=0)   # (8, 3, pc)
                out_j = out_j + jnp.stack(j_rows, axis=0)   # (8, 6, pc)
                return (out_a, out_j), None

            acc_pm = jnp.zeros((8, 3, pc), dtype)
            jac_pm = jnp.zeros((8, 6, pc), dtype)
            (acc_pm, jac_pm), _ = jax.lax.scan(
                body, (acc_pm, jac_pm), (po_all, accept_f)
            )

        # child-major (8, c, p³) → child grid (dl, dl, dl, c)
        def to_grid(a, c):
            return (
                a.reshape(2, 2, 2, c, p, p, p)
                .transpose(4, 0, 5, 1, 6, 2, 3)
                .reshape(dl, dl, dl, c)
            )

        acc_lvl = to_grid(acc_pm, 3)
        jac_lvl = to_grid(jac_pm, 6)
        hes_lvl = to_grid(hes_pm, 10) if use_quad else None
        if acc is not None:
            # exact expansion translation to child centers:
            # A_child = A + J·δ (+ ½δᵀHδ), J_child = J (+ H·δ), H_child = H,
            # where δ_k = (k − ½)·s_child per axis (8 static offsets).
            s_child = s_l

            def rep8(x):
                return jnp.repeat(jnp.repeat(jnp.repeat(x, 2, 0), 2, 1), 2, 2)

            a_rep = rep8(acc)
            j_rep = rep8(jac)
            # child parity per axis → δ component ±s_child/2
            idx = jnp.arange(dl)
            par = (idx % 2).astype(dtype) - 0.5  # (dl,) values ∓0.5
            delta = (
                jnp.stack(
                    jnp.meshgrid(par, par, par, indexing="ij"), axis=-1
                )
                * s_child
            )  # (dl, dl, dl, 3)
            acc_lvl = acc_lvl + a_rep + sym_matvec(j_rep, delta)
            jac_lvl = jac_lvl + j_rep
            if use_quad:
                h_rep = rep8(hes)
                hd6 = sym3_matvec(h_rep, delta)  # (dl,dl,dl,6) = H·δ
                acc_lvl = acc_lvl + 0.5 * sym_matvec(hd6, delta)
                jac_lvl = jac_lvl + hd6
                hes_lvl = hes_lvl + h_rep
        acc = acc_lvl
        jac = jac_lvl
        hes = hes_lvl

    if use_quad:
        return G * acc, G * jac, G * hes
    return G * acc, G * jac, None


def sym_matvec(j6: jax.Array, v: jax.Array) -> jax.Array:
    """(…, 6) symmetric matrix [xx,yy,zz,xy,xz,yz] times (…, 3) vector."""
    jx = j6[..., 0] * v[..., 0] + j6[..., 3] * v[..., 1] + j6[..., 4] * v[..., 2]
    jy = j6[..., 3] * v[..., 0] + j6[..., 1] * v[..., 1] + j6[..., 5] * v[..., 2]
    jz = j6[..., 4] * v[..., 0] + j6[..., 5] * v[..., 1] + j6[..., 2] * v[..., 2]
    return jnp.stack([jx, jy, jz], axis=-1)


def sym3_matvec(h10: jax.Array, v: jax.Array) -> jax.Array:
    """(…, 10) symmetric 3-tensor [xxx,yyy,zzz,xxy,xxz,xyy,yyz,xzz,yzz,xyz]
    contracted with (…, 3) → the (…, 6) symmetric matrix (H·v)_ij."""
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    xxx, yyy, zzz = h10[..., 0], h10[..., 1], h10[..., 2]
    xxy, xxz, xyy = h10[..., 3], h10[..., 4], h10[..., 5]
    yyz, xzz, yzz = h10[..., 6], h10[..., 7], h10[..., 8]
    xyz = h10[..., 9]
    return jnp.stack(
        [
            xxx * vx + xxy * vy + xxz * vz,  # xx
            xyy * vx + yyy * vy + yyz * vz,  # yy
            xzz * vx + yzz * vy + zzz * vz,  # zz
            xxy * vx + xyy * vy + xyz * vz,  # xy
            xxz * vx + xyz * vy + xzz * vz,  # xz
            xyz * vx + yyz * vy + yzz * vz,  # yz
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Exact near field over sorted z-runs
# ---------------------------------------------------------------------------


def _near_field(
    pos,
    mass,
    lo,
    cell,
    G: float,
    eps: float,
    ws: int,
    levels: int,
    window: int,
    block_size: int = 256,
    impl: str = "xla",
):
    """Exact pairwise forces within the (2ws+1)³ finest-cell neighborhood,
    via the gather-free sorted-window sweep (nbody_tpu/ops/sorted_window.py).

    Returns (acc (N,3), overflow (), coords (N,3))."""
    from nbody_tpu.ops.sorted_window import (
        build_sorted_grid,
        window_sweep,
        xy_ball,
    )

    d = 1 << levels
    coords = jnp.clip(((pos - lo) / cell).astype(jnp.int32), 0, d - 1)
    grid = build_sorted_grid(pos, mass, coords, d)

    acc, overflow = window_sweep(
        grid,
        d=d,
        xy_offsets=xy_ball(ws),
        z_halfwidth=ws,
        window=window,
        block_size=block_size,
        eps=eps,
        impl=impl,
    )
    return G * acc, overflow, coords


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def resolve_impl(env_name: str) -> str:
    """Resolve a kernel-implementation switch OUTSIDE jit.

    Returns "pallas" (TPU hardware kernels), "pallas_interpret" (the same
    pipeline in Pallas interpret mode — hermetic CPU testing of the
    TPU-only path), or "xla". Env semantics: ``<env_name>=0`` opts out for
    A/B profiling, ``force`` runs interpret mode off-TPU. Must be called
    from UNTRACED code (factories, public wrappers): an env read inside a
    jitted function binds at trace time and silently ignores later flips.
    """
    import os

    flag = os.environ.get(env_name)
    if flag == "0":
        return "xla"
    if flag == "force":
        return "pallas" if jax.default_backend() == "tpu" else "pallas_interpret"
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def barnes_hut_forces(
    pos,
    mass,
    G: float = 1.0,
    softening: float = 0.1,
    theta: float = 0.5,
    *,
    levels: int = 6,
    window: int = 2048,
    near_engine: str = "tiles",
    near_k: int = 16,
    multipole_order: int = 2,
    near_impl: str | None = None,
):
    """Full BH acceleration: pyramid far field + exact near field.

    near_engine: "tiles" (dense cell tiles — optimal at the low per-cell
    occupancy the BH finest level is sized for) or "window" (sorted-window
    sweep — for unusually dense scenes; raise ``window`` until its overflow
    reads 0). ``near_k`` is the tiles-engine per-cell slot cap.
    multipole_order: 2 = monopole+quadrupole sources at ws = ceil(1/(2θ))
    (the default: same accuracy as monopole ws = ceil(1/θ) with a
    (2ws+1)³-fold smaller near field); 1 = classic monopole-only.
    near_impl: "pallas" / "pallas_interpret" / "xla" kernel selection;
    None resolves NBODY_PALLAS_NEAR + backend here, outside jit.
    """
    if near_impl is None:
        near_impl = resolve_impl("NBODY_PALLAS_NEAR")
    return _barnes_hut_forces(
        pos, mass, G, softening, theta,
        levels=levels, window=window, near_engine=near_engine,
        near_k=near_k, multipole_order=multipole_order, near_impl=near_impl,
    )


def barnes_hut_forces_sorted(
    pos,
    mass,
    G: float = 1.0,
    softening: float = 0.1,
    theta: float = 0.5,
    *,
    levels: int = 6,
    near_k: int = 16,
    multipole_order: int = 2,
    near_impl: str | None = None,
    extra=None,
    with_grid_meta: bool = False,
    ids_via_gather: bool = True,
):
    """Sorted-pipeline BH forces → ``(acc_sorted, psort, order)``, or
    ``(acc_sorted, psort, order, extra_sorted)`` when ``extra`` is given;
    ``with_grid_meta=True`` appends a ``FrozenGridMeta`` (the cached cell
    assignment) so callers can take FROZEN-GRID steps between re-sorts
    (``barnes_hut_forces_frozen``).

    The same physics as ``barnes_hut_forces`` on the tiles/pallas fast
    path, but every output stays in the engine's internal CELL-SORTED row
    order: ``acc_sorted`` aligns with ``psort`` (x, y, z, mass rows) and
    ``order`` maps original row i → sorted position (``psort =
    stacked(pos, mass)[order]``). Callers that STEP in sorted order
    (ops/integrator.make_sorted_multi_step) skip the ~13 ms/1M unsort
    gather every step; ``extra`` (N, E) f32 payload rides the engine's
    OWN sort gather for free (width-insensitive rows), deleting the
    integrator's separate payload gather too.
    """
    if near_impl is None:
        near_impl = resolve_impl("NBODY_PALLAS_NEAR")
    if near_impl == "xla":
        # The sorted contract only exists on the fused tiles path; the
        # hermetic CPU form of that path is interpret mode.
        near_impl = "pallas_interpret"
    return _barnes_hut_forces(
        pos, mass, G, softening, theta,
        levels=levels, window=2048, near_engine="tiles",
        near_k=near_k, multipole_order=multipole_order,
        near_impl=near_impl, sorted_output=True, extra=extra,
        with_grid_meta=with_grid_meta, ids_via_gather=ids_via_gather,
    )


def _fused_bh_force_from_grid(
    grid, lo, cell, *, d, levels, ws, near_k, G, softening, near_impl,
    sorted_output, rank_sorted=None,
):
    """Everything downstream of the cell sort on the fused TPU pipeline:
    ONE MXU scatter kernel builds the slot tiles AND the finest-level
    multipole moments (+ exact per-cell counts for the overflow audit)
    from the same source windows — the separate segment-sum moments pass
    cost ~10 ms/step at 1M (scripts/profile_r3o.py f1). The far field
    rides the near sweep: grids computed UNSCALED (G folds in at
    pickup), laid out plane-major, and each slot seeds its accumulator
    with the local expansion at its own position inside the Pallas
    kernel — no separate 19-channel per-particle gather + tensor math
    stage (17.6 ms at 1M, scripts/profile_r3m.py).

    Split out so FROZEN-GRID steps (``barnes_hut_forces_frozen``) can
    run it against a cached cell assignment without re-sorting; far taps
    ride the Pallas VMEM kernel where the lane gate admits it
    (ops/pallas_far_taps.py — 3.93 vs 4.88 ms XLA at the finest 1M
    level, rel diff ≤ 7e-6, scripts/profile_r3r.py r3/r4).
    Returns ``(acc, TileBuild)``.
    """
    from nbody_tpu.ops.tile_sweep import tile_build_pallas, tile_sweep_pick

    tb = tile_build_pallas(
        grid, lo, cell, d=d, k=near_k, impl=near_impl,
        with_moments=True, rank_sorted=rank_sorted,
    )
    packed = tb.moments[:10].T.reshape(d, d, d, 10)
    pyr = pyramid_from_packed(packed, lo, cell, levels, 2)
    a_far, j_far, h_far = far_field_grid(
        pyr, ws, 1.0, softening, levels, impl=near_impl
    )
    parts = [a_far, j_far] + ([h_far] if h_far is not None else [])
    packed_g = jnp.concatenate(parts, axis=-1)  # (d, d, d, C)
    far_plane = packed_g.reshape(
        d, d * d, packed_g.shape[-1]
    ).transpose(0, 2, 1)  # (d, C, d²)
    acc = tile_sweep_pick(
        tb, grid, lo, cell,
        d=d, ws=ws, k=near_k, G=G, eps=softening,
        impl=near_impl, sorted_output=sorted_output,
        far_plane=far_plane,
    )
    return acc, tb


def barnes_hut_forces_frozen(
    psort,
    meta,
    G: float = 1.0,
    softening: float = 0.1,
    theta: float = 0.5,
    *,
    levels: int = 6,
    near_k: int = 16,
    multipole_order: int = 2,
    near_impl: str | None = None,
    with_audit: bool = False,
):
    """BH forces on a FROZEN cell assignment — the stale-sort step of
    the amortized re-sort cadence (ops/integrator.make_resort_multi_step).

    ``psort`` is the (N, 4) [x, y, z, mass] rows in the LAST re-sort's
    row order; ``meta`` is the ``FrozenGridMeta`` that re-sort returned
    (``barnes_hut_forces_sorted(..., with_grid_meta=True)``). The full
    fused pipeline (tiles+moments scatter → pyramid → far grids → sweep
    → pickup) runs against the CURRENT positions with the CACHED cell
    assignment; the per-step argsort + payload gather (8.8 ms at 1M) and
    the rank cummax never happen. Rows that drifted across a cell
    boundary since the re-sort are evaluated with their old assignment —
    their position is exact, only the near-window center / expansion
    cell is one cell stale (the same error class as the binning's own
    f32 boundary ties, build_sorted_grid docstring). ``with_audit=True``
    additionally returns the count of stale assignments so callers can
    bound the cadence. The reference has no counterpart (it re-sorts
    every step, force_barnes_hut.cu:276-280).

    Returns ``acc_sorted`` (same row order as ``psort``), or
    ``(acc_sorted, n_stale)`` with audit.
    """
    if near_impl is None:
        near_impl = resolve_impl("NBODY_PALLAS_NEAR")
    if near_impl == "xla":
        near_impl = "pallas_interpret"
    return _barnes_hut_frozen(
        psort, meta, G, softening, theta,
        levels=levels, near_k=near_k,
        multipole_order=multipole_order, near_impl=near_impl,
        with_audit=with_audit,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "G", "softening", "theta", "levels", "near_k",
        "multipole_order", "near_impl", "with_audit",
    ),
)
def _barnes_hut_frozen(
    psort, meta, G, softening, theta, *, levels, near_k,
    multipole_order, near_impl, with_audit,
):
    from nbody_tpu.ops.sorted_window import SortedGrid
    from nbody_tpu.ops.tile_sweep import tile_engine_fused

    d = 1 << levels
    if not (
        tile_engine_fused(d, near_k, near_impl) and multipole_order >= 2
    ):
        raise ValueError(
            "frozen-grid stepping requires the fused tiles path "
            f"(levels={levels}, near_k={near_k}, near_impl={near_impl!r})"
        )
    ws = theta_to_ws(theta, order=multipole_order)
    grid = SortedGrid(
        order=meta.ids,  # unused under sorted_output=True (placeholder)
        psort=psort, csort=None, ids=meta.ids, cell_start=None,
    )
    acc, _tb = _fused_bh_force_from_grid(
        grid, meta.lo, meta.cell,
        d=d, levels=levels, ws=ws, near_k=near_k,
        G=G, softening=softening, near_impl=near_impl,
        sorted_output=True, rank_sorted=meta.rank,
    )
    if not with_audit:
        return acc
    cs = jnp.clip(
        ((psort[:, :3] - meta.lo) / meta.cell).astype(jnp.int32), 0, d - 1
    )
    ids_now = (cs[:, 0] * d + cs[:, 1]) * d + cs[:, 2]
    return acc, jnp.sum((ids_now != meta.ids).astype(jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=(
        "G",
        "softening",
        "theta",
        "levels",
        "window",
        "near_engine",
        "near_k",
        "multipole_order",
        "near_impl",
        "sorted_output",
        "with_grid_meta",
        "ids_via_gather",
    ),
)
def _barnes_hut_forces(
    pos,
    mass,
    G: float,
    softening: float,
    theta: float,
    *,
    levels: int,
    window: int,
    near_engine: str,
    near_k: int,
    multipole_order: int,
    near_impl: str,
    sorted_output: bool = False,
    extra=None,
    with_grid_meta: bool = False,
    ids_via_gather: bool = True,
):
    ws = theta_to_ws(theta, order=multipole_order)
    d_fine = 1 << levels
    # The one-hot kernels carry dest ids in f32: exact only below 2^24
    # (pallas_scatter.py SENTINEL contract) — static guard, never silent.
    fits_f32_ids = d_fine**3 * max(near_k, 1) < (1 << 24)
    fast_path = (
        near_engine == "tiles"
        and near_impl in ("pallas", "pallas_interpret")
        and fits_f32_ids
    )
    if sorted_output and not fast_path:
        raise ValueError(
            "sorted_output requires the tiles/pallas fast path "
            f"(near_engine={near_engine!r}, near_impl={near_impl!r}, "
            f"grid ids fit f32: {fits_f32_ids})"
        )
    if fast_path:
        # TPU fast path: ONE cell sort feeds both the pyramid moments
        # (MXU segment sum, exact at any density via in-kernel window
        # loops) and the tile near field.
        from nbody_tpu.ops.sorted_window import build_sorted_grid

        d = 1 << levels
        lo, cell = pyramid_geometry(
            jnp.min(pos, axis=0), jnp.max(pos, axis=0), levels
        )
        coords = jnp.clip(((pos - lo) / cell).astype(jnp.int32), 0, d - 1)
        from nbody_tpu.ops.tile_sweep import (
            tile_build_pallas,
            tile_engine_fused,
            tile_sweep_pick,
        )

        fused = tile_engine_fused(d, near_k, near_impl) and multipole_order >= 2
        if with_grid_meta and not fused:
            raise ValueError(
                "with_grid_meta (frozen-grid stepping) requires the fused "
                f"tiles path (levels={levels}, near_k={near_k}, "
                f"near_impl={near_impl!r}, multipole_order={multipole_order})"
            )
        # LIGHT grid build: the tiles engine never indexes per-cell
        # segments — ranks come from one sorted-ids cummax and chunk
        # starts from a few thousand searchsorted queries. The full d³
        # index measured 8.8 ms (1M-row scatter-min) plus a 6.4 ms
        # rank gather at 1M/d=64 (scripts/profile_r3p.py p1/p3 vs p6) —
        # an earlier harness mis-attributed this to the sort itself.
        # The fused pipeline also never reads per-row cell coords
        # (with_csort); the non-fused branch evaluates its far pickup at
        # grid.csort cell centers and keeps them.
        def ids_sorted_fn(psort, lo=lo, cell=cell):
            # Same binning as `coords` above, on the same position bits
            # (bit-exact promise of build_sorted_grid's ids_sorted_fn) —
            # drops the ids column so a 4-col extra keeps the payload at
            # the 8-column row-gather width limit (profile_r3w w1/w1c).
            cs = jnp.clip(
                ((psort[:, :3] - lo) / cell).astype(jnp.int32), 0, d - 1
            )
            return (cs[:, 0] * d + cs[:, 1]) * d + cs[:, 2]

        # Only drop the id column when the payload would otherwise cross
        # the 8-column row-gather width cliff; without extra the 5-wide
        # bitcast form stays (recomputing ids costs a 1M-row div pass).
        wide = extra is not None and extra.shape[-1] + 5 > 8
        grid = build_sorted_grid(
            pos, mass, coords, d,
            with_cell_start=False,
            extra=extra,
            with_csort=not fused,
            ids_sorted_fn=(
                ids_sorted_fn
                if wide and not (with_grid_meta or ids_via_gather)
                else None
            ),
            # int32-native ids ALWAYS (r5 default): the bitcast column
            # denormal-flushes on TPU — in r4 it collapsed rank to
            # arange when an int gather coexisted (profile_r4c a1/a4);
            # in r5 it was caught zeroing the moments/placement of THIS
            # fused pipeline itself, failing direct-N² ground truth on
            # every row (profile_r5e p0/p1 vs p2). ids_via_gather=False
            # survives only as an explicit A/B-archaeology override.
            ids_via_gather=with_grid_meta or ids_via_gather,
        )
        ids_sorted = grid.ids

        if fused:
            acc, tb = _fused_bh_force_from_grid(
                grid, lo, cell,
                d=d, levels=levels, ws=ws, near_k=near_k,
                G=G, softening=softening, near_impl=near_impl,
                sorted_output=sorted_output,
            )
            if sorted_output:
                out = [acc, grid.psort, grid.order]
                if extra is not None:
                    out.append(grid.extra)
                if with_grid_meta:
                    from nbody_tpu.ops.sorted_window import FrozenGridMeta

                    # grid.ids is already int32-native here
                    # (ids_via_gather above), so the meta shares the
                    # engine's own ids/rank — frozen(fresh meta) is the
                    # SAME pipeline bit for bit.
                    out.append(FrozenGridMeta(
                        ids=grid.ids, rank=tb.rank_sorted,
                        lo=lo, cell=cell,
                    ))
                return tuple(out)
            return acc

        from nbody_tpu.ops.tile_sweep import tile_near_field

        packed = _sorted_finest_moments(
            grid, ids_sorted, lo, cell, d, multipole_order,
            interpret=near_impl == "pallas_interpret",
        )
        pyr = pyramid_from_packed(packed, lo, cell, levels, multipole_order)
        a_far, j_far, h_far = far_field_grid(pyr, ws, G, softening, levels)
        a_near, _over = tile_near_field(
            pos, mass, coords, lo, cell,
            d=d, ws=ws, k=near_k, G=G, eps=softening, grid=grid,
            impl=near_impl, sorted_output=sorted_output,
        )
        if sorted_output:
            # Sorted-pipeline contract: everything in CELL-SORTED row
            # order (rows aligned with grid.psort) — the far pickup reads
            # by the SORTED cell ids and deltas, and the ~13 ms/1M unsort
            # never happens (ops/integrator.make_sorted_multi_step).
            pos_s = grid.psort[:, :3]
            centers = lo + (grid.csort.astype(pos.dtype) + 0.5) * cell
            cid = ids_sorted
        else:
            pos_s = pos
            centers = lo + (coords.astype(pos.dtype) + 0.5) * cell
            cid = (coords[:, 0] * d + coords[:, 1]) * d + coords[:, 2]
        parts = [a_far, j_far] + ([h_far] if h_far is not None else [])
        packed_g = jnp.concatenate(parts, axis=-1)
        vals = packed_g.reshape(d**3, packed_g.shape[-1])[cid]
        delta = pos_s - centers
        pick = vals[:, :3] + sym_matvec(vals[:, 3:9], delta)
        if h_far is not None:
            pick = pick + 0.5 * sym_matvec(
                sym3_matvec(vals[:, 9:19], delta), delta
            )
        if sorted_output:
            if extra is not None:
                return a_near + pick, grid.psort, grid.order, grid.extra
            return a_near + pick, grid.psort, grid.order
        return a_near + pick

    pyr = build_pyramid(pos, mass, levels, order=multipole_order)
    a_far, j_far, h_far = far_field_grid(pyr, ws, G, softening, levels)
    if near_engine == "tiles":
        from nbody_tpu.ops.tile_sweep import tile_near_field

        d = 1 << levels
        coords = jnp.clip(
            ((pos - pyr.lo) / pyr.cell).astype(jnp.int32), 0, d - 1
        )
        a_near, _over = tile_near_field(
            pos,
            mass,
            coords,
            pyr.lo,
            pyr.cell,
            d=d,
            ws=ws,
            k=near_k,
            G=G,
            eps=softening,
            impl="xla",
        )
    else:
        a_near, _over, coords = _near_field(
            pos, mass, pyr.lo, pyr.cell, G, softening, ws, levels, window,
            impl=near_impl,
        )
    # Evaluate the local expansion at the particle:
    # a(x) = A[c] + J[c]·δ (+ ½(H[c]·δ)·δ) — ONE packed gather per particle
    # (A3 + J6 (+ H10) contiguous).
    centers = pyr.lo + (coords.astype(pos.dtype) + 0.5) * pyr.cell
    parts = [a_far, j_far] + ([h_far] if h_far is not None else [])
    packed = jnp.concatenate(parts, axis=-1)  # (d, d, d, 9 or 19)
    d_fine = packed.shape[0]
    cid = (coords[:, 0] * d_fine + coords[:, 1]) * d_fine + coords[:, 2]
    vals = packed.reshape(d_fine**3, packed.shape[-1])[cid]  # linear gather
    delta = pos - centers
    pick = vals[:, :3] + sym_matvec(vals[:, 3:9], delta)
    if h_far is not None:
        pick = pick + 0.5 * sym_matvec(
            sym3_matvec(vals[:, 9:19], delta), delta
        )
    return a_near + pick


def bh_engine_params(config: SimulationConfig) -> dict:
    """Engine selection for a config — the SINGLE source of truth shared by
    ``make_barnes_hut_forces`` and ``ParticleSystem.audit_short_range``, so
    the audit always measures the configuration production actually runs
    (an audit of a different engine/k/ws is not a contract).

    Returns a dict with levels, multipole_order, ws, near_engine, near_k,
    and window (the sorted-window capacity used when near_engine is
    "window").
    """
    levels = config.bh_max_level
    multipole_order = 2
    ws = theta_to_ws(config.barnes_hut_theta, order=multipole_order)
    window = max(2048, 8 * config.hash_max_per_cell)
    # Expected occupancy picks the near-field engine: dense tiles when cells
    # are sparsely filled, sorted windows otherwise.
    occ = config.particle_count / float(8**levels)
    if occ <= 24.0:
        near_engine = "tiles"
        # Poisson 5σ tail: cells beyond k are counted by the audit API.
        # Cost scales with k², so keep k tight (multiple of 8 for sublanes).
        raw = occ + 5.0 * math.sqrt(occ + 1.0)
        near_k = int(min(64, max(8, -(-raw // 8) * 8)))
    else:
        near_engine = "window"
        near_k = 16
    return {
        "levels": levels,
        "multipole_order": multipole_order,
        "ws": ws,
        "near_engine": near_engine,
        "near_k": near_k,
        "window": window,
    }


def make_barnes_hut_forces(config: SimulationConfig):
    """Strategy factory (reference: BarnesHutCalculator,
    force_barnes_hut.cu:522-533)."""
    G = config.G
    eps = config.softening
    theta = config.barnes_hut_theta
    p = bh_engine_params(config)
    # Kernel impl resolved HERE, at factory time, outside any trace —
    # flipping NBODY_PALLAS_NEAR later requires rebuilding the strategy
    # (facade semantics, like every other compile-time constant).
    near_impl = resolve_impl("NBODY_PALLAS_NEAR")

    def force_fn(pos, mass):
        return _barnes_hut_forces(
            pos,
            mass,
            G,
            eps,
            theta,
            levels=p["levels"],
            window=p["window"],
            near_engine=p["near_engine"],
            near_k=p["near_k"],
            multipole_order=p["multipole_order"],
            near_impl=near_impl,
        )

    return force_fn


def make_barnes_hut_forces_sorted(config: SimulationConfig):
    """Sorted-pipeline strategy factory, or None when the config does not
    select the tiles/pallas fast path (the only engine with a sorted
    contract — see ``barnes_hut_forces_sorted``). Callers fall back to the
    plain ``make_barnes_hut_forces`` + unsort semantics when None."""
    G = config.G
    eps = config.softening
    theta = config.barnes_hut_theta
    p = bh_engine_params(config)
    near_impl = resolve_impl("NBODY_PALLAS_NEAR")
    if near_impl == "xla":
        near_impl = "pallas_interpret"
    d = 1 << p["levels"]
    if p["near_engine"] != "tiles" or d**3 * p["near_k"] >= (1 << 24):
        return None

    def sorted_force_fn(pos, mass, extra=None):
        return _barnes_hut_forces(
            pos,
            mass,
            G,
            eps,
            theta,
            levels=p["levels"],
            window=p["window"],
            near_engine="tiles",
            near_k=p["near_k"],
            multipole_order=p["multipole_order"],
            near_impl=near_impl,
            sorted_output=True,
            extra=extra,
        )

    # Barnes-Hut measured FASTER with the integrator's separate payload
    # gather than with extra riding the engine sort (+7.7 ms/step at 1M
    # through the routed form — scripts/profile_r3w2.py w0 vs w1).
    sorted_force_fn.route_extra = False

    # Frozen-grid contract (ops/integrator.make_resort_multi_step):
    # with_meta returns the cached cell assignment alongside the sorted
    # outputs; frozen re-evaluates forces against it without re-sorting.
    def with_meta(pos, mass):
        return _barnes_hut_forces(
            pos, mass, G, eps, theta,
            levels=p["levels"], window=p["window"], near_engine="tiles",
            near_k=p["near_k"], multipole_order=p["multipole_order"],
            near_impl=near_impl, sorted_output=True, with_grid_meta=True,
        )

    def frozen(psort, meta, with_audit=False):
        return _barnes_hut_frozen(
            psort, meta, G, eps, theta,
            levels=p["levels"], near_k=p["near_k"],
            multipole_order=p["multipole_order"], near_impl=near_impl,
            with_audit=with_audit,
        )

    def stale_count(psort, meta, _d=1 << p["levels"]):
        """Rows whose cell under the FROZEN binning differs from the
        cached assignment — the engine's own binning formula, evaluable
        BEFORE a force so adaptive stepping can re-sort preemptively
        (ops/integrator.make_adaptive_multi_step)."""
        cs = jnp.clip(
            ((psort[:, :3] - meta.lo) / meta.cell).astype(jnp.int32),
            0, _d - 1,
        )
        ids_now = (cs[:, 0] * _d + cs[:, 1]) * _d + cs[:, 2]
        return jnp.sum((ids_now != meta.ids).astype(jnp.int32))

    sorted_force_fn.stale_count = stale_count
    sorted_force_fn.with_meta = with_meta
    sorted_force_fn.frozen = frozen
    return sorted_force_fn


# ---------------------------------------------------------------------------
# Verification helpers (reference: verifyTreeStructure/verifyMassConservation,
# force_barnes_hut.cu:505-519)
# ---------------------------------------------------------------------------


def verify_mass_conservation(pyr: Pyramid, total_mass: float, tol=1e-3) -> bool:
    """Every pyramid level must sum to the total mass."""
    for m in pyr.masses:
        if abs(float(m.sum()) - total_mass) > tol * max(abs(total_mass), 1.0):
            return False
    return True


def verify_pyramid_structure(pyr: Pyramid) -> bool:
    """Parent mass equals the sum of its 8 children at every level."""
    for lvl in range(len(pyr.masses) - 1):
        parent = pyr.masses[lvl]
        child = pyr.masses[lvl + 1]
        dm = parent.shape[0]
        agg = child.reshape(dm, 2, dm, 2, dm, 2).sum(axis=(1, 3, 5))
        if not np.allclose(np.asarray(parent), np.asarray(agg), rtol=1e-4):
            return False
    return True
