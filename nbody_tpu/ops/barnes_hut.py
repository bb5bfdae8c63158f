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


def theta_to_ws(theta: float, max_ws: int = 16) -> int:
    """Map the BH opening angle θ to the well-separation width ws.

    Accepted cells have a gap of ≥ ws cells, so the effective opening
    angle s/d ≤ 1/ws ≤ θ. θ ≤ 1/max_ws clamps (cost grows as 1/θ³,
    exactly like classic BH).
    """
    if theta <= 0:
        return max_ws
    return max(1, min(max_ws, math.ceil(1.0 / theta)))


# ---------------------------------------------------------------------------
# Pyramid build (reference: bottom-up COM pass, force_barnes_hut.cu:438-486)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Pyramid:
    """Multipole grids per level: masses[ℓ] is (2^ℓ)³, msums[ℓ] is (2^ℓ)³×3.

    ``lo``/``cell`` define the finest-level geometry: a cube anchored at
    ``lo`` with finest cell edge ``cell`` (equal on all axes).
    """

    masses: tuple
    msums: tuple
    lo: jax.Array
    cell: jax.Array


def build_pyramid(pos: jax.Array, mass: jax.Array, levels: int) -> Pyramid:
    """Scatter-add the finest level, then 2× reductions up to the root."""
    d = 1 << levels
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    cube = jnp.maximum(jnp.max(hi - lo), 1e-6) * (1.0 + 1e-5)
    cell = cube / d
    coords = jnp.clip(((pos - lo) / cell).astype(jnp.int32), 0, d - 1)

    m_fine = jnp.zeros((d, d, d), pos.dtype).at[
        coords[:, 0], coords[:, 1], coords[:, 2]
    ].add(mass)
    s_fine = jnp.zeros((d, d, d, 3), pos.dtype).at[
        coords[:, 0], coords[:, 1], coords[:, 2]
    ].add(mass[:, None] * pos)

    masses = [m_fine]
    msums = [s_fine]
    for _ in range(levels):
        dm = masses[-1].shape[0] // 2
        masses.append(
            masses[-1].reshape(dm, 2, dm, 2, dm, 2).sum(axis=(1, 3, 5))
        )
        msums.append(
            msums[-1].reshape(dm, 2, dm, 2, dm, 2, 3).sum(axis=(1, 3, 5))
        )
    masses.reverse()
    msums.reverse()
    return Pyramid(tuple(masses), tuple(msums), lo, cell)


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


def far_field_grid(
    pyr: Pyramid, ws: int, G: float, eps: float, levels: int
):
    """Far field as an ORDER-1 LOCAL EXPANSION per finest cell.

    Returns (A, J6): acceleration (d,d,d,3) and its SYMMETRIC Jacobian in
    6-component form (d,d,d,6) ordered [xx, yy, zz, xy, xz, yz], both about
    cell centers. Each level's accepted monopoles contribute a += w·d and
    ∇a = w·(3·d⊗d/(r²+ε²) − I); the downward pass translates the expansion
    to child centers EXACTLY (A_child = A + J·δ, J_child = J) — no
    interpolation between cells with different source sets (the FMM
    local-expansion trick; a piecewise-constant inheritance would leave an
    O(θ) target-discretization error). Particles evaluate
    a(x) = A[c] + J[c]·(x − center_c).

    Layout: all per-level sweeps run with the flattened cell axis LAST
    (the TPU lane dimension) and the tiny child/component axes leading —
    (8, c, P³) — so the VPU runs at full lane utilization. The 8×8 child
    pairs are a static Python loop; per-pair acceptance is one scalar
    multiply from the precomputed mask table.
    """
    po_np, accept_np = _window_offsets_and_masks(ws)
    po_all = jnp.asarray(po_np + ws)  # slice starts into the padded grid
    accept_f = jnp.asarray(accept_np.astype(np.float32))
    kids = np.array(
        [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.int32
    )
    dtype = pyr.masses[0].dtype

    acc = None  # (dl, dl, dl, 3) expansion value at the previous level
    jac = None  # (dl, dl, dl, 6) symmetric expansion gradient
    for lvl in range(1, levels + 1):
        dl = 1 << lvl
        p = dl // 2
        pc = p * p * p
        s_l = pyr.cell * (1 << (levels - lvl))  # cell edge at this level

        # Child-major grids with cells flattened on lanes:
        # m: (8, p, p, p) padded; s: (8, 3, p, p, p) padded.
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
        pad3 = [(ws, ws), (ws, ws), (ws, ws)]
        m_pad = jnp.pad(m, [(0, 0)] + pad3)
        s_pad = jnp.pad(s, [(0, 0), (0, 0)] + pad3)

        # Target child-cell centers: (8, 3, p³)
        q = jnp.stack(
            jnp.meshgrid(
                jnp.arange(p), jnp.arange(p), jnp.arange(p), indexing="ij"
            ),
            axis=0,
        ).astype(dtype).reshape(3, pc)
        centers = (
            pyr.lo.reshape(3, 1)
            + (2.0 * q[None, :, :] + jnp.asarray(kids, dtype)[:, :, None] + 0.5)
            * s_l
        )  # (8, 3, p³)

        eps2 = eps * eps

        def body(carry, x, m_pad=m_pad, s_pad=s_pad, centers=centers,
                 p=p, pc=pc):
            po, acc_tab = x  # (3,), (8, 8) float mask
            zero = jnp.zeros((), po.dtype)
            msrc = jax.lax.dynamic_slice(
                m_pad, (zero, po[0], po[1], po[2]), (8, p, p, p)
            ).reshape(8, pc)
            ssrc = jax.lax.dynamic_slice(
                s_pad, (zero, zero, po[0], po[1], po[2]), (8, 3, p, p, p)
            ).reshape(8, 3, pc)
            inv_m = 1.0 / jnp.maximum(msrc, 1e-30)   # (8, pc)
            comx = ssrc[:, 0] * inv_m                # (8, pc) — ks on sublanes
            comy = ssrc[:, 1] * inv_m
            comz = ssrc[:, 2] * inv_m
            out_a, out_j = carry
            a_rows = []
            j_rows = []
            for kt in range(8):
                dx = comx - centers[kt, 0]           # (8, pc)
                dy = comy - centers[kt, 1]
                dz = comz - centers[kt, 2]
                r2 = dx * dx + dy * dy + dz * dz + eps2
                inv = jax.lax.rsqrt(r2)
                inv2 = inv * inv
                # empty cells: m = 0 ⇒ w = 0 (no NaNs: r2 ≥ ε²); acceptance
                # is one broadcast multiply from the (8,) mask column.
                w = (msrc * acc_tab[kt][:, None]) * (inv2 * inv)
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
        if acc is not None:
            # exact order-1 expansion translation to child centers:
            # A_child = A_parent + J_parent·δ_k, J_child = J_parent,
            # where δ_k = (k − ½)·s_child per axis (8 static offsets).
            s_child = s_l
            a_rep = jnp.repeat(
                jnp.repeat(jnp.repeat(acc, 2, 0), 2, 1), 2, 2
            )
            j_rep = jnp.repeat(
                jnp.repeat(jnp.repeat(jac, 2, 0), 2, 1), 2, 2
            )
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
        acc = acc_lvl
        jac = jac_lvl

    return G * acc, G * jac


def sym_matvec(j6: jax.Array, v: jax.Array) -> jax.Array:
    """(…, 6) symmetric matrix [xx,yy,zz,xy,xz,yz] times (…, 3) vector."""
    jx = j6[..., 0] * v[..., 0] + j6[..., 3] * v[..., 1] + j6[..., 4] * v[..., 2]
    jy = j6[..., 3] * v[..., 0] + j6[..., 1] * v[..., 1] + j6[..., 5] * v[..., 2]
    jz = j6[..., 4] * v[..., 0] + j6[..., 5] * v[..., 1] + j6[..., 2] * v[..., 2]
    return jnp.stack([jx, jy, jz], axis=-1)


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
    eps2 = eps * eps

    def pair_weight(r2_raw, mj):
        inv = jax.lax.rsqrt(r2_raw + eps2)
        return mj * inv * inv * inv

    acc, overflow = window_sweep(
        grid,
        d=d,
        xy_offsets=xy_ball(ws),
        z_halfwidth=ws,
        pair_weight=pair_weight,
        window=window,
        block_size=block_size,
    )
    return G * acc, overflow, coords


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


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
    ),
)
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
):
    """Full BH acceleration: pyramid far field + exact near field.

    near_engine: "tiles" (dense cell tiles — optimal at the low per-cell
    occupancy the BH finest level is sized for) or "window" (sorted-window
    sweep — for unusually dense scenes; raise ``window`` until its overflow
    reads 0). ``near_k`` is the tiles-engine per-cell slot cap.
    """
    ws = theta_to_ws(theta)
    pyr = build_pyramid(pos, mass, levels)
    a_far, j_far = far_field_grid(pyr, ws, G, softening, levels)
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
        )
    else:
        a_near, _over, coords = _near_field(
            pos, mass, pyr.lo, pyr.cell, G, softening, ws, levels, window
        )
    # Evaluate the local expansion at the particle: a(x) = A[c] + J[c]·(x−ctr)
    # — ONE packed gather per particle (A3 + J6 contiguous).
    centers = pyr.lo + (coords.astype(pos.dtype) + 0.5) * pyr.cell
    packed = jnp.concatenate([a_far, j_far], axis=-1)  # (d, d, d, 9)
    vals = packed[coords[:, 0], coords[:, 1], coords[:, 2]]  # (N, 9)
    pick = vals[:, :3] + sym_matvec(vals[:, 3:9], pos - centers)
    return a_near + pick


def make_barnes_hut_forces(config: SimulationConfig):
    """Strategy factory (reference: BarnesHutCalculator,
    force_barnes_hut.cu:522-533)."""
    G = config.G
    eps = config.softening
    theta = config.barnes_hut_theta
    levels = config.bh_max_level
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

    def force_fn(pos, mass):
        return barnes_hut_forces(
            pos,
            mass,
            G,
            eps,
            theta,
            levels=levels,
            window=window,
            near_engine=near_engine,
            near_k=near_k,
        )

    return force_fn


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
