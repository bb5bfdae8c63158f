"""TPU probe r5c — bisect the table-vs-row force divergence (r5b e1/e3).

r5b established the divergence is a deterministic operator difference,
linear in mass (violent and gentle diffs are the same field scaled by
1/N), max ~147x |a|max, touching every row. This probe compares the two
pipelines PHASE BY PHASE at the same drifted positions:

  s1 ids/order      same binning? same tie-breaking? same overflow SET?
  s2 tiles          per-cell [m, m*x, m*y, m*z] sums (slot-permutation
                    invariant) + raw bit compare
  s3 moments        packed finest moments
  s4 far_plane      far-field expansion grids
  s5 near-only acc  sweep without far seeding, per-row, orig order
  s6 full acc       per-row, orig order; top-diff row attribution

Usage: python scripts/profile_r5c.py
"""

import sys

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
DT = 1e-3
LEVELS = 6
D = 1 << LEVELS
K = 16


def stat(tag, a, b):
    d = jnp.abs(a - b)
    print(
        f"{tag}: max|d|={float(d.max()):.3e} "
        f"mean|d|={float(d.mean()):.3e} "
        f"ref_max={float(jnp.abs(a).max()):.3e} "
        f"bit_eq={bool(jnp.all(a == b))}",
        flush=True,
    )


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
    )
    from nbody_tpu.ops.forces import make_sorted_force_fn
    from nbody_tpu.ops.integrator import initialize_forces
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas_plane
    from nbody_tpu.ops.sorted_window import build_sorted_grid, sorted_ranks
    from nbody_tpu.ops.table_step import (
        TableParams,
        _bin_ids,
        _chunk_bookkeeping,
        _relayout_plane,
        bh_table_params,
    )
    from nbody_tpu.ops.tile_sweep import (
        _slot_pickup_raw,
        tile_build_pallas,
    )
    from nbody_tpu.types import (
        ForceMethod,
        SimulationConfig,
        SphericalDistParams,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    cfg = SimulationConfig(
        particle_count=N, force_method=ForceMethod.BARNES_HUT,
        bh_max_level=LEVELS, dt=DT,
    )
    p = bh_table_params(levels=LEVELS, near_k=K)
    eps, G, ws = p.softening, p.G, p.ws

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    sf0 = make_sorted_force_fn(cfg, pos_hint=state.pos)
    state = jax.jit(
        lambda s: initialize_forces(s, lambda po, m: sf0(po, m)[0][
            jnp.argsort(sf0(po, m)[2])])
    )(state)

    # identical drift on both paths (r5b e1: pos bit-equal)
    @jax.jit
    def drift(s):
        pos_d = s.pos + s.vel * DT + (0.5 * DT * DT) * s.acc
        return pos_d

    pos_d = drift(state)
    mass = state.mass
    _ = float(jnp.sum(pos_d))  # warm readback

    # ---------------- production pipeline, staged -----------------
    @jax.jit
    def prod_stage(pos, mass):
        lo, cell = pyramid_geometry(
            jnp.min(pos, axis=0), jnp.max(pos, axis=0), LEVELS)
        coords = jnp.clip(((pos - lo) / cell).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(
            pos, mass, coords, D, with_cell_start=False, with_csort=False)
        tb = tile_build_pallas(
            grid, lo, cell, d=D, k=K, impl="pallas", with_moments=True)
        packed = tb.moments[:10].T.reshape(D, D, D, 10)
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        a_far, j_far, h_far = far_field_grid(
            pyr, ws, 1.0, eps, LEVELS, impl="pallas")
        parts = [a_far, j_far] + ([h_far] if h_far is not None else [])
        packed_g = jnp.concatenate(parts, axis=-1)
        far_plane = packed_g.reshape(
            D, D * D, packed_g.shape[-1]).transpose(0, 2, 1)
        raw = tile_sweep_pallas_plane(
            tb.tiles_plane, k=K, d=D, ws=ws, eps=eps,
            far_plane=far_plane, lo=lo, cell=cell)
        far_a = far_plane[:, 0:3, :].transpose(0, 2, 1).reshape(D**3, 3)
        acc = _slot_pickup_raw(
            raw, grid, grid.ids, tb.rank_sorted, D, K, N, G,
            sorted_output=False, overflow_rows=far_a)
        raw_near = tile_sweep_pallas_plane(
            tb.tiles_plane, k=K, d=D, ws=ws, eps=eps)
        acc_near = _slot_pickup_raw(
            raw_near, grid, grid.ids, tb.rank_sorted, D, K, N, G,
            sorted_output=False, overflow_rows=None)
        return dict(
            lo=lo, cell=cell, ids_s=grid.ids, order=grid.order,
            rank=tb.rank_sorted, tiles=tb.tiles_plane,
            moments=tb.moments, far_plane=far_plane, acc=acc,
            acc_near=acc_near,
        )

    pr = prod_stage(pos_d, mass)
    _ = float(jnp.sum(pr["acc"]))
    print("prod staged done", flush=True)

    # ---------------- table pipeline, staged -----------------------
    @jax.jit
    def tab_stage(pos, mass):
        lo, cell = pyramid_geometry(
            jnp.min(pos, axis=0), jnp.max(pos, axis=0), LEVELS)
        rows = jnp.concatenate(
            [pos, mass[:, None],
             jnp.zeros((N, 3), pos.dtype),
             jnp.arange(N, dtype=pos.dtype)[:, None]], axis=-1)
        ids = _bin_ids(rows[:, 0:3], lo, cell, p)
        order = jnp.argsort(ids).astype(jnp.int32)
        pay = rows[order]
        ids_s = ids[order]
        rank_s = sorted_ranks(ids_s)
        bk = _chunk_bookkeeping(ids_s, rank_s, p)
        tiles6, moments = monotone_scatter_tiles(
            pay[:, 0:4], bk["dest"], bk["starts"], lo, cell,
            k=K, d=D, r=bk["r"], w=bk["w"], q=bk["q"],
            nonempty=bk["nonempty"], nwin=bk["nwin"],
            interpret=False, with_moments=True, cell_ids=ids_s,
            with_coverage=True,
        )
        plane6 = _relayout_plane(tiles6, 6, p, bk["g"])
        pos_t = plane6[:, 0:4]
        cov_t = plane6[:, 5:6]
        packed = moments[:10].T.reshape(D, D, D, 10)
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        a_far, j_far, h_far = far_field_grid(
            pyr, ws, 1.0, eps, LEVELS, impl="pallas")
        parts = [a_far, j_far] + ([h_far] if h_far is not None else [])
        packed_g = jnp.concatenate(parts, axis=-1)
        far_plane = packed_g.reshape(
            D, D * D, packed_g.shape[-1]).transpose(0, 2, 1)
        raw = tile_sweep_pallas_plane(
            pos_t, k=K, d=D, ws=ws, eps=eps, chunk=p.chunk,
            far_plane=far_plane, lo=lo, cell=cell)
        far_a = far_plane[:, 0:3, :].transpose(0, 2, 1).reshape(D**3, 3)
        # production pickup applied to the TABLE sweep output (same
        # grid-free pickup math as table extraction, but via the
        # well-tested path): isolates extraction bugs from sweep bugs.
        class _G:
            pass

        acc_t = G * (cov_t * raw)
        raw_near = tile_sweep_pallas_plane(
            pos_t, k=K, d=D, ws=ws, eps=eps, chunk=p.chunk)
        # per-row pickup from table layout: slot index = ids*k + rank
        def pick(acc_t):
            l = D * D
            L = acc_t.shape[-1]
            a = acc_t if L == l else acc_t[:, :, :, :l]
            a = (a.reshape(D, 3, K, D, D)
                 .transpose(0, 3, 4, 2, 1).reshape(D**3 * K, 3))
            idx = jnp.where(rank_s < K, ids_s * K + rank_s, 0)
            acc_sorted = jnp.where(
                (rank_s < K)[:, None], a[idx], far_a[ids_s] * G)
            inv = jnp.argsort(order)
            return acc_sorted[inv]

        acc = pick(acc_t)
        acc_near = pick(G * (cov_t * raw_near))
        return dict(
            lo=lo, cell=cell, ids_s=ids_s, order=order, rank=rank_s,
            pos_t=pos_t, cov_t=cov_t, moments=moments,
            far_plane=far_plane, acc=acc, acc_near=acc_near,
        )

    tb_ = tab_stage(pos_d, mass)
    _ = float(jnp.sum(tb_["acc"]))
    print("table staged done", flush=True)

    # ---------------- comparisons ---------------------------------
    stat("s0 lo", pr["lo"], tb_["lo"])
    stat("s0 cell", pr["cell"], tb_["cell"])
    n_ids = int(jnp.sum(pr["ids_s"] != tb_["ids_s"]))
    n_ord = int(jnp.sum(pr["order"] != tb_["order"]))
    n_rank = int(jnp.sum(pr["rank"] != tb_["rank"]))
    print(f"s1 ids_s diffs={n_ids} order diffs={n_ord} "
          f"rank diffs={n_rank}", flush=True)
    # overflow SET comparison (original row indices dropped from near)
    drop_p = np.sort(np.asarray(pr["order"])[np.asarray(pr["rank"]) >= K])
    drop_t = np.sort(np.asarray(tb_["order"])[np.asarray(tb_["rank"]) >= K])
    same_set = (drop_p.shape == drop_t.shape) and bool(
        np.all(drop_p == drop_t))
    print(f"s1 dropped rows: prod={drop_p.size} table={drop_t.size} "
          f"same_set={same_set}", flush=True)

    # s2: per-cell slot sums (slot-permutation invariant)
    l = D * D

    @jax.jit
    def cellsum(t4):  # (D, 4, K, lanes>=l) -> (D, 4, l) mass-weighted
        t = t4[:, :, :, :l]
        m = t[:, 3:4]
        return jnp.concatenate(
            [m.sum(axis=2), (m * t[:, 0:3]).sum(axis=2)], axis=1)

    stat("s2 cell sums", cellsum(pr["tiles"]),
         cellsum(tb_["pos_t"]))
    stat("s2 tiles raw", pr["tiles"],
         tb_["pos_t"][:, :, :, :l])
    stat("s3 moments", pr["moments"], tb_["moments"][:11])
    stat("s4 far_plane", pr["far_plane"], tb_["far_plane"])
    stat("s5 acc near", pr["acc_near"], tb_["acc_near"])
    stat("s6 acc full", pr["acc"], tb_["acc"])

    # attribution of worst rows
    da = np.asarray(jnp.abs(pr["acc"] - tb_["acc"]).max(axis=1))
    worst = np.argsort(da)[-10:][::-1]
    ids_np = np.zeros(N, np.int64)
    ids_np[np.asarray(pr["order"])] = np.asarray(pr["ids_s"])
    rank_np = np.zeros(N, np.int64)
    rank_np[np.asarray(pr["order"])] = np.asarray(pr["rank"])
    for w in worst:
        print(f"  row {w}: |dacc|={da[w]:.3e} cell={ids_np[w]} "
              f"rank={rank_np[w]}", flush=True)


if __name__ == "__main__":
    main()
