"""TPU profile r3o — full bisection of the 72.3 ms sorted BH step.

Fresh r3l rerun (post far-folding, 2026-08-18): grid 9.4 · grid+near
40.4 · grid+far 27.6 · full force 63.3 · full step 72.3. So: near engine
31.0, far chain 18.2, glue ~9.0. But r3i-era pieces summed to only ~22
for the near chain — where is the rest?

Rows (all honest sum-readbacks, min of 3 timed scans of REPS):
  n1  grid + scatter PREP (rank/overflow/dest/starts/nwin)
  n2  n1 + monotone_scatter_tiles
  n3  n2 + relayout transpose to plane-major
  n4  n3 + sweep (no far seed)
  n4f n3 + sweep with a CONSTANT far_plane (kernel far math cost)
  n5  full tile_near_field sorted (control ≈ 31 + grid)
  f1  grid + moments (segment sum)
  f2  f1 + pyramid_from_packed
  f3  f2 + far taps HIGHEST (control ≈ 27.6)
  fH  f2 + far taps HIGH
  fD  f2 + far taps DEFAULT
  g1  sorted verlet glue (dummy passthrough force)
  s0  full sorted step (control ≈ 72.3)
  sD  full sorted step, far taps DEFAULT (via env toggle — skipped here;
      measured from the composed pieces instead)

Accuracy rows (vs direct N² at 65536 particles, same scene):
  rel-RMS force error for taps HIGHEST / HIGH / DEFAULT.

Usage: python scripts/profile_r3o.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 1_000_000
REPS = 10
LEVELS = 6
D = 1 << LEVELS
G = 1.0
EPS = 0.1
THETA = 0.5
K = 16


def bench(name, make_body, reps=REPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    def sync(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return float(jnp.sum(leaf))

    try:
        chk = sync(run(init))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(init))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:52s} {best / reps * 1000:8.2f} ms/iter "
              f"(chk {chk:.4e})", flush=True)
        return best / reps
    except Exception as e:
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def mk(rung, ref):
    def make():
        def body(c, _):
            p = ref * (1 + c[0] * 1e-30)
            out = rung(p)
            s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
            return jnp.full((8,), s * 1e-30), None
        return body, jnp.zeros((8,))
    return make


def main():
    import math

    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        _sorted_finest_moments,
        barnes_hut_forces_sorted,
        far_field_grid,
        pyramid_from_packed,
        pyramid_geometry,
        theta_to_ws,
    )
    from nbody_tpu.ops.pallas_scatter import monotone_scatter_tiles
    from nbody_tpu.ops.pallas_tile_near import tile_sweep_pallas_plane
    from nbody_tpu.ops.sorted_window import (
        build_sorted_grid,
        use_full_cell_start,
    )
    from nbody_tpu.ops.tile_sweep import tile_near_field
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    vel0 = jax.device_put(state.vel)
    jax.block_until_ready((pos0, mass, vel0))

    ws = theta_to_ws(THETA, order=2)
    num_cells = D * D * D
    g_f = 128 // math.gcd(D * K, 128)
    r_chunk = g_f * D * K
    q_cells = r_chunk // K
    w_win = 640 if q_cells <= 64 else -(-(q_cells * 10) // 128) * 128
    m_slots = num_cells * K
    n_chunks = m_slots // r_chunk

    def rung_grid(p):
        lo, cell = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(
            p, mass, coords, D,
            with_cell_start=use_full_cell_start(num_cells),
        )
        return grid, lo, cell, coords

    def scatter_prep(grid):
        n = N
        ids_sorted = grid.ids
        rank_sorted = (
            jnp.arange(n, dtype=jnp.int32) - grid.cell_start[ids_sorted]
        )
        overflow = jnp.sum((rank_sorted >= K).astype(jnp.int32))
        dest = jnp.where(
            rank_sorted < K, ids_sorted * K + rank_sorted, 1 << 24
        )
        chunk_ar = jnp.arange(n_chunks, dtype=jnp.int32)
        c0 = (chunk_ar * r_chunk) // K
        c1 = jnp.minimum(
            ((chunk_ar + 1) * r_chunk + K - 1) // K, num_cells
        )
        starts = grid.cell_start[c0]
        ends = grid.cell_start[c1]
        span = ends - (starts // 128) * 128
        nwin = -(-span // w_win)
        return dest, starts, nwin, overflow, rank_sorted

    bench("n1 grid+prep (rank/dest/starts/nwin)",
          mk(lambda p: scatter_prep(rung_grid(p)[0])[:4], pos0))

    def rung_scatter(p):
        grid, lo, cell, coords = rung_grid(p)
        dest, starts, nwin, overflow, _ = scatter_prep(grid)
        tiles_cm = monotone_scatter_tiles(
            grid.psort, dest, starts, lo, cell,
            k=K, d=D, r=r_chunk, w=w_win, q=q_cells, nwin=nwin,
        )
        return tiles_cm, overflow

    bench("n2 n1+scatter", mk(rung_scatter, pos0))

    def relayout(tiles_cm):
        return (
            tiles_cm.reshape(4, D, D // g_f, K, g_f, D)
            .transpose(1, 0, 3, 2, 4, 5)
            .reshape(D, 4, K, D * D)
        )

    bench("n3 n2+relayout", mk(
        lambda p: (relayout(rung_scatter(p)[0]),), pos0))

    def rung_sweep(p, far_plane=None, lo_c=None):
        grid, lo, cell, coords = rung_grid(p)
        dest, starts, nwin, overflow, _ = scatter_prep(grid)
        tiles_cm = monotone_scatter_tiles(
            grid.psort, dest, starts, lo, cell,
            k=K, d=D, r=r_chunk, w=w_win, q=q_cells, nwin=nwin,
        )
        tiles_plane = relayout(tiles_cm)
        acc_raw = tile_sweep_pallas_plane(
            tiles_plane, k=K, d=D, ws=ws, eps=EPS,
            far_plane=far_plane, lo=lo, cell=cell,
        )
        return acc_raw, overflow

    bench("n4 n3+sweep (no far)", mk(rung_sweep, pos0))

    # constant far_plane for n4f: computed once outside the loop
    def make_far_const():
        grid, lo, cell, coords = rung_grid(pos0)
        ids_sorted = grid.ids
        packed = _sorted_finest_moments(grid, ids_sorted, lo, cell, D, 2)
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        a_far, j_far, h_far = far_field_grid(pyr, ws, 1.0, EPS, LEVELS)
        packed_g = jnp.concatenate([a_far, j_far, h_far], axis=-1)
        return packed_g.reshape(D, D * D, 19).transpose(0, 2, 1)

    far_const = jax.jit(make_far_const)()
    far_const.block_until_ready()

    bench("n4f n3+sweep (const far seed)",
          mk(lambda p: rung_sweep(p, far_plane=far_const), pos0))

    def rung_near(p):
        grid, lo, cell, coords = rung_grid(p)
        acc, over = tile_near_field(
            p, mass, coords, lo, cell, d=D, ws=ws, k=K, G=G, eps=EPS,
            grid=grid, impl="pallas", sorted_output=True,
        )
        return acc

    bench("n5 full tile_near_field sorted (ctrl)", mk(rung_near, pos0))

    def rung_moments(p):
        grid, lo, cell, coords = rung_grid(p)
        return _sorted_finest_moments(grid, grid.ids, lo, cell, D, 2)

    bench("f1 grid+moments", mk(rung_moments, pos0))

    def rung_pyr(p):
        grid, lo, cell, coords = rung_grid(p)
        packed = _sorted_finest_moments(grid, grid.ids, lo, cell, D, 2)
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        return pyr.masses[0], pyr.quads[-1]

    bench("f2 f1+pyramid", mk(rung_pyr, pos0))

    def rung_far(p, precision):
        grid, lo, cell, coords = rung_grid(p)
        packed = _sorted_finest_moments(grid, grid.ids, lo, cell, D, 2)
        pyr = pyramid_from_packed(packed, lo, cell, LEVELS, 2)
        return far_field_grid(pyr, ws, G, EPS, LEVELS, precision=precision)

    P = jax.lax.Precision
    bench("f3 f2+taps HIGHEST (ctrl)",
          mk(lambda p: rung_far(p, P.HIGHEST), pos0))
    bench("fH f2+taps HIGH", mk(lambda p: rung_far(p, P.HIGH), pos0))
    bench("fD f2+taps DEFAULT", mk(lambda p: rung_far(p, P.DEFAULT), pos0))

    # glue: dummy passthrough sorted force
    from nbody_tpu.ops.integrator import SortedState, sorted_verlet_step

    def dummy_force(p, m, extra):
        psort = jnp.concatenate([p, m[:, None]], axis=-1)
        order = jnp.arange(N, dtype=jnp.int32)
        return p * 1e-30, psort, order, extra

    def rung_glue(p):
        s = SortedState(
            pos=p, vel=vel0, acc=jnp.zeros_like(p), mass=mass,
            to_orig=jnp.arange(N, dtype=jnp.int32),
            time=jnp.zeros((), p.dtype),
        )
        out = sorted_verlet_step(s, dummy_force, 1e-3)
        return out.pos, out.vel

    bench("g1 verlet glue (dummy force)", mk(rung_glue, pos0))

    def sorted_force(p, m, extra):
        return barnes_hut_forces_sorted(
            p, m, G, EPS, THETA,
            levels=LEVELS, near_k=K, multipole_order=2, extra=extra,
        )

    def rung_step(p):
        s = SortedState(
            pos=p, vel=vel0, acc=jnp.zeros_like(p), mass=mass,
            to_orig=jnp.arange(N, dtype=jnp.int32),
            time=jnp.zeros((), p.dtype),
        )
        out = sorted_verlet_step(s, sorted_force, 1e-3)
        return out.pos, out.vel

    bench("s0 full sorted step (ctrl)", mk(rung_step, pos0))

    # --- accuracy: far-tap precision vs direct N² at 65536 ---
    NA = 65_536
    LA = 4
    DA = 1 << LA
    sa = init_spherical(
        jax.random.PRNGKey(7), NA, SphericalDistParams(radius=10.0))
    pa = jax.device_put(sa.pos)
    ma = jax.device_put(sa.mass)
    from nbody_tpu.ops.direct import direct_forces

    ref_acc = jax.jit(
        lambda p: direct_forces(p, ma, G, EPS)
    )(pa)
    ref_acc.block_until_ready()
    ref_norm = float(jnp.sqrt(jnp.mean(jnp.sum(ref_acc**2, -1))))

    from nbody_tpu.ops.barnes_hut import _barnes_hut_forces

    for prec, tag in ((P.HIGHEST, "HIGHEST"), (P.HIGH, "HIGH"),
                      (P.DEFAULT, "DEFAULT")):
        import nbody_tpu.ops.barnes_hut as bh

        # monkeypatch default precision via partial call of the internal
        # pipeline: reuse rung_far-style composition at small N
        def bh_force(p, precision=prec):
            lo, cell = pyramid_geometry(
                jnp.min(p, axis=0), jnp.max(p, axis=0), LA)
            coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, DA - 1)
            grid = build_sorted_grid(p, ma, coords, DA)
            packed = _sorted_finest_moments(
                grid, grid.ids, lo, cell, DA, 2)
            pyr = pyramid_from_packed(packed, lo, cell, LA, 2)
            a_far, j_far, h_far = far_field_grid(
                pyr, ws, G, EPS, LA, precision=precision)
            acc_near, over = tile_near_field(
                p, ma, coords, lo, cell, d=DA, ws=ws, k=64, G=G, eps=EPS,
                grid=grid, impl="xla",
            )
            packed_g = jnp.concatenate([a_far, j_far, h_far], axis=-1)
            cid = (coords[:, 0] * DA + coords[:, 1]) * DA + coords[:, 2]
            vals = packed_g.reshape(DA**3, 19)[cid]
            centers = lo + (coords.astype(p.dtype) + 0.5) * cell
            delta = p - centers
            from nbody_tpu.ops.barnes_hut import sym3_matvec, sym_matvec
            pick = vals[:, :3] + sym_matvec(vals[:, 3:9], delta)
            pick = pick + 0.5 * sym_matvec(
                sym3_matvec(vals[:, 9:19], delta), delta)
            return acc_near + pick

        acc = jax.jit(bh_force)(pa)
        err = float(jnp.sqrt(jnp.mean(jnp.sum((acc - ref_acc)**2, -1))))
        print(f"acc taps {tag:8s} rel-RMS force err = {err / ref_norm:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
