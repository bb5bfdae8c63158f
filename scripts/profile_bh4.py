"""TPU profile round 4: split build phases + far-field tap-matmul candidate.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_bh4.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPS = 5
LEVELS = 6
D = 1 << LEVELS
K = 16


def bench(name, make_body, reps=REPS):
    body, init = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    try:
        c = run(init)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        c = run(init)
        leaf = jax.tree_util.tree_leaves(c)[0]
        chk = float(jnp.sum(leaf))
        dt = time.perf_counter() - t0
        print(f"{name:44s} {dt / reps * 1000:8.1f} ms/iter  (chk {chk:.4e})",
              flush=True)
        return dt / reps
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


def main():
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import build_pyramid
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()} N={N} L={LEVELS} K={K}",
          flush=True)
    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0)
    )
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    jax.block_until_ready(pos0)

    lo = jnp.min(pos0, axis=0)
    hi = jnp.max(pos0, axis=0)
    cube = jnp.maximum(jnp.max(hi - lo), 1e-6) * (1.0 + 1e-5)
    cell = cube / D

    def mk_argsort():
        coords = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)
        ids = (coords[:, 0] * D + coords[:, 1]) * D + coords[:, 2]

        def body(c, _):
            order = jnp.argsort(ids + c[0])
            return order * 0 + order, None
        return body, jnp.zeros((N,), jnp.int32)

    def mk_sortedgrid():
        coords = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)

        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            g = build_sorted_grid(p, mass, coords, D)
            return g.psort[:, :3], None
        return body, jnp.zeros((N, 3))

    def mk_tiles():
        """sorted grid + tile scatter (no sweep)."""
        coords = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)
        cgrid = jnp.stack(
            jnp.meshgrid(jnp.arange(D), jnp.arange(D), jnp.arange(D),
                         indexing="ij"), axis=-1,
        ).astype(pos0.dtype)
        centers = lo + (cgrid + 0.5) * cell
        nc = D * D * D

        def body(c, _):
            p = pos0 * (1 + c[0, 0] * 1e-30)
            g = build_sorted_grid(p, mass, coords, D)
            ids_sorted = (g.csort[:, 0] * D + g.csort[:, 1]) * D + g.csort[:, 2]
            ar = jnp.arange(N, dtype=jnp.int32)
            rank = ar - g.cell_start[ids_sorted]
            flat = ids_sorted * (K + 1) + jnp.minimum(rank, K)
            init = jnp.concatenate(
                [jnp.broadcast_to(centers[:, :, :, None, :], (D, D, D, K + 1, 3)),
                 jnp.zeros((D, D, D, K + 1, 1), p.dtype)], axis=-1,
            ).reshape(nc * (K + 1), 4)
            tiles = init.at[flat].set(g.psort).reshape(D, D, D, K + 1, 4)
            return tiles[:, :, :, 0, :3].reshape(nc, 3), None
        return body, jnp.zeros((D**3, 3))

    def mk_moments_from_tiles():
        """tiles assumed built: dense slot reduction -> 10-channel moments."""
        coords = jnp.clip(((pos0 - lo) / cell).astype(jnp.int32), 0, D - 1)
        g = build_sorted_grid(pos0, mass, coords, D)
        ids_sorted = (g.csort[:, 0] * D + g.csort[:, 1]) * D + g.csort[:, 2]
        ar = jnp.arange(N, dtype=jnp.int32)
        rank = ar - g.cell_start[ids_sorted]
        flat = ids_sorted * (K + 1) + jnp.minimum(rank, K)
        cgrid = jnp.stack(
            jnp.meshgrid(jnp.arange(D), jnp.arange(D), jnp.arange(D),
                         indexing="ij"), axis=-1,
        ).astype(pos0.dtype)
        centers = lo + (cgrid + 0.5) * cell
        nc = D * D * D
        init = jnp.concatenate(
            [jnp.broadcast_to(centers[:, :, :, None, :], (D, D, D, K + 1, 3)),
             jnp.zeros((D, D, D, K + 1, 1), pos0.dtype)], axis=-1,
        ).reshape(nc * (K + 1), 4)
        tiles = init.at[flat].set(g.psort).reshape(D, D, D, K + 1, 4)[
            :, :, :, :K, :]
        tiles = jax.device_put(tiles)

        def body(c, _):
            t = tiles * (1 + c * 1e-30)
            xr = t[..., :3] - centers[:, :, :, None, :]
            m = t[..., 3]
            mono = m.sum(-1)
            s = (m[..., None] * xr).sum(-2)
            x, y, z = xr[..., 0], xr[..., 1], xr[..., 2]
            q = jnp.stack(
                [(m * x * x).sum(-1), (m * y * y).sum(-1), (m * z * z).sum(-1),
                 (m * x * y).sum(-1), (m * x * z).sum(-1), (m * y * z).sum(-1)],
                axis=-1)
            return c * 0 + jnp.sum(mono) + jnp.sum(s) + jnp.sum(q), None
        return body, jnp.zeros(())

    def mk_far_taps(ws):
        """far field via per-tap (152,80)@(80,P) dot_generals, all levels."""
        import numpy as np
        from nbody_tpu.ops.barnes_hut import (
            _conv_taps_kernel, _window_offsets_and_masks)

        pyr = build_pyramid(pos0, mass, LEVELS, order=2)
        po_np, accept_np = _window_offsets_and_masks(ws)
        kids = np.array([(x, y, z) for x in (0, 1) for y in (0, 1)
                         for z in (0, 1)], np.int32)
        delta_int = (2 * po_np[:, None, None, :] + kids[None, None, :, :]
                     - kids[None, :, None, :])
        T = po_np.shape[0]
        w1 = 2 * ws + 1

        def far_all(pyr2):
            acc_tot = None
            for lvl in range(1, LEVELS + 1):
                dl = 1 << lvl
                p = dl // 2
                pc = p * p * p
                s_l = cell * (1 << (LEVELS - lvl))
                dvec = jnp.asarray(
                    delta_int.reshape(T * 64, 3), pos0.dtype) * s_l
                Kt = _conv_taps_kernel(dvec, 0.1)  # (T*64,19,10)
                msk = jnp.asarray(
                    accept_np.astype(np.float32).reshape(T * 64))
                Kt = (Kt * msk[:, None, None]).reshape(T, 8, 8, 19, 10)
                # taps (T,8t,8s,19,10) -> per tap offset: (8t*19, 8s*10)
                tap_mat = Kt.transpose(0, 1, 3, 2, 4).reshape(
                    T, 8 * 19, 8 * 10)

                def cm(x, c):
                    return (x.reshape(p, 2, p, 2, p, 2, c)
                            .transpose(1, 3, 5, 6, 0, 2, 4)
                            .reshape(8 * c, p, p, p))

                mom = jnp.concatenate(
                    [cm(pyr2.masses[lvl][..., None], 1),
                     cm(pyr2.srels[lvl], 3), cm(pyr2.quads[lvl], 6)],
                    axis=0)  # (80, p,p,p)
                mom_pad = jnp.pad(
                    mom, [(0, 0), (ws, ws), (ws, ws), (ws, ws)])

                def tap_body(acc, i):
                    off = jnp.asarray(po_np + ws)[i]
                    src = jax.lax.dynamic_slice(
                        mom_pad, (jnp.zeros((), off.dtype), off[0], off[1],
                                  off[2]), (80, p, p, p)).reshape(80, pc)
                    out = jax.lax.dot_general(
                        tap_mat[i], src, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=pos0.dtype)
                    return acc + out, None

                acc0 = jnp.zeros((152, pc), pos0.dtype)
                acc, _ = jax.lax.scan(
                    tap_body, acc0, jnp.arange(T, dtype=jnp.int32))
                acc_tot = (acc_tot + jnp.sum(acc)) if acc_tot is not None \
                    else jnp.sum(acc)
            return acc_tot

        def body(c, _):
            pyr2 = jax.tree.map(
                lambda x: x * (1 + c * 1e-30) if x.ndim >= 3 else x, pyr)
            return c * 0 + far_all(pyr2), None
        return body, jnp.zeros(())

    bench("argsort 1M int32", mk_argsort)
    bench("build_sorted_grid (sort+gather+cummin)", mk_sortedgrid)
    bench("sorted grid + tile scatter", mk_tiles)
    bench("moments from tiles (dense reduction)", mk_moments_from_tiles)
    bench("far field tap-matmul ws=1 all levels", lambda: mk_far_taps(1))


if __name__ == "__main__":
    main()
