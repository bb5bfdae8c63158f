"""TPU profile r3w — post-revert sanity + payload-8 + pickup-kernel prep.

  w0  ctrl: sorted BH force (expect ~31.3 — post-revert sanity)
  w1  engine payload widened to 8 cols (pos,mass,vel3,tag — ids column
      DROPPED, sorted ids recomputed from sorted positions): measures
      whether the retiling cliff sits at >8 columns, which would let the
      integrator payload ride the engine gather after all
  w2  (3, N) -> (N, 3) transpose cost at 1M (the pickup kernel would
      emit channel-major)
  w3  scatter build w_win A/B: 512 / 640 / 768 at 1M
  w4  official bh-1m bench flow (expect ~27.0 post-revert)

Usage: python scripts/profile_r3w.py
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
DT = 1e-3


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
        print(f"{name:58s} {best / reps * 1000:8.2f} ms/iter "
              f"(chk {chk:.4e})", flush=True)
        return best / reps
    except Exception as e:  # noqa: BLE001
        print(f"{name:58s} FAILED: {type(e).__name__}: {str(e)[:300]}",
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
    from nbody_tpu.models.distributions import init_spherical
    from nbody_tpu.ops.barnes_hut import (
        barnes_hut_forces_sorted,
        pyramid_geometry,
    )
    from nbody_tpu.ops.sorted_window import build_sorted_grid
    from nbody_tpu.ops.tile_sweep import tile_build_pallas
    from nbody_tpu.types import SphericalDistParams

    print(f"backend={jax.default_backend()}", flush=True)

    state = init_spherical(
        jax.random.PRNGKey(42), N, SphericalDistParams(radius=10.0))
    pos0 = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    vel0 = jnp.zeros_like(pos0)
    jax.block_until_ready((pos0, mass))

    bench("w0 ctrl sorted BH force", mk(
        lambda p: barnes_hut_forces_sorted(
            p, mass, G, EPS, THETA, levels=LEVELS, near_k=K,
            multipole_order=2, near_impl="pallas")[0], pos0))

    def rung_payload8(p):
        """8-col payload [pos3|mass|vel3|tag], ids column dropped;
        sorted ids recomputed from sorted positions."""
        lo, cell = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
        ids = ((coords[:, 0] * D + coords[:, 1]) * D
               + coords[:, 2]).astype(jnp.int32)
        order = jnp.argsort(ids).astype(jnp.int32)
        tagf = jnp.arange(N, dtype=jnp.float32)[:, None]
        payload = jnp.concatenate(
            [p, mass[:, None], vel0, tagf], axis=-1)[order]
        psort = payload[:, :4]
        cs = jnp.clip(((psort[:, :3] - lo) / cell).astype(jnp.int32),
                      0, D - 1)
        sorted_ids = (cs[:, 0] * D + cs[:, 1]) * D + cs[:, 2]
        return psort, sorted_ids, payload[:, 4:]

    bench("w1 8-col payload sort (ids recomputed)", mk(rung_payload8, pos0))

    def rung_payload5(p):
        """Control: the production 5-col payload + separate (N,4) pay
        gather — the form w1 would replace."""
        lo, cell = pyramid_geometry(
            jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
        coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
        grid = build_sorted_grid(
            p, mass, coords, D, with_cell_start=False, with_csort=False)
        tagf = jnp.arange(N, dtype=jnp.float32)[:, None]
        pay = jnp.concatenate([vel0, tagf], axis=-1)[grid.order]
        return grid.psort, grid.ids, pay

    bench("w1c ctrl 5-col payload + separate pay gather",
          mk(rung_payload5, pos0))

    accT = jnp.ones((3, N), jnp.float32)

    def rung_transpose(p):
        a = accT * (1 + p[0, 0] * 1e-30)
        return a.T + p  # force the (N, 3) layout to be consumed

    bench("w2 (3,N)->(N,3) transpose at 1M", mk(rung_transpose, pos0))

    def mk_build(w):
        def rung(p):
            lo, cell = pyramid_geometry(
                jnp.min(p, axis=0), jnp.max(p, axis=0), LEVELS)
            coords = jnp.clip(((p - lo) / cell).astype(jnp.int32), 0, D - 1)
            grid = build_sorted_grid(
                p, mass, coords, D, with_cell_start=False, with_csort=False)
            tb = tile_build_pallas(
                grid, lo, cell, d=D, k=K, impl="pallas",
                with_moments=True, build_window=w)
            return tb.tiles_plane
        return rung

    for w in (512, 640, 768):
        bench(f"w3 sort+scatter build, w_win={w}", mk(mk_build(w), pos0))

    # w4: official flow
    import runpy
    sys.argv = ["bench_matrix.py", "bh-1m"]
    runpy.run_path("/root/repo/scripts/bench_matrix.py", run_name="__main__")


if __name__ == "__main__":
    main()
