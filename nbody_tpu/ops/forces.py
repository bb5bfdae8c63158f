"""Force-strategy factory.

TPU-native counterpart of ``createForceCalculator``
(reference: src/cuda/force_spatial_hash.cu:380-401). Strategy-via-closure:
returns a pure ``force_fn(pos, mass) -> acc`` picked by
``config.force_method``; the returned function is traced into the caller's
jit program, so switching methods swaps XLA programs rather than virtual
dispatch (reference: include/nbody/force_calculator.hpp:36-89).
"""

from __future__ import annotations

from typing import Optional

import jax

from nbody_tpu.errors import ValidationError
from nbody_tpu.types import ForceMethod, SimulationConfig


def _use_pallas(backend: Optional[str]) -> bool:
    b = backend or jax.default_backend()
    return b == "tpu"


def make_force_fn(
    config: SimulationConfig,
    *,
    backend: Optional[str] = None,
    pos_hint=None,
):
    """Build the force function for ``config.force_method``.

    On TPU backends the hot paths use Pallas kernels; elsewhere (CPU tests)
    the pure-XLA implementations run — same math, same seams as the
    reference's CPU-reference-vs-GPU-kernel test strategy (SURVEY.md §4).

    ``pos_hint`` (optional concrete positions, used outside jit) feeds
    data-dependent engine auto-selection — today the spatial hash's
    window-vs-tiles choice (ops/spatial_hash.hash_engine_params).
    """
    method = config.force_method
    G = config.G
    eps = config.softening

    if method == ForceMethod.DIRECT_N2:
        if _use_pallas(backend):
            from nbody_tpu.ops.direct import direct_forces_pallas

            def force_fn(pos, mass):
                return direct_forces_pallas(pos, mass, G, eps)

        else:
            from nbody_tpu.ops.direct import direct_forces

            def force_fn(pos, mass):
                return direct_forces(pos, mass, G, eps)

        return force_fn

    if method == ForceMethod.BARNES_HUT:
        from nbody_tpu.ops.barnes_hut import make_barnes_hut_forces

        return make_barnes_hut_forces(config)

    if method == ForceMethod.SPATIAL_HASH:
        from nbody_tpu.ops.spatial_hash import make_spatial_hash_forces

        return make_spatial_hash_forces(config, pos_hint=pos_hint)

    raise ValidationError(f"Unknown force method: {method}")


def make_sorted_force_fn(
    config: SimulationConfig,
    *,
    backend: Optional[str] = None,
    pos_hint=None,
):
    """Sorted-pipeline force factory, or None when ``config`` has no
    sorted-contract engine.

    A sorted force returns ``(acc_sorted, psort, order)`` in its internal
    cell-sorted row order (see ops/barnes_hut.barnes_hut_forces_sorted);
    paired with ops/integrator.make_sorted_multi_step it deletes the
    per-step unsort gather (~13 ms at 1M). The Barnes-Hut tiles/pallas
    engine and BOTH spatial-hash engines (tiles, window) implement the
    contract; direct N² returns None (its row order never changes, so
    sorted stepping would only add gathers) and callers use
    ``make_force_fn`` + plain stepping.
    """
    if config.force_method == ForceMethod.BARNES_HUT:
        # The BH sorted contract only exists on the fused Pallas tiles
        # path; off-TPU it would run interpret mode — Python-emulated
        # kernels, ~100× slower than the plain XLA path. CPU callers
        # fall back to plain stepping (tests exercise the interpret
        # path explicitly via barnes_hut_forces_sorted).
        if not _use_pallas(backend):
            return None
        from nbody_tpu.ops.barnes_hut import make_barnes_hut_forces_sorted

        return make_barnes_hut_forces_sorted(config)
    if config.force_method == ForceMethod.SPATIAL_HASH:
        from nbody_tpu.ops.spatial_hash import (
            make_spatial_hash_forces_sorted,
        )

        return make_spatial_hash_forces_sorted(config, pos_hint)
    return None


def make_table_step_params(
    config: SimulationConfig,
    *,
    backend: Optional[str] = None,
    pos_hint=None,
):
    """``TableParams`` for ``config``'s engine when the table-resident
    stepping path applies (ops/table_step.py), else None.

    The table path keeps integration state in the sweep kernel's
    plane-major slot layout between re-sorts — frozen steps pay no sort,
    no placement, no pickup. It exists for the fused Pallas tiles
    engines only (Barnes-Hut tiles, spatial-hash tiles) and carries its
    cell ids int32-native end to end, so it is structurally immune to
    the bitcast denormal-flush hazard (ops/sorted_window.py
    build_sorted_grid docstring). Off-TPU it would run interpret-mode
    kernels (~100x slower than the XLA paths) — CPU callers get None
    and fall back to row-space stepping; tests exercise the table path
    explicitly with ``impl="pallas_interpret"``.
    """
    if not _use_pallas(backend):
        return None
    if config.particle_count >= (1 << 24):
        return None
    from nbody_tpu.ops.tile_sweep import tile_engine_fused

    if config.force_method == ForceMethod.BARNES_HUT:
        from nbody_tpu.ops.barnes_hut import bh_engine_params
        from nbody_tpu.ops.table_step import bh_table_params

        p = bh_engine_params(config)
        if p["near_engine"] != "tiles" or p["multipole_order"] < 2:
            return None
        tp = bh_table_params(
            G=config.G, softening=config.softening,
            theta=config.barnes_hut_theta,
            levels=p["levels"], near_k=p["near_k"],
        )
    elif config.force_method == ForceMethod.SPATIAL_HASH:
        from nbody_tpu.ops.spatial_hash import hash_engine_params
        from nbody_tpu.ops.table_step import hash_table_params

        hp = hash_engine_params(config, pos_hint)
        if hp["engine"] != "tiles":
            return None
        tp = hash_table_params(
            G=config.G, softening=config.softening,
            cutoff=config.spatial_hash_cutoff,
            cell_size=config.spatial_hash_cell_size,
            d=hp["tile_d"], k=hp["tile_k"],
        )
    else:
        return None
    if not tile_engine_fused(tp.d, tp.k, tp.impl):
        return None
    return tp


def list_algorithms():
    """reference: --list-algorithms (src/main.cpp, app_cli.cpp:118-121)."""
    return [
        (ForceMethod.DIRECT_N2.cli_name, "Exact O(N²) all-pairs (Pallas tiled)"),
        (
            ForceMethod.BARNES_HUT.cli_name,
            "O(N log N) hierarchical multipole approximation",
        ),
        (
            ForceMethod.SPATIAL_HASH.cli_name,
            "O(N) short-range with cutoff (sorted grid)",
        ),
    ]
