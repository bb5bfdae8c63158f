"""Multi-chip particle sharding over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.5); this package is the
TPU-native scaling layer it never had: the particle axis shards across
devices, collectives ride ICI via shard_map —

  * ring-rotated j-blocks for the all-pairs force (`ring.py`), the
    N-body analogue of ring attention;
  * psum energy reductions (replacing block-reduce + host sum);
  * pyramid grids built locally and psum-combined for Barnes-Hut, plus
    slab-routed near fields with chained-ppermute halos (`tree.py`) —
    the multipole grids are small relative to particles, so
    replicate-by-reduction is the bandwidth-optimal layout;
  * jax.distributed initialization helpers for multi-host (`distributed.py`).
"""

from nbody_tpu.parallel.mesh import (
    make_mesh,
    shard_state,
    sharded_device_count,
)
from nbody_tpu.parallel.ring import ring_direct_forces
from nbody_tpu.parallel.step import (
    make_sharded_multi_step,
    make_sharded_step,
    sharded_energy,
)
from nbody_tpu.parallel.tree import (
    sharded_barnes_hut_forces,
    sharded_spatial_hash_forces,
)

__all__ = [
    "make_mesh",
    "shard_state",
    "sharded_device_count",
    "ring_direct_forces",
    "make_sharded_multi_step",
    "make_sharded_step",
    "sharded_energy",
    "sharded_barnes_hut_forces",
    "sharded_spatial_hash_forces",
]
