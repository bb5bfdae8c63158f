"""Multi-host initialization helpers.

The communication backend is XLA collectives over ICI/DCN — the TPU-native
counterpart of what NCCL would be on GPUs (SURVEY.md §5.8). On a multi-host
TPU pod slice, call ``initialize_distributed()`` once per process before
any JAX computation; single-host usage needs nothing.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars.

    Returns True if distributed mode was initialized, False for the
    single-process fallback. Idempotent.
    """
    import jax

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and num_processes is None:
        return False  # single-host
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return True
        raise


def global_device_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
