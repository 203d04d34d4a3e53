"""Multi-host (pod-slice) runtime setup.

The TPU-native replacement for the reference's dead torch.distributed
imports (`epsilonparam/train.py:4-5`): one call per host process wires
the JAX runtime over ICI within a slice and DCN across hosts; after it,
`jax.devices()` is global and the (data, tile) mesh in `parallel.mesh`
spans the whole slice. Collectives are compiled by XLA — no external
communication library.
"""

from __future__ import annotations

import os
from typing import Optional


def setup_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX if needed; returns topology info.

    On single-host (or already-initialized) runs this is a no-op. On TPU
    pods with the standard environment, `jax.distributed.initialize()`
    autodetects everything.
    """
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") != "localhost":
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process fallback
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
