"""Multi-host (pod-slice) runtime setup.

The TPU-native replacement for the reference's dead torch.distributed
imports (`epsilonparam/train.py:4-5`): one call per host process wires
the JAX runtime over ICI within a slice and DCN across hosts; after it,
`jax.devices()` is global and the (data, tile) mesh in `parallel.mesh`
spans the whole slice. Collectives are compiled by XLA — no external
communication library.

Failure policy: if multi-host is requested (explicit args) or the
environment claims it (coordinator address / worker hostnames set), an
initialization failure RAISES — silently degrading to a single-host run
is the worst possible failure mode for a pod job (it would train on
1/N of the data with no error).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)


def _env_claims_multihost() -> bool:
    return bool(os.environ.get("JAX_COORDINATOR_ADDRESS")) or (
        os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") != "localhost"
    )


def setup_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    initialization_timeout: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX if requested; returns topology info.

    Single-host runs (no explicit args, no multi-host env) are a no-op.
    On TPU pods with the standard environment, `jax.distributed.initialize()`
    autodetects everything. A repeated call on an initialized runtime is
    tolerated (idempotent); every other failure propagates.
    """
    import jax

    explicit = num_processes is not None and num_processes > 1
    if explicit or _env_claims_multihost():
        kwargs = {}
        if initialization_timeout is not None:
            kwargs["initialization_timeout"] = initialization_timeout
        try:
            if explicit:
                jax.distributed.initialize(
                    coordinator_address=coordinator_address,
                    num_processes=num_processes,
                    process_id=process_id,
                    **kwargs,
                )
            else:
                jax.distributed.initialize(**kwargs)
        except RuntimeError as e:
            if "already initialized" in str(e).lower():
                log.info("jax.distributed already initialized; continuing")
            else:
                log.error("multi-host initialization failed: %s", e)
                raise
        except Exception as e:
            log.error("multi-host initialization failed: %s", e)
            raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def shutdown_distributed() -> None:
    """Tear down the coordination service (test hygiene; safe if not up)."""
    import jax

    try:
        jax.distributed.shutdown()
    except RuntimeError:
        pass
