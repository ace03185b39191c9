"""Multi-host initialization (DCN) for pod-slice serving.

The reference is strictly single-process/single-GPU (SURVEY.md §2.7). On TPU
pods, multi-host runs one process per host: `jax.distributed.initialize`
wires the DCN coordinator, after which `jax.devices()` spans the slice and
the (dp, tp) mesh in `parallel.mesh` shards across hosts exactly like chips —
GSPMD routes intra-slice collectives over ICI and cross-host over DCN.

Typical launch (2 hosts):
    # host 0
    NFAI_COORD=host0:8476 NFAI_NUM_PROCS=2 NFAI_PROC_ID=0 python -m nfai_tpu.server ...
    # host 1
    NFAI_COORD=host0:8476 NFAI_NUM_PROCS=2 NFAI_PROC_ID=1 python -m nfai_tpu.server ...
"""
from __future__ import annotations

import os

from ..utils.logging import get_logger

log = get_logger(__name__)


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or NFAI_COORD/NFAI_NUM_PROCS/
    NFAI_PROC_ID env vars. Returns True if multi-host mode was activated."""
    coordinator_address = coordinator_address or os.environ.get("NFAI_COORD")
    if not coordinator_address:
        return False
    num_processes = num_processes or int(os.environ.get("NFAI_NUM_PROCS", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("NFAI_PROC_ID", "0"))
    )
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "jax.distributed initialized: process %d/%d via %s (%d global devices)",
        process_id,
        num_processes,
        coordinator_address,
        jax.device_count(),
    )
    return True
