"""Multi-host initialization (the xllmx/util/dist.py equivalent).

The reference rendezvouses torch.distributed/NCCL via env:// or SLURM
variables (dist.py:33-86).  On TPU pods, ``jax.distributed.initialize``
discovers peers from the TPU metadata automatically; off-pod (CPU fleets,
tests) the same env conventions are honored.  Collectives themselves are
XLA ops placed by sharding — there is no NCCL analog to manage.
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX.  Priority: explicit args > env
    (MASTER_ADDR/MASTER_PORT + RANK/WORLD_SIZE, or SLURM_*) > single host.

    Returns {"process_id", "num_processes", "local_devices", "global_devices"}.
    """
    import jax

    if num_processes is None:
        if "WORLD_SIZE" in os.environ:
            num_processes = int(os.environ["WORLD_SIZE"])
        elif "SLURM_NPROCS" in os.environ:
            num_processes = int(os.environ["SLURM_NPROCS"])
    if process_id is None:
        # explicit args win; the env only fills gaps (doc contract)
        if "RANK" in os.environ:
            process_id = int(os.environ["RANK"])
        elif "SLURM_PROCID" in os.environ:
            process_id = int(os.environ["SLURM_PROCID"])
        elif num_processes and num_processes > 1:
            process_id = 0
    if coordinator is None and "MASTER_ADDR" in os.environ:
        coordinator = (
            f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '1234')}"
        )

    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": jax.local_devices(),
        "global_devices": jax.devices(),
    }


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def host_mean(value: float) -> float:
    """Cross-host scalar mean (xllmx all_reduce_mean equivalent)."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.asarray([value], np.float64))
    return float(vals.mean())


def shard_requests(items, process_id: Optional[int] = None,
                   num_processes: Optional[int] = None):
    """Static request sharding across hosts (the reference shards prompt
    files per GPU via start/end indices, run.sh:1-17)."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return items[pid::n]
