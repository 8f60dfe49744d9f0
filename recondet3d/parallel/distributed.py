"""Multi-host initialization — replaces mmcv ``init_dist`` (reference:
tools/train_mmdet3d.py:112-117,199-206; launchers tools/dist_train.sh /
slurm_train.sh). On TPU pods, ``jax.distributed.initialize()`` wires the
hosts; collectives then ride ICI/DCN through XLA with no backend choice
to make (the NCCL/gloo/MPI distinction disappears).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["init_distributed", "is_distributed", "process_info"]

_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. Safe to call on single-host (no-op unless
    coordinator info is provided via args or JAX_COORDINATOR_ADDRESS)."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single host
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def process_info() -> dict:
    return dict(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )
