"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL/DDP stack (reference: mmcv ``init_dist`` +
``MMDistributedDataParallel`` in tools/train_mmdet3d.py:199-206 and
``dist_params=dict(backend='nccl')`` in the configs).

Design: one named ``jax.sharding.Mesh`` with axes ``('data', 'model')``.
Data parallelism = shard the batch over ``data`` and let pjit insert
gradient ``psum``s; optional tensor parallelism for the ViT-G preset =
shard heads/FFN over ``model``. Collectives ride ICI via XLA — no process
groups or explicit scatter code survive from the reference design.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "local_mesh_context",
    "get_active_mesh",
    "DATA_AXIS",
    "MODEL_AXIS",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"

_ACTIVE_MESH: Optional[Mesh] = None


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the given (or all) devices.

    With one chip this degenerates to a 1x1 mesh so the same training step
    runs unchanged from a single v5e to a full pod slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of host arrays with batch-dim sharding."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)


@contextlib.contextmanager
def local_mesh_context(mesh: Mesh):
    """Set the process-wide 'active mesh' used by mesh-aware layers
    (e.g. sync batch-norm statistics)."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        with mesh:
            yield mesh
    finally:
        _ACTIVE_MESH = prev


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def world_size(mesh: Optional[Mesh] = None) -> int:
    if mesh is None:
        return jax.device_count()
    return int(np.prod(list(mesh.shape.values())))


def autoscale_lr(base_lr: float, samples_per_device: int, mesh: Optional[Mesh] = None,
                 base_total_batch: int = 8) -> float:
    """Linear LR scaling rule (reference: tools/train_mmdet3d.py:190-192
    ``--autoscale-lr``: lr = base_lr * total_batch / 8)."""
    total = samples_per_device * world_size(mesh)
    return base_lr * total / base_total_batch
