"""Tensor-parallel sharding rules for the DA3 ViT.

The reference is data-parallel only (SURVEY §2.7); for the ViT-G preset a
'model' mesh axis pays off on small batches. Megatron-style layout:

- attention qkv kernel (C, 3C): shard output dim  -> heads split over 'model'
- attention proj kernel (C, C): shard input dim   -> psum on exit
- mlp fc1 / swiglu w12 (C, H):  shard output dim
- mlp fc2 / swiglu w3  (H, C):  shard input dim   -> psum on exit

Only the kernels are annotated; GSPMD propagates activation shardings and
inserts the all-reduces (the scaling-book recipe: annotate params, let
XLA place collectives on ICI).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from recondet3d.parallel.mesh import MODEL_AXIS

__all__ = ["da3_param_shardings", "shard_params"]

_COL_PARALLEL = ("attn/qkv/kernel", "mlp/fc1/kernel", "mlp/w12/kernel")
_ROW_PARALLEL = ("attn/proj/kernel", "mlp/fc2/kernel", "mlp/w3/kernel")


def _spec_for(path: str, shape) -> P:
    if any(path.endswith(s) for s in _COL_PARALLEL):
        return P(None, MODEL_AXIS)
    if any(path.endswith(s) for s in _ROW_PARALLEL):
        return P(MODEL_AXIS, None)
    return P()


def da3_param_shardings(params: Any, mesh: Mesh):
    """Pytree of NamedShardings matching ``params`` (TP on ViT blocks,
    replicated elsewhere). Degenerates to fully-replicated when the mesh
    has no 'model' extent."""
    tp = mesh.shape.get(MODEL_AXIS, 1)

    def one(path, leaf):
        name = "/".join(str(k.key) for k in path)
        if tp > 1:
            spec = _spec_for(name, leaf.shape)
            # only shard dims divisible by the axis size
            ok = all(
                s is None or leaf.shape[i] % tp == 0
                for i, s in enumerate(spec)
            ) if spec else True
            if ok:
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Any, mesh: Mesh):
    """device_put params with the TP layout."""
    shardings = da3_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
