"""PAConv score-weighted kernel assembly.

TPU-native equivalent of the reference CUDA op
(reference: mmdetection3d/mmdet3d/ops/paconv/assign_score_withk — gather
per-neighbor weight-bank combinations and apply learned assignment
scores). On TPU this is a plain einsum chain — no custom kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["assign_score_withk"]


def assign_score_withk(
    scores: jnp.ndarray,  # (N, K, M) assignment scores (K neighbors, M kernels)
    point_features: jnp.ndarray,  # (N, M, C) per-kernel features of each point
    center_features: jnp.ndarray,  # (N, M, C)
    knn_idx: jnp.ndarray,  # (N, K) neighbor indices
    aggregate: str = "sum",
) -> jnp.ndarray:
    """Returns (N, K, C): score-mixed (neighbor - center) features
    (the 'w_neighbor-c_neighbor' reduction of the reference op)."""
    nbr = point_features[knn_idx]  # (N, K, M, C)
    ctr = center_features[:, None]  # (N, 1, M, C)
    diff = nbr - ctr
    out = jnp.einsum("nkm,nkmc->nkc", scores, diff)
    if aggregate == "sum":
        return out
    raise ValueError(aggregate)
