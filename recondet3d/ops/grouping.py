"""Point gather / group / feature interpolation ops.

TPU-native equivalents of the reference CUDA extensions
``gather_points``, ``group_points``, ``three_nn`` + ``three_interpolate``
(reference: mmdetection3d/mmdet3d/ops/{gather_points,group_points,
interpolate}/). These are pure index/gather ops — in JAX they are simple
``take`` compositions that XLA lowers to efficient dynamic-gathers, and
they are differentiable for free (the CUDA versions hand-write grads).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gather_points", "group_points", "three_nn", "three_interpolate"]


def gather_points(features: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """features (C, N) or (N, C) gathered at indices (M,) along the point axis.

    Follows the reference layout (B, C, N) + (B, M) -> (B, C, M) when
    batched via vmap; here single-sample (C, N), (M,) -> (C, M).
    """
    return jnp.take(features, indices, axis=-1)


def group_points(features: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """features (C, N), indices (M, nsample) -> grouped (C, M, nsample)."""
    return jnp.take(features, indices, axis=-1)


def three_nn(queries: jnp.ndarray, points: jnp.ndarray):
    """For each query (M, 3) find the 3 nearest points (N, 3).

    Returns (dist (M, 3), idx (M, 3) int32) — euclidean distances like the
    reference (mmdet3d/ops/interpolate/three_nn.py).
    """
    d2 = jnp.sum((queries[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance-weighted feature propagation.

    features (C, N), idx (M, 3), weight (M, 3) -> (C, M).
    """
    gathered = jnp.take(features, idx, axis=-1)  # (C, M, 3)
    return jnp.sum(gathered * weight[None], axis=-1)
