"""k-nearest-neighbor search (TPU-native equivalent of
mmdetection3d/mmdet3d/ops/knn/). Chunked distances + top_k."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["knn"]


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn(
    k: int,
    points: jnp.ndarray,
    queries: jnp.ndarray,
    points_valid: jnp.ndarray | None = None,
    chunk: int = 512,
) -> jnp.ndarray:
    """For each query (M, 3) return indices (M, k) of the k nearest of
    points (N, 3) by squared euclidean distance (ties by lower index)."""
    M = queries.shape[0]
    pts = points.astype(jnp.float32)
    valid = None if points_valid is None else points_valid.astype(bool)

    pad = (-M) % chunk
    q = jnp.pad(queries.astype(jnp.float32), ((0, pad), (0, 0))).reshape(-1, chunk, 3)

    def one_chunk(c):
        d2 = jnp.sum((c[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        if valid is not None:
            d2 = jnp.where(valid[None, :], d2, jnp.inf)
        _, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32)

    out = jax.lax.map(one_chunk, q)
    return out.reshape(-1, k)[:M]
