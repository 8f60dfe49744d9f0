"""k-nearest-neighbor search (TPU-native equivalent of
mmdetection3d/mmdet3d/ops/knn/). Chunked queries + point-axis scan with a
running top-k — never materializes (M, N)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["knn"]


@functools.partial(jax.jit, static_argnames=("k", "chunk", "block"))
def knn(
    k: int,
    points: jnp.ndarray,
    queries: jnp.ndarray,
    points_valid: jnp.ndarray | None = None,
    chunk: int = 256,
    block: int = 32768,
) -> jnp.ndarray:
    """For each query (M, 3) return indices (M, k) of the k nearest of
    points (N, 3) by squared euclidean distance."""
    N = points.shape[0]
    M = queries.shape[0]

    n_pad = (-N) % block
    pts = jnp.pad(points.astype(jnp.float32), ((0, n_pad), (0, 0)))
    idx_all = jnp.arange(N + n_pad, dtype=jnp.int32)
    valid = jnp.ones((N + n_pad,), bool).at[N:].set(False)
    if points_valid is not None:
        valid = valid.at[:N].set(points_valid.astype(bool))
    pts_b = pts.reshape(-1, block, 3)
    idx_b = idx_all.reshape(-1, block)
    val_b = valid.reshape(-1, block)

    m_pad = (-M) % chunk
    q = jnp.pad(queries.astype(jnp.float32), ((0, m_pad), (0, 0))).reshape(-1, chunk, 3)

    def one_chunk(c):
        def body(carry, blk):
            best_d, best_i = carry
            p, i, v = blk
            d2 = jnp.sum((c[:, None, :] - p[None, :, :]) ** 2, axis=-1)
            d2 = jnp.where(v[None, :], d2, jnp.inf)
            md = jnp.concatenate([best_d, d2], axis=1)
            mi = jnp.concatenate([best_i, jnp.broadcast_to(i[None, :], d2.shape)], axis=1)
            neg, sel = jax.lax.top_k(-md, k)
            return (-neg, jnp.take_along_axis(mi, sel, axis=1)), None

        init = (
            jnp.full((chunk, k), jnp.inf, jnp.float32),
            jnp.zeros((chunk, k), jnp.int32),
        )
        (_, best_i), _ = jax.lax.scan(body, init, (pts_b, idx_b, val_b))
        return best_i

    out = jax.lax.map(one_chunk, q)
    return out.reshape(-1, k)[:M]
