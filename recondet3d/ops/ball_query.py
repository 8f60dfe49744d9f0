"""Fixed-radius ball query with static shapes.

TPU-native equivalent of the reference CUDA op (reference:
mmdetection3d/mmdet3d/ops/ball_query/ball_query_cuda.cu). Contract: for
each query center, return the indices of the first ``nsample`` points (in
input order) whose distance lies in [min_radius, max_radius]; remaining
slots are filled with the first found index (CUDA behavior). Centers with
no neighbor return all zeros.

TPU design: centers are processed in chunks; the point axis is streamed
in blocks through a ``lax.scan`` that carries a running smallest-nsample
set of order-encoded scores — peak memory is (chunk x block), never
(M x N), and every step is VPU-friendly top_k work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["ball_query"]


@functools.partial(
    jax.jit,
    static_argnames=("nsample", "min_radius", "max_radius", "chunk", "block"),
)
def ball_query(
    min_radius: float,
    max_radius: float,
    nsample: int,
    points: jnp.ndarray,
    centers: jnp.ndarray,
    points_valid: jnp.ndarray | None = None,
    chunk: int = 256,
    block: int = 32768,
) -> jnp.ndarray:
    """points (N, 3), centers (M, 3) -> (M, nsample) int32."""
    N = points.shape[0]
    M = centers.shape[0]
    big = jnp.int32(N)

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
    centers_c = jnp.pad(centers.astype(jnp.float32), ((0, m_pad), (0, 0)))
    centers_c = centers_c.reshape(-1, chunk, 3)

    min_sq = float(min_radius) ** 2
    max_sq = float(max_radius) ** 2

    def one_chunk(c):  # c: (chunk, 3)
        def body(carry, blk):
            p, i, v = blk
            d2 = jnp.sum((c[:, None, :] - p[None, :, :]) ** 2, axis=-1)
            in_ball = (d2 <= max_sq) & v[None, :]
            if min_sq > 0:
                in_ball &= d2 >= min_sq
            score = jnp.where(in_ball, i[None, :], big)
            merged = jnp.concatenate([carry, score], axis=1)
            neg, _ = jax.lax.top_k(-merged, nsample)
            return -neg, None

        init = jnp.full((chunk, nsample), big, jnp.int32)
        best, _ = jax.lax.scan(body, init, (pts_b, idx_b, val_b))
        found = best < big
        first = jnp.where(found[:, :1], best[:, :1], 0)
        return jnp.where(found, best, first).astype(jnp.int32)

    out = jax.lax.map(one_chunk, centers_c)
    return out.reshape(-1, nsample)[:M]
