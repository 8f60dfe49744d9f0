"""Fixed-radius ball query with static shapes.

TPU-native equivalent of the reference CUDA op (reference:
mmdetection3d/mmdet3d/ops/ball_query/ball_query_cuda.cu). Contract: for
each query center, return the indices of the first ``nsample`` points (in
input order) whose distance lies in (min_radius, max_radius]; remaining
slots are filled with the first found index (CUDA behavior). Centers with
no neighbor return all zeros.

Implementation: chunked distance computation + ``top_k`` on
order-encoding scores — no (M, N) materialization in HBM beyond one chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["ball_query"]


@functools.partial(
    jax.jit, static_argnames=("nsample", "min_radius", "max_radius", "chunk")
)
def ball_query(
    min_radius: float,
    max_radius: float,
    nsample: int,
    points: jnp.ndarray,
    centers: jnp.ndarray,
    points_valid: jnp.ndarray | None = None,
    chunk: int = 512,
) -> jnp.ndarray:
    """Args:
        points: (N, 3); centers: (M, 3). Returns (M, nsample) int32.
    """
    N = points.shape[0]
    M = centers.shape[0]
    pts = points.astype(jnp.float32)
    big = jnp.int32(N)

    pad = (-M) % chunk
    centers_p = jnp.pad(centers.astype(jnp.float32), ((0, pad), (0, 0)))
    centers_c = centers_p.reshape(-1, chunk, 3)

    arangeN = jnp.arange(N, dtype=jnp.int32)
    valid = None if points_valid is None else points_valid.astype(bool)

    min_sq = float(min_radius) ** 2
    max_sq = float(max_radius) ** 2

    def one_chunk(c):
        # (chunk, N) squared distances
        d2 = jnp.sum((c[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        in_ball = (d2 <= max_sq) & (d2 >= min_sq if min_sq > 0 else True)
        if valid is not None:
            in_ball = in_ball & valid[None, :]
        score = jnp.where(in_ball, arangeN[None, :], big)
        neg_topk, _ = jax.lax.top_k(-score, nsample)  # smallest indices first
        idx = -neg_topk
        # fill not-found slots with the first found index; all-zero if none
        found = idx < big
        any_found = found[:, :1]
        first = jnp.where(any_found, idx[:, :1], 0)
        return jnp.where(found, idx, first).astype(jnp.int32)

    out = jax.lax.map(one_chunk, centers_c)
    return out.reshape(-1, nsample)[:M]
