"""Furthest point sampling (FPS) with static shapes.

TPU-native equivalent of the reference CUDA FPS
(reference: mmdetection3d/mmdet3d/ops/furthest_point_sample/). The CUDA
kernel is an inherently sequential K-step loop (argmax over running
min-distances); here it is a ``lax.fori_loop`` whose body is two fused
O(N) vector passes that XLA keeps on-chip. Padding points are handled by
a validity mask (never selected; selection falls back to repeating the
first valid point when the valid count < K, mirroring the CUDA behavior
of returning K indices unconditionally).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["furthest_point_sample", "furthest_point_sample_with_dist"]


def _fps_body(points, start_dist, num_samples):
    """Shared FPS loop given initial per-point min 'distances' (squared)."""
    N = points.shape[0] if points is not None else start_dist.shape[0]

    def step(i, carry):
        min_dist, idxs, last = carry
        p = points[last]
        d = jnp.sum((points - p) ** 2, axis=-1)
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return min_dist, idxs, nxt

    idxs0 = jnp.zeros((num_samples,), dtype=jnp.int32)
    first = jnp.argmax(start_dist > -jnp.inf).astype(jnp.int32)  # first valid point
    idxs0 = idxs0.at[0].set(first)
    min_dist, idxs, _ = jax.lax.fori_loop(
        1, num_samples, step, (start_dist, idxs0, first)
    )
    return idxs


@functools.partial(jax.jit, static_argnames=("num_samples",))
def furthest_point_sample_xla(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """XLA while-loop FPS (portable reference; K sequential dispatches)."""
    N = points.shape[0]
    start = jnp.full((N,), 1e10, dtype=jnp.float32)
    if valid_mask is not None:
        start = jnp.where(valid_mask.astype(bool), start, -jnp.inf)
    return _fps_body(points.astype(jnp.float32), start, num_samples)


def furthest_point_sample(
    points: jnp.ndarray,
    num_samples: int,
    valid_mask: jnp.ndarray | None = None,
    impl: str = "auto",
    presorted=None,
) -> jnp.ndarray:
    """FPS over a single point set.

    Args:
        points: (N, 3) float coordinates (padding rows allowed).
        num_samples: K, static.
        valid_mask: optional (N,) bool; invalid points are never selected.
        impl: 'auto' (Pallas kernel on TPU — ~60x faster at production
            sizes), 'pallas', or 'xla'.
        presorted: optional ``ops.cell_sort.CellSort`` over (points,
            valid_mask); lets the Pallas kernel skip its own spatial sort
            (ignored by the XLA impl, which needs no sort).

    Returns:
        (K,) int32 indices. Index 0 of the valid set is always selected first
        (CUDA contract).
    """
    # index selection is non-differentiable (the reference CUDA op has no
    # backward); stop_gradient keeps JVP/VJP traces of fine-tuning steps
    # (freeze_da3=False) from descending into the Pallas kernel
    points = jax.lax.stop_gradient(points)
    if valid_mask is not None:
        valid_mask = jax.lax.stop_gradient(valid_mask)
    if presorted is not None:
        presorted = jax.lax.stop_gradient(presorted)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from recondet3d.ops.fps_pallas import furthest_point_sample_pallas

        return furthest_point_sample_pallas(points, num_samples, valid_mask,
                                            presorted=presorted)
    return furthest_point_sample_xla(points, num_samples, valid_mask)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def furthest_point_sample_with_dist(
    dist_matrix: jnp.ndarray, num_samples: int
) -> jnp.ndarray:
    """FPS given a precomputed (N, N) pairwise distance matrix
    (reference: furthest_point_sample_with_dist variant)."""
    N = dist_matrix.shape[0]

    def step(i, carry):
        min_dist, idxs, last = carry
        d = dist_matrix[last]
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return min_dist, idxs, nxt

    idxs0 = jnp.zeros((num_samples,), dtype=jnp.int32)
    start = jnp.full((N,), 1e10, dtype=dist_matrix.dtype)
    min_dist, idxs, _ = jax.lax.fori_loop(1, num_samples, step, (start, idxs0, jnp.int32(0)))
    return idxs
