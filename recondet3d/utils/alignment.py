"""Depth alignment / sky handling (JAX, jit-safe masked statistics).

Re-implementation of the reference alignment utilities
(reference: depth_anything_3/utils/alignment.py:23-160). Differences by
design: the reference subsamples 100k random elements before computing
quantiles as a CUDA memory optimization and asserts on mask counts; here
quantiles are computed exactly over masked arrays with static shapes
(sort + counted index), and degenerate masks fall back branchlessly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "least_squares_scale_scalar",
    "compute_sky_mask",
    "compute_alignment_mask",
    "apply_metric_scaling",
    "set_sky_regions_to_max_depth",
    "masked_quantile",
]


def masked_quantile(x: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """torch.quantile (linear interpolation) over x[mask], static shapes.

    Invalid entries sort to +inf; the quantile index is computed from the
    valid count. Returns 0 when the mask is empty."""
    xf = jnp.where(mask, x, jnp.inf).reshape(-1).astype(jnp.float32)
    xs = jnp.sort(xf)
    n = jnp.sum(mask).astype(jnp.float32)
    pos = q * jnp.maximum(n - 1.0, 0.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    w = pos - lo
    val = xs[lo] * (1 - w) + xs[hi] * w
    return jnp.where(n > 0, val, 0.0)


def least_squares_scale_scalar(a: jnp.ndarray, b: jnp.ndarray,
                               mask: jnp.ndarray | None = None,
                               eps: float = 1e-12) -> jnp.ndarray:
    """Scale s minimizing ||a - s*b|| (optionally masked)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        num = jnp.sum(a * b * m)
        den = jnp.clip(jnp.sum(b * b * m), eps, None)
    else:
        num = jnp.sum(a * b)
        den = jnp.clip(jnp.sum(b * b), eps, None)
    return num / den


def compute_sky_mask(sky_prediction: jnp.ndarray, threshold: float = 0.3) -> jnp.ndarray:
    """True where NOT sky (reference: alignment.py:54)."""
    return sky_prediction < threshold


def compute_alignment_mask(
    depth_conf,
    non_sky_mask,
    depth,
    metric_depth,
    median_conf,
    min_depth_threshold: float = 1e-3,
    min_metric_depth_threshold: float = 1e-2,
):
    return (
        (depth_conf >= median_conf)
        & non_sky_mask
        & (metric_depth > min_metric_depth_threshold)
        & (depth > min_depth_threshold)
    )


def apply_metric_scaling(depth, intrinsics, scale_factor: float = 300.0):
    """depth (B,S,H,W), intrinsics (B,S,3,3)."""
    focal = (intrinsics[..., 0, 0] + intrinsics[..., 1, 1]) / 2
    return depth * (focal[..., None, None] / scale_factor)


def set_sky_regions_to_max_depth(depth, depth_conf, non_sky_mask, max_depth):
    depth = jnp.where(non_sky_mask, depth, max_depth)
    if depth_conf is not None:
        depth_conf = jnp.where(non_sky_mask, depth_conf, 1.0)
    return depth, depth_conf
