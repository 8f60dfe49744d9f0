"""Points-in-rotated-boxes tests (TPU-native equivalent of
mmdetection3d/mmdet3d/ops/roiaware_pool3d/ points_in_boxes_{cpu,gpu,batch}).

Boxes are (M, 7) [x, y, z, dx, dy, dz, yaw] with z the BOTTOM center
(LiDAR convention, like the CUDA kernel)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["points_in_boxes", "points_in_boxes_batch"]


def points_in_boxes(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """points (N, 3), boxes (M, 7) -> (N,) int32 index of the FIRST box
    containing each point, -1 if none (the points_in_boxes_gpu contract)."""
    inside = points_in_boxes_batch(points, boxes)  # (N, M) bool
    any_box = jnp.any(inside, axis=1)
    first = jnp.argmax(inside, axis=1).astype(jnp.int32)
    return jnp.where(any_box, first, -1)


def points_in_boxes_batch(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, M) bool membership matrix (points_in_boxes_batch contract)."""
    cx, cy, cz = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    dx, dy, dz = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    yaw = boxes[:, 6]
    px = points[:, None, 0] - cx[None]
    py = points[:, None, 1] - cy[None]
    pz = points[:, None, 2] - cz[None]
    cos, sin = jnp.cos(yaw)[None], jnp.sin(yaw)[None]
    lx = px * cos + py * sin
    ly = -px * sin + py * cos
    return (
        (jnp.abs(lx) <= dx[None] / 2)
        & (jnp.abs(ly) <= dy[None] / 2)
        & (pz >= 0)
        & (pz <= dz[None])
    )
