"""RoI-aware 3D pooling.

TPU-native equivalent of the reference CUDA extension
(reference: mmdetection3d/mmdet3d/ops/roiaware_pool3d/ — pool point
features into a fixed (out_x, out_y, out_z) grid per rotated RoI box,
max or avg mode, used by Part-A2 heads). Instead of atomics: for each
RoI, points transform into the box frame, map to grid cells, and a
single segment scatter produces the pooled grid.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["roiaware_pool3d"]


@functools.partial(jax.jit, static_argnames=("out_size", "mode"))
def roiaware_pool3d(
    rois: jnp.ndarray,  # (M, 7) [x y z dx dy dz yaw], z = bottom center
    points: jnp.ndarray,  # (N, 3)
    point_features: jnp.ndarray,  # (N, C)
    out_size: Tuple[int, int, int] = (14, 14, 14),
    mode: str = "max",
) -> jnp.ndarray:
    """Returns (M, out_x, out_y, out_z, C) pooled features."""
    ox, oy, oz = out_size
    M = rois.shape[0]
    N, C = point_features.shape

    def pool_one(roi):
        cx, cy, cz, dx, dy, dz, yaw = [roi[i] for i in range(7)]
        cos, sin = jnp.cos(yaw), jnp.sin(yaw)
        px = points[:, 0] - cx
        py = points[:, 1] - cy
        pz = points[:, 2] - cz
        lx = px * cos + py * sin + dx / 2
        ly = -px * sin + py * cos + dy / 2
        inside = (
            (lx >= 0) & (lx < dx) & (ly >= 0) & (ly < dy) & (pz >= 0) & (pz < dz)
        )
        gx = jnp.clip((lx / dx * ox).astype(jnp.int32), 0, ox - 1)
        gy = jnp.clip((ly / dy * oy).astype(jnp.int32), 0, oy - 1)
        gz = jnp.clip((pz / dz * oz).astype(jnp.int32), 0, oz - 1)
        cell = (gx * oy + gy) * oz + gz
        cell = jnp.where(inside, cell, ox * oy * oz)
        if mode == "max":
            grid = jnp.full((ox * oy * oz + 1, C), -jnp.inf, point_features.dtype)
            grid = grid.at[cell].max(
                jnp.where(inside[:, None], point_features, -jnp.inf), mode="drop"
            )
            grid = jnp.where(jnp.isfinite(grid), grid, 0.0)
        else:
            grid = jnp.zeros((ox * oy * oz + 1, C), point_features.dtype)
            grid = grid.at[cell].add(
                jnp.where(inside[:, None], point_features, 0.0), mode="drop"
            )
            cnt = jnp.zeros((ox * oy * oz + 1,), point_features.dtype).at[cell].add(
                inside.astype(point_features.dtype), mode="drop"
            )
            grid = grid / jnp.clip(cnt[:, None], 1.0, None)
        return grid[:-1].reshape(ox, oy, oz, C)

    return jax.lax.map(pool_one, rois)
