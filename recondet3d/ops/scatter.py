"""Dynamic point->voxel scatter (mean/max segment reduce).

TPU-native equivalent of the reference ``DynamicScatter`` CUDA op
(reference: mmdetection3d/mmdet3d/ops/voxel/scatter_points.py:53 +
scatter_points_cuda.cu). Instead of atomics it sorts points by linearized
voxel id and uses XLA segment reductions with static output capacity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["dynamic_scatter", "DynamicScatter"]


@functools.partial(jax.jit, static_argnames=("max_voxels", "reduce", "grid"))
def dynamic_scatter(
    feats: jnp.ndarray,
    coors_zyx: jnp.ndarray,
    *,
    grid: Tuple[int, int, int],
    max_voxels: int,
    reduce: str = "mean",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reduce per-point features into per-voxel features.

    Args:
        feats: (N, C) point features.
        coors_zyx: (N, 3) int32 voxel coords (zyx); rows with any -1 are ignored
            (out-of-range points, matching the CUDA contract).
        grid: (X, Y, Z) grid extents for linearization.
        max_voxels: static output capacity.
        reduce: 'mean' | 'max' | 'sum'.

    Returns:
        voxel_feats (max_voxels, C), voxel_coors (max_voxels, 3) (-1 pads),
        point2voxel (N,) int32 (slot per point, max_voxels for dropped),
        num_voxels () int32.
    """
    if reduce not in ("mean", "max", "sum"):
        raise ValueError(reduce)
    N, C = feats.shape
    gx, gy, gz = grid
    n_cells = gx * gy * gz
    sentinel = jnp.int32(n_cells)

    valid = jnp.all(coors_zyx >= 0, axis=-1)
    z, y, x = coors_zyx[:, 0], coors_zyx[:, 1], coors_zyx[:, 2]
    ids = jnp.where(valid, (z * gy + y) * gx + x, sentinel)

    order = jnp.argsort(ids, stable=True)
    sids = ids[order]
    svalid = sids != sentinel
    arange = jnp.arange(N, dtype=jnp.int32)
    is_first = jnp.concatenate([jnp.array([True]), sids[1:] != sids[:-1]])
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_first, arange, 0))

    # Appearance-ordered voxel slots (same scheme as voxelize()).
    app_key = jnp.where(is_first & svalid, order.astype(jnp.int32), jnp.int32(N))
    app_order = jnp.argsort(app_key)
    app_rank_at_pos = jnp.zeros(N, dtype=jnp.int32).at[app_order].set(arange)
    voxel_slot = app_rank_at_pos[seg_start]

    keep = svalid & (voxel_slot < max_voxels)
    slot = jnp.where(keep, voxel_slot, max_voxels)

    sfeats = feats[order]
    if reduce == "max":
        init = jnp.full((max_voxels, C), -jnp.inf, dtype=feats.dtype)
        voxel_feats = init.at[slot].max(
            jnp.where(keep[:, None], sfeats, -jnp.inf), mode="drop"
        )
        voxel_feats = jnp.where(jnp.isfinite(voxel_feats), voxel_feats, 0.0)
    else:
        voxel_feats = jnp.zeros((max_voxels, C), dtype=feats.dtype).at[slot].add(
            jnp.where(keep[:, None], sfeats, 0.0), mode="drop"
        )
        if reduce == "mean":
            counts = jnp.zeros((max_voxels,), dtype=feats.dtype).at[slot].add(
                keep.astype(feats.dtype), mode="drop"
            )
            voxel_feats = voxel_feats / jnp.maximum(counts[:, None], 1.0)

    voxel_coors = jnp.full((max_voxels, 3), -1, dtype=jnp.int32)
    voxel_coors = voxel_coors.at[jnp.where(keep & is_first, slot, max_voxels)].set(
        coors_zyx[order], mode="drop"
    )

    point2voxel = jnp.full((N,), max_voxels, dtype=jnp.int32)
    point2voxel = point2voxel.at[order].set(slot)

    num_voxels = jnp.minimum(jnp.sum(is_first & svalid), max_voxels).astype(jnp.int32)
    return voxel_feats, voxel_coors, point2voxel, num_voxels


class DynamicScatter:
    """Wrapper mirroring the reference module API (scatter_points.py:53)."""

    def __init__(self, voxel_size, point_cloud_range, average_points: bool = True,
                 max_voxels: int = 200000):
        from recondet3d.ops.voxelize import compute_grid_size

        self.voxel_size = tuple(float(v) for v in voxel_size)
        self.point_cloud_range = tuple(float(v) for v in point_cloud_range)
        self.average_points = average_points
        self.max_voxels = max_voxels
        self.grid = compute_grid_size(self.point_cloud_range, self.voxel_size)

    def __call__(self, feats, coors_zyx):
        return dynamic_scatter(
            feats,
            coors_zyx,
            grid=self.grid,
            max_voxels=self.max_voxels,
            reduce="mean" if self.average_points else "max",
        )
