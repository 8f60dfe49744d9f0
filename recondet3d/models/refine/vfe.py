"""Voxel feature encoders.

Re-implementations of (reference):
- HardSimpleVFE — mean of points per voxel
  (mmdetection3d/mmdet3d/models/voxel_encoders/voxel_encoder.py:16-49)
- DynamicSimpleVFE (:51-88) via dynamic scatter
- HardVoxelOccupancyVFE / SoftVoxelOccupancyVFE
  (projects/mmdet3d_plugin/models/backbone/voxel_occupancy_encoder.py:12-103)

All are pure jittable functions over static-capacity voxel buffers.
"""

from __future__ import annotations

import jax.numpy as jnp

from recondet3d.core.registry import VOXEL_ENCODERS

__all__ = [
    "hard_simple_vfe",
    "hard_voxel_occupancy_vfe",
    "soft_voxel_occupancy_vfe",
    "HardSimpleVFE",
    "HardVoxelOccupancyVFE",
    "SoftVoxelOccupancyVFE",
]


def hard_simple_vfe(voxels: jnp.ndarray, num_points: jnp.ndarray, num_features: int = 3):
    """(V, P, C), (V,) -> (V, num_features): mean of the valid points."""
    feats = voxels[..., :num_features]
    denom = jnp.clip(num_points, 1, None).astype(feats.dtype)[:, None]
    return feats.sum(axis=1) / denom


def hard_voxel_occupancy_vfe(voxels, num_points):
    """(V,) -> (V, 1) binary occupancy."""
    return (num_points > 0).astype(jnp.float32)[:, None]


def soft_voxel_occupancy_vfe(voxels, num_points, lambda_n=0.3, gamma_var=5.0, eps=1e-6):
    """p_occ = 1 - exp(-λn - γ·var) with masked xyz variance
    (reference: voxel_occupancy_encoder.py:41-103)."""
    V, P, _ = voxels.shape
    xyz = voxels[..., :3].astype(jnp.float32)
    mask = (jnp.arange(P)[None, :] < num_points[:, None]).astype(jnp.float32)[..., None]
    denom = num_points.astype(jnp.float32)[:, None] + eps
    mean = (xyz * mask).sum(axis=1) / denom
    diff = (xyz - mean[:, None]) * mask
    var = ((diff ** 2).sum(axis=1) / denom).mean(axis=1)
    n = num_points.astype(jnp.float32)
    occ = 1.0 - jnp.exp(-lambda_n * n - gamma_var * var)
    return occ[:, None]


@VOXEL_ENCODERS.register()
class HardSimpleVFE:
    def __init__(self, num_features: int = 3):
        self.num_features = num_features

    def __call__(self, voxels, num_points, coors=None):
        return hard_simple_vfe(voxels, num_points, self.num_features)


@VOXEL_ENCODERS.register()
class HardVoxelOccupancyVFE:
    def __call__(self, voxels, num_points, coors=None):
        return hard_voxel_occupancy_vfe(voxels, num_points)


@VOXEL_ENCODERS.register()
class SoftVoxelOccupancyVFE:
    def __init__(self, lambda_n=0.3, gamma_var=5.0, eps=1e-6):
        self.lambda_n, self.gamma_var, self.eps = lambda_n, gamma_var, eps

    def __call__(self, voxels, num_points, coors=None):
        return soft_voxel_occupancy_vfe(
            voxels, num_points, self.lambda_n, self.gamma_var, self.eps
        )
