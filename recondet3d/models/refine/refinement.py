"""Sparse voxel-based point-cloud refinement (occupancy training objective).

Re-implementation of the reference SparseRefinement
(reference: projects/mmdet3d_plugin/models/backbone/
sparse_refinement.py:251-717): voxelize pseudo points (0.075/0.075/0.2,
range ±54 / -5..3) -> HardSimpleVFE -> SparseEncoder -> BEV U-Net
occupancy logits (B, 180, 180, 32); GT LiDAR points voxelized on the
180x180x32 occupancy grid through SoftVoxelOccupancyVFE into a dense soft
target; BCE-with-logits loss.

TPU design: per-sample voxelization is a vmap of the static-shape
voxelize op; the (batch, z, y, x) coordinate flattening replaces the
reference's python concat loop (sparse_refinement.py:366-404);
``refined_points`` mirrors the reference TODO (returns the input,
sparse_refinement.py:712-714).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recondet3d.models.losses.occupancy_loss import OccupancyLoss
from recondet3d.models.refine.bev_unet import BEVHeightOccupancy
from recondet3d.models.refine.sparse_encoder import SparseEncoder
from recondet3d.models.refine.vfe import hard_simple_vfe, soft_voxel_occupancy_vfe
from recondet3d.ops.voxelize import compute_grid_size, voxelize

__all__ = ["SparseRefinement", "batch_voxelize"]


def batch_voxelize(points, valid, *, point_cloud_range, voxel_size, max_points, max_voxels):
    """(B, N, C) -> flattened (B*V, max_points, C) voxels, (B*V, 4) coords
    [b, z, y, x] (-1 pads), (B*V,) num_points."""
    B = points.shape[0]

    vox_fn = functools.partial(
        voxelize,
        point_cloud_range=tuple(point_cloud_range),
        voxel_size=tuple(voxel_size),
        max_points=max_points,
        max_voxels=max_voxels,
    )
    voxels, coors, nums, nvox = jax.vmap(vox_fn)(points, valid)
    batch_idx = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, max_voxels)
    )
    batch_idx = jnp.where(coors[..., 0] >= 0, batch_idx, -1)
    coors4 = jnp.concatenate([batch_idx[..., None], coors], axis=-1)
    V = max_voxels
    return (
        voxels.reshape(B * V, max_points, -1),
        coors4.reshape(B * V, 4),
        nums.reshape(B * V),
    )


class SparseRefinement(nn.Module):
    # voxelization of pseudo points
    point_cloud_range: Sequence[float] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    voxel_size: Sequence[float] = (0.075, 0.075, 0.2)
    max_num_points: int = 10
    max_voxels: int = 65536
    # occupancy target grid (X, Y, C)
    occ_feature_shape: Sequence[int] = (180, 180, 32)
    occ_max_voxels: int = 65536
    occ_max_num_points: int = 10
    soft_vfe: Tuple[float, float] = (0.3, 5.0)  # (lambda_n, gamma_var)
    use_color: bool = False
    loss_weight: float = 1.0
    # submodule configs
    sparse_shape: Sequence[int] = (41, 1440, 1440)
    encoder_out_channels: int = 128
    unet_channels: Sequence[int] = (256, 512, 1024, 2048)
    stage_caps: Sequence[int] = (65536, 49152, 32768, 16384)
    loss_type: str = "bce"
    occupancy_loss_weight: float = 10.0
    # computation dtype of the sparse encoder + BEV U-Net (params and BN
    # statistics stay f32; the loss and logits are f32)
    dtype: object = jnp.float32

    def setup(self):
        self.middle_encoder = SparseEncoder(
            in_channels=3 if not self.use_color else 6,
            sparse_shape=tuple(self.sparse_shape),
            output_channels=self.encoder_out_channels,
            stage_caps=tuple(self.stage_caps),
        )
        self.bev_height_occupancy = BEVHeightOccupancy(
            in_channels=self.encoder_out_channels * 2,
            unet_channels=tuple(self.unet_channels),
            occ_feature_shape=tuple(self.occ_feature_shape),
            dtype=self.dtype,
        )
        self.loss_occupancy = OccupancyLoss(
            loss_type=self.loss_type, loss_weight=self.occupancy_loss_weight
        )
        pcr = np.asarray(self.point_cloud_range, np.float64)
        occ_shape = np.asarray(self.occ_feature_shape, np.float64)
        self._occ_voxel_size = tuple((pcr[3:] - pcr[:3]) / occ_shape)

    def __call__(
        self,
        pseudo_points: jnp.ndarray,  # (B, N, C)
        pseudo_valid: Optional[jnp.ndarray] = None,  # (B, N) bool
        gt_points: Optional[jnp.ndarray] = None,  # (B, M, 3)
        gt_valid: Optional[jnp.ndarray] = None,
        return_loss: bool = False,
        train: bool = False,
    ):
        B = pseudo_points.shape[0]
        pts = pseudo_points if self.use_color else pseudo_points[..., :3]
        if pseudo_valid is None:
            pseudo_valid = jnp.ones(pts.shape[:2], bool)

        voxels, coors, nums = batch_voxelize(
            pts, pseudo_valid,
            point_cloud_range=self.point_cloud_range,
            voxel_size=self.voxel_size,
            max_points=self.max_num_points,
            max_voxels=self.max_voxels,
        )
        voxel_feats = hard_simple_vfe(voxels, nums, num_features=pts.shape[-1])
        voxel_feats = jnp.where((coors[:, 0] >= 0)[:, None], voxel_feats, 0)
        voxel_feats = voxel_feats.astype(self.dtype)

        # stage-seam barriers: letting XLA fuse the voxelize sort machinery
        # into the encoder's gathers (and the sparse BEV scatter into the
        # U-Net convs) measured +38 ms on the fused graph vs the parts
        # (scripts/bench_refinement.py scan rows: encoder alone 48.5 ms,
        # fused forward 90.7 ms before these barriers)
        voxel_feats, coors = jax.lax.optimization_barrier((voxel_feats, coors))
        sparse_features = self.middle_encoder(voxel_feats, coors, B, train=train)
        sparse_features = jax.lax.optimization_barrier(sparse_features)
        occupancy_logits = self.bev_height_occupancy(sparse_features, train=train)

        losses: Dict[str, jnp.ndarray] = {}
        aux = {
            "occupancy_logits": occupancy_logits,
            "pseudo_coors": coors,
            "bev_features": sparse_features,
        }
        if gt_points is not None:
            gt_map = self.generate_gt_occupancy_map(gt_points, gt_valid)
            aux["gt_occupancy_map"] = gt_map
            if return_loss:
                losses["loss_occupancy"] = self.loss_occupancy(
                    occupancy_logits, gt_map, use_logits=True
                )

        # reference returns the input as refined_points (TODO at :712-714)
        refined_points = pseudo_points
        return refined_points, losses, aux

    def generate_gt_occupancy_map(self, gt_points, gt_valid=None):
        """GT points -> dense (B, Y, X, C) soft occupancy
        (reference: sparse_refinement.py:533-587)."""
        B = gt_points.shape[0]
        if gt_valid is None:
            gt_valid = jnp.ones(gt_points.shape[:2], bool)
        voxels, coors, nums = batch_voxelize(
            gt_points[..., :3], gt_valid,
            point_cloud_range=self.point_cloud_range,
            voxel_size=self._occ_voxel_size,
            max_points=self.occ_max_num_points,
            max_voxels=self.occ_max_voxels,
        )
        occ = soft_voxel_occupancy_vfe(voxels, nums, *self.soft_vfe)  # (B*V, 1)
        X, Y, C = self.occ_feature_shape
        gt_map = jnp.zeros((B, Y, X, C), jnp.float32)
        valid = coors[:, 0] >= 0
        b = jnp.where(valid, coors[:, 0], B)
        gt_map = gt_map.at[b, coors[:, 2], coors[:, 3], coors[:, 1]].set(
            occ[:, 0], mode="drop"
        )
        return gt_map
