"""SECOND backbone + SECONDFPN neck + PointPillars scatter + learned VFEs.

Re-implementations of the reference LiDAR model-zoo trunk
(reference: mmdetection3d/mmdet3d/models/backbones/second.py:11-90,
necks/second_fpn.py, middle_encoders/pillar_scatter.py:10-70,
voxel_encoders/voxel_encoder.py:51-470 DynamicSimpleVFE/DynamicVFE/
HardVFE with PFNLayer stacks). Channels-last flax; the pillar scatter is
one masked scatter instead of per-batch index loops; dynamic VFEs ride
the sort+segment dynamic_scatter op.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recondet3d.ops.scatter import dynamic_scatter
from recondet3d.ops.voxelize import compute_grid_size

__all__ = ["SECOND", "SECONDFPN", "PointPillarsScatter", "HardVFE", "DynamicVFE"]


class _ConvBNReLU(nn.Module):
    out_ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (3, 3), strides=self.stride, padding=1,
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        return jax.nn.relu(x)


class SECOND(nn.Module):
    in_channels: int = 128
    out_channels: Sequence[int] = (128, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """(B, H, W, C) -> tuple of multi-scale maps."""
        outs = []
        for i, (n, s, c) in enumerate(
            zip(self.layer_nums, self.layer_strides, self.out_channels)
        ):
            x = _ConvBNReLU(c, s, name=f"block{i}_down")(x, train)
            for j in range(n):
                x = _ConvBNReLU(c, 1, name=f"block{i}_conv{j}")(x, train)
            outs.append(x)
        return tuple(outs)


class _DeblockUp(nn.Module):
    out_ch: int
    stride: int  # >=1 upsample factor; <1 means strided conv downsample

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride >= 1:
            s = int(self.stride)
            B, H, W, C = x.shape
            if s > 1:
                # transposed conv with kernel==stride = exact depth-to-space
                w = self.param(
                    "kernel", nn.initializers.lecun_normal(),
                    (C, self.out_ch, s, s), jnp.float32,
                )
                t = jnp.einsum("bhwc,coyx->bhywxo", x, w)
                x = t.reshape(B, H * s, W * s, self.out_ch)
            else:
                x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False)(x)
        else:
            s = int(round(1 / self.stride))
            x = nn.Conv(self.out_ch, (s, s), strides=s, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        return jax.nn.relu(x)


class SECONDFPN(nn.Module):
    in_channels: Sequence[int] = (128, 128, 256)
    out_channels: Sequence[int] = (256, 256, 256)
    upsample_strides: Sequence[float] = (1, 2, 4)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        ups = [
            _DeblockUp(c, s, name=f"deblock{i}")(f, train)
            for i, (f, c, s) in enumerate(
                zip(feats, self.out_channels, self.upsample_strides)
            )
        ]
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]


class PointPillarsScatter(nn.Module):
    """(N, C) pillar features + (N, 4) [b, z, y, x] coords -> (B, ny, nx, C)
    pseudo image (reference: pillar_scatter.py:10-70; one masked scatter)."""

    in_channels: int
    output_shape: Tuple[int, int]  # (ny, nx)

    def __call__(self, voxel_features, coors, batch_size: int):
        ny, nx = self.output_shape
        valid = coors[:, 0] >= 0
        b = jnp.where(valid, coors[:, 0], batch_size)
        canvas = jnp.zeros((batch_size, ny, nx, voxel_features.shape[-1]),
                           voxel_features.dtype)
        feats = jnp.where(valid[:, None], voxel_features, 0)
        return canvas.at[b, coors[:, 2], coors[:, 3]].set(feats, mode="drop")


class _PFNLayer(nn.Module):
    out_ch: int
    last: bool = False

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        """x (V, P, C); mask (V, P)."""
        x = nn.Dense(self.out_ch, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, axis=-1)(x)
        x = jax.nn.relu(x)
        pooled = jnp.max(jnp.where(mask[..., None], x, -jnp.inf), axis=1)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        if self.last:
            return pooled
        rep = jnp.broadcast_to(pooled[:, None], x.shape)
        return jnp.concatenate([x, rep], axis=-1)


class HardVFE(nn.Module):
    """Learned voxel feature encoder over padded voxels
    (reference: voxel_encoder.py:290-470 — augments points with cluster
    and center offsets, PFN stack, masked max pool)."""

    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, voxels, num_points, coors, train: bool = False):
        """voxels (V, P, C), num_points (V,), coors (V, 4) [b,z,y,x]."""
        V, P, C = voxels.shape
        mask = jnp.arange(P)[None] < num_points[:, None]
        feats = [voxels]
        if self.with_cluster_center:
            denom = jnp.clip(num_points, 1, None)[:, None, None].astype(voxels.dtype)
            mean = jnp.sum(jnp.where(mask[..., None], voxels[..., :3], 0), 1,
                           keepdims=True) / denom
            feats.append(voxels[..., :3] - mean)
        if self.with_voxel_center:
            vs = jnp.asarray(self.voxel_size, voxels.dtype)
            mins = jnp.asarray(self.point_cloud_range[:3], voxels.dtype)
            centers = (coors[:, None, [3, 2, 1]].astype(voxels.dtype) + 0.5) * vs + mins
            feats.append(voxels[..., :3] - centers)
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(mask[..., None], x, 0)
        for i, c in enumerate(self.feat_channels):
            x = _PFNLayer(c, last=(i == len(self.feat_channels) - 1),
                          name=f"pfn{i}")(x, mask, train)
        return x  # (V, feat_channels[-1])


class DynamicVFE(nn.Module):
    """Dynamic (per-point) VFE via segment scatter
    (reference: voxel_encoder.py:90-290 — per-point MLP + voxel-mean
    augmentation + scatter max)."""

    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    max_voxels: int = 65536

    @nn.compact
    def __call__(self, points, coors_zyx, train: bool = False):
        """points (N, C), coors_zyx (N, 3) (-1 rows invalid) ->
        (voxel_feats (max_voxels, C'), voxel_coors (max_voxels, 3))."""
        grid = compute_grid_size(self.point_cloud_range, self.voxel_size)
        valid = jnp.all(coors_zyx >= 0, axis=-1)

        mean, vcoors, p2v, _ = dynamic_scatter(
            points[:, :3], coors_zyx, grid=grid, max_voxels=self.max_voxels,
            reduce="mean",
        )
        cluster_offset = points[:, :3] - mean[jnp.clip(p2v, 0, self.max_voxels - 1)]
        vs = jnp.asarray(self.voxel_size, points.dtype)
        mins = jnp.asarray(self.point_cloud_range[:3], points.dtype)
        centers = (coors_zyx[:, [2, 1, 0]].astype(points.dtype) + 0.5) * vs + mins
        x = jnp.concatenate(
            [points, cluster_offset, points[:, :3] - centers], axis=-1
        )
        x = jnp.where(valid[:, None], x, 0)
        for i, c in enumerate(self.feat_channels):
            x = nn.Dense(c, use_bias=False, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"bn{i}")(x)
            x = jax.nn.relu(x)
        vfeat, vcoors, _, _ = dynamic_scatter(
            x, coors_zyx, grid=grid, max_voxels=self.max_voxels, reduce="max"
        )
        return vfeat, vcoors
