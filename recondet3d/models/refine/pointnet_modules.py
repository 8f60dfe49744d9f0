"""PointNet++ set-abstraction / feature-propagation modules.

Re-implementations of the reference pointnet2 machinery
(reference: mmdetection3d/mmdet3d/ops/pointnet_modules/ —
PointSAModule(MSG) using furthest_point_sample + ball_query +
group_points + shared MLPs + max pool, and PointFPModule using three_nn +
three_interpolate; backbones/pointnet2_sa_ssg.py composes them). Built on
the TPU ops (Pallas FPS, scan ball query, gather grouping).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recondet3d.ops.ball_query import ball_query
from recondet3d.ops.grouping import three_interpolate, three_nn
from recondet3d.ops.sampling import furthest_point_sample

__all__ = ["PointSAModule", "PointSAModuleMSG", "PointFPModule"]


class _SharedMLP(nn.Module):
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"bn{i}")(x)
            x = jax.nn.relu(x)
        return x


class PointSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction.

    xyz (N, 3) [+ feats (N, C)] -> (new_xyz (M, 3), new_feats (M, sum C'))."""

    num_point: int
    radii: Sequence[float]
    sample_nums: Sequence[int]
    mlp_channels: Sequence[Sequence[int]]
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, features=None, valid=None, train: bool = False):
        idx = furthest_point_sample(xyz, self.num_point, valid)
        new_xyz = xyz[idx]
        outs = []
        for bi, (r, k, mlp) in enumerate(
            zip(self.radii, self.sample_nums, self.mlp_channels)
        ):
            nbr = ball_query(0.0, r, k, xyz, new_xyz, points_valid=valid)
            grouped_xyz = xyz[nbr] - new_xyz[:, None]  # (M, k, 3)
            if features is not None:
                grouped = features[nbr]
                if self.use_xyz:
                    grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
            else:
                grouped = grouped_xyz
            h = _SharedMLP(tuple(mlp), name=f"mlp{bi}")(grouped, train)
            outs.append(jnp.max(h, axis=1))
        return new_xyz, jnp.concatenate(outs, axis=-1), idx


class PointSAModule(PointSAModuleMSG):
    """Single-scale convenience wrapper (reference PointSAModule)."""

    @classmethod
    def single(cls, num_point, radius, sample_num, mlp, **kw):
        return cls(num_point=num_point, radii=(radius,), sample_nums=(sample_num,),
                   mlp_channels=(tuple(mlp),), **kw)


class PointFPModule(nn.Module):
    """Feature propagation: interpolate coarse features back to fine points
    via inverse-distance 3-NN (reference PointFPModule)."""

    mlp_channels: Sequence[int]

    @nn.compact
    def __call__(self, target_xyz, source_xyz, target_feats, source_feats,
                 train: bool = False):
        dist, idx = three_nn(target_xyz, source_xyz)
        w = 1.0 / jnp.clip(dist, 1e-8, None)
        w = w / jnp.sum(w, axis=1, keepdims=True)
        interp = three_interpolate(source_feats.T, idx, w).T  # (Nt, C)
        if target_feats is not None:
            interp = jnp.concatenate([target_feats, interp], axis=-1)
        return _SharedMLP(tuple(self.mlp_channels), name="mlp")(interp, train)
