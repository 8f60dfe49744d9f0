"""ResDet3D: camera-only 3D detector built on reconstructed pseudo-LiDAR.

Re-implementation of the reference detector
(reference: projects/mmdet3d_plugin/models/detectors/ResDet3D.py:26-218,
an MVXTwoStageDetector subclass): routes feature extraction through the
reconstruction backbone, merges 'reconstruction_*' losses into the train
losses (:157-162), and returns per-sample pseudo point clouds at test
time (:184-213; the detection head is scaffolded — head config None in
the reference, matching behavior here until a head is attached).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from recondet3d.models.detect.reconstruction_backbone import ReconstructionBackbone

__all__ = ["ResDet3D"]


class ResDet3D(nn.Module):
    reconstruction_backbone: ReconstructionBackbone
    pts_bbox_head: Optional[nn.Module] = None

    def __call__(self, img, cam2lidar_rts, gt_points=None, gt_valid=None,
                 return_loss: bool = False, train: bool = False):
        return self.forward_train(img, cam2lidar_rts, gt_points, gt_valid, train) \
            if return_loss else self.simple_test(img, cam2lidar_rts)

    def forward_train(self, img, cam2lidar_rts, gt_points, gt_valid=None, train=True):
        """Returns losses dict with 'reconstruction_' prefixed keys
        (reference: ResDet3D.py:131-162)."""
        pts, msk, r_losses, aux = self.reconstruction_backbone(
            img, cam2lidar_rts, gt_points=gt_points, gt_valid=gt_valid,
            return_loss=True, train=train,
        )
        losses = {f"reconstruction_{k}": v for k, v in r_losses.items()}
        if self.pts_bbox_head is not None:
            raise NotImplementedError(
                "detection head training lands with the TransFusion-style head"
            )
        return losses, {"pseudo_points": pts, "pseudo_valid": msk, **aux}

    def simple_test(self, img, cam2lidar_rts):
        """Returns per-sample pseudo point clouds
        (reference: ResDet3D.py:184-213 bbox_list[i]['pseudo_points'])."""
        pts, msk, _, aux = self.reconstruction_backbone(
            img, cam2lidar_rts, return_loss=False, train=False,
        )
        return {"pseudo_points": pts, "pseudo_valid": msk, "aux": aux}
