"""Occupancy losses (bce / focal / dice / bce_dice).

Re-implementation of the reference OccupancyLoss
(reference: projects/mmdet3d_plugin/models/losses/occupancy_loss.py:8-230)
with identical math — BCE-with-logits default, focal with alpha/gamma,
dice over flattened spatial dims, per-channel weights, mean/sum/none
reductions, loss_weight scaling.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from recondet3d.core.registry import LOSSES

__all__ = ["OccupancyLoss", "binary_cross_entropy_with_logits"]


def binary_cross_entropy_with_logits(logits, targets):
    """Numerically stable BCE-with-logits (elementwise)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


@LOSSES.register()
class OccupancyLoss:
    def __init__(
        self,
        loss_type: str = "bce",
        reduction: str = "mean",
        loss_weight: float = 1.0,
        focal_alpha: float = 0.25,
        focal_gamma: float = 2.0,
        dice_weight: float = 0.5,
        pos_weight=None,
        channel_weights: Optional[Sequence[float]] = None,
    ):
        assert loss_type in ("bce", "focal", "dice", "bce_dice")
        assert reduction in ("none", "sum", "mean")
        self.loss_type = loss_type
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.focal_alpha = focal_alpha
        self.focal_gamma = focal_gamma
        self.dice_weight = dice_weight
        self.channel_weights = (
            None if channel_weights is None else jnp.asarray(channel_weights, jnp.float32)
        )

    def _bce(self, logits, target, use_logits):
        if use_logits:
            return binary_cross_entropy_with_logits(logits, target)
        p = jnp.clip(logits, 1e-6, 1 - 1e-6)
        return -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))

    def _focal(self, prob, target):
        bce = -(target * jnp.log(jnp.clip(prob, 1e-12, None))
                + (1 - target) * jnp.log(jnp.clip(1 - prob, 1e-12, None)))
        p_t = prob * target + (1 - prob) * (1 - target)
        w = (1 - p_t) ** self.focal_gamma
        alpha_t = self.focal_alpha * target + (1 - self.focal_alpha) * (1 - target)
        return alpha_t * w * bce

    def _dice(self, prob, target, smooth=1e-6):
        B, C = prob.shape[0], prob.shape[-1]
        pf = prob.reshape(B, -1, C)
        tf = target.reshape(B, -1, C)
        inter = jnp.sum(pf * tf, axis=1)
        union = jnp.sum(pf, axis=1) + jnp.sum(tf, axis=1)
        dice = (2.0 * inter + smooth) / (union + smooth)
        return 1.0 - dice  # (B, C)

    def __call__(self, pred, target, reduction_override=None, use_logits: bool = True):
        """pred/target: (B, H, W, C) channels-last (logits if use_logits)."""
        reduction = reduction_override or self.reduction
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        prob = jax.nn.sigmoid(pred) if use_logits else jnp.clip(pred, 1e-6, 1 - 1e-6)

        if self.loss_type == "bce":
            loss = self._bce(pred, target, use_logits)
        elif self.loss_type == "focal":
            loss = self._focal(prob, target)
        elif self.loss_type == "dice":
            d = self._dice(prob, target)  # (B, C)
            loss = jnp.broadcast_to(d[:, None, None, :], pred.shape)
        else:  # bce_dice
            bce = self._bce(pred, target, use_logits)
            d = self._dice(prob, target)
            loss = bce + self.dice_weight * jnp.broadcast_to(d[:, None, None, :], pred.shape)

        if self.channel_weights is not None:
            loss = loss * self.channel_weights

        if reduction == "mean":
            loss = loss.mean()
        elif reduction == "sum":
            loss = loss.sum()
        return loss * self.loss_weight
