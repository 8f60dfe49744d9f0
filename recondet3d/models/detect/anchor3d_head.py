"""Anchor-based 3D detection head (SECOND / PointPillars style).

Re-implementation of the reference Anchor3DHead
(reference: mmdetection3d/mmdet3d/models/dense_heads/anchor3d_head.py:17-521
+ train_mixins.py anchor_target_3d/get_direction_target:318-347,
core/anchor/anchor_3d_generator.py Anchor3DRangeGenerator:9-213, and
core/bbox/coders/delta_xyzwhlr_bbox_coder.py:9-100).

TPU design: the whole training side — anchor grid, nearest-BEV IoU
assignment, delta encoding, focal/smooth-L1/dir losses — is one jitted
static-shape program. GT boxes arrive padded (B, G, code) with a (B, G)
mask; the reference's per-image/per-class python assignment loops become
one (A, G) IoU matrix with per-GT-class thresholds gathered per anchor
(equivalent to assign_per_class when thresholds are keyed by class, which
is how every mmdet3d config uses it). Dynamic-shape decode + NMS live on
the host in ``get_bboxes``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recondet3d.core.post_processing import box3d_multiclass_nms

__all__ = [
    "Anchor3DHead",
    "generate_anchors_3d",
    "delta_encode",
    "delta_decode",
    "get_direction_target",
]


def generate_anchors_3d(
    feature_size: Tuple[int, int],  # (H=y, W=x)
    ranges: Sequence[Sequence[float]],  # per-size [x0, y0, z0, x1, y1, z1]
    sizes: Sequence[Sequence[float]],  # per-size [dx, dy, dz]
    rotations: Sequence[float] = (0.0, math.pi / 2),
    custom_values: int = 0,
) -> np.ndarray:
    """(A, 7 + custom_values) anchors, A = H*W*len(sizes)*len(rotations).

    Centers are inclusive linspaces over each size's range; layout is
    y-major, then x, then size, then rotation — matching the reference
    Anchor3DRangeGenerator.anchors_single_range (anchor_3d_generator.py:
    148-213, permute [z, y, x, size, rot]) so targets align index-for-index
    with the head's (H, W, S*R*code) output reshape."""
    H, W = feature_size
    R = len(rotations)
    per_size = []
    for rng, size in zip(ranges, sizes):
        x = np.linspace(rng[0], rng[3], W)
        y = np.linspace(rng[1], rng[4], H)
        z = np.array([rng[2]])  # linspace(z0, z1, 1) == [z0] in the reference
        yy, xx = np.meshgrid(y, x, indexing="ij")  # (H, W)
        cen = np.stack(
            [xx, yy, np.broadcast_to(z, xx.shape)], axis=-1
        )  # (H, W, 3)
        a = np.concatenate(
            [
                np.broadcast_to(cen[:, :, None, None, :], (H, W, 1, R, 3)),
                np.broadcast_to(
                    np.asarray(size, np.float64)[None, None, None, None, :],
                    (H, W, 1, R, 3),
                ),
                np.broadcast_to(
                    np.asarray(rotations, np.float64)[None, None, None, :, None],
                    (H, W, 1, R, 1),
                ),
            ],
            axis=-1,
        )  # (H, W, 1, R, 7)
        per_size.append(a)
    anchors = np.concatenate(per_size, axis=2)  # (H, W, S, R, 7)
    if custom_values:
        pad = np.zeros((*anchors.shape[:-1], custom_values))
        anchors = np.concatenate([anchors, pad], axis=-1)
    return anchors.reshape(-1, anchors.shape[-1]).astype(np.float32)


def delta_encode(anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Box -> regression deltas (reference: delta_xyzwhlr_bbox_coder.py:21-56
    — diagonal-normalized center offsets, log size ratios, raw yaw delta;
    z compared at gravity center)."""
    xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
    xg, yg, zg, dxg, dyg, dzg, rg = [gt[..., i] for i in range(7)]
    za = za + dza / 2
    zg = zg + dzg / 2
    diag = jnp.sqrt(dxa**2 + dya**2)
    out = [
        (xg - xa) / diag,
        (yg - ya) / diag,
        (zg - za) / dza,
        jnp.log(dxg / dxa),
        jnp.log(dyg / dya),
        jnp.log(dzg / dza),
        rg - ra,
    ]
    if anchors.shape[-1] > 7:
        out.append(gt[..., 7:] - anchors[..., 7:])
        return jnp.concatenate(
            [jnp.stack(out[:-1], -1), out[-1]], axis=-1
        )
    return jnp.stack(out, -1)


def delta_decode(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Regression deltas -> boxes (reference: delta_xyzwhlr_bbox_coder.py:
    58-100)."""
    xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
    xt, yt, zt, dxt, dyt, dzt, rt = [deltas[..., i] for i in range(7)]
    za = za + dza / 2
    diag = jnp.sqrt(dxa**2 + dya**2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * dza + za
    dxg = jnp.exp(dxt) * dxa
    dyg = jnp.exp(dyt) * dya
    dzg = jnp.exp(dzt) * dza
    rg = rt + ra
    zg = zg - dzg / 2
    out = jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], -1)
    if deltas.shape[-1] > 7:
        out = jnp.concatenate([out, deltas[..., 7:] + anchors[..., 7:]], -1)
    return out


def _limit_period(val, offset=0.5, period=jnp.pi * 2):
    return val - jnp.floor(val / period + offset) * period


def get_direction_target(anchors, reg_targets, dir_offset=0.0, num_bins=2):
    """Yaw -> direction bin (reference: train_mixins.py:318-347)."""
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = _limit_period(rot_gt - dir_offset, 0, 2 * jnp.pi)
    bins = jnp.floor(offset_rot / (2 * jnp.pi / num_bins)).astype(jnp.int32)
    return jnp.clip(bins, 0, num_bins - 1)


class Anchor3DHead(nn.Module):
    """Single-level anchor head over BEV features (B, H, W, C).

    ``anchor_ranges``/``anchor_sizes`` are per class (assign_per_class
    semantics: class i's anchors use its own size and thresholds)."""

    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    anchor_ranges: Sequence[Sequence[float]] = ((0, -40.0, -1.78, 70.4, 40.0, -1.78),)
    anchor_sizes: Sequence[Sequence[float]] = ((3.9, 1.6, 1.56),)
    anchor_rotations: Sequence[float] = (0.0, math.pi / 2)
    anchor_custom_values: int = 0  # e.g. 2 for nuScenes velocity
    # per-class assignment thresholds (scalar broadcast also accepted)
    pos_iou_thr: Sequence[float] = (0.6,)
    neg_iou_thr: Sequence[float] = (0.45,)
    dir_offset: float = 0.0
    # the reference class default is 1 (a known historical quirk that flips
    # decoded yaws by -pi); every working reference config sets 0, which is
    # the default here (reference: anchor3d_head.py:62 vs
    # configs/_base_/models/hv_pointpillars_fpn_nus.py:63)
    dir_limit_offset: float = 0.0
    use_direction_classifier: bool = True
    diff_rad_by_sin: bool = True
    # losses
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_beta: float = 1.0 / 9.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 2.0
    loss_dir_weight: float = 0.2

    @property
    def box_code_size(self) -> int:
        return 7 + self.anchor_custom_values

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_sizes) * len(self.anchor_rotations)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x (B, H, W, C) -> dict of cls_score (B, H, W, A*num_classes),
        bbox_pred (B, H, W, A*code), dir_pred (B, H, W, A*2)
        (reference: anchor3d_head.py:131-156 — three 1x1 convs)."""
        cls_score = nn.Conv(
            self.num_anchors * self.num_classes, (1, 1),
            bias_init=nn.initializers.constant(float(-np.log((1 - 0.01) / 0.01))),
            name="conv_cls",
        )(x)
        bbox_pred = nn.Conv(
            self.num_anchors * self.box_code_size, (1, 1), name="conv_reg"
        )(x)
        out = {"cls_score": cls_score, "bbox_pred": bbox_pred}
        if self.use_direction_classifier:
            out["dir_pred"] = nn.Conv(
                self.num_anchors * 2, (1, 1), name="conv_dir_cls"
            )(x)
        return out

    def anchors_for(self, feature_size: Tuple[int, int]) -> jnp.ndarray:
        return jnp.asarray(
            generate_anchors_3d(
                feature_size,
                ranges=self.anchor_ranges,
                sizes=self.anchor_sizes,
                rotations=self.anchor_rotations,
                custom_values=self.anchor_custom_values,
            )
        )

    # ---------------- training ----------------

    def get_targets(self, anchors, gt_bboxes, gt_labels, gt_mask):
        """Vectorized max-IoU assignment (reference: train_mixins.py
        anchor_target_3d + MaxIoUAssigner): nearest-BEV IoU matrix, per-GT
        class thresholds, lowest-IoU force match per GT.

        anchors (A, code); gt_bboxes (B, G, code); gt_labels (B, G) int;
        gt_mask (B, G) bool. Returns dict of labels (B, A) (num_classes =
        background), label_weights, bbox_targets (B, A, code), bbox_weights,
        dir_targets (B, A)."""
        from recondet3d.ops.iou3d import nearest_bev_iou

        pos_thr = jnp.asarray(
            np.broadcast_to(np.asarray(self.pos_iou_thr, np.float32),
                            (self.num_classes,))
        )
        neg_thr = jnp.asarray(
            np.broadcast_to(np.asarray(self.neg_iou_thr, np.float32),
                            (self.num_classes,))
        )

        def one(gt, labels, mask):
            iou = nearest_bev_iou(anchors, gt)  # (A, G)
            iou = jnp.where(mask[None, :], iou, -1.0)
            best_gt = jnp.argmax(iou, axis=1)  # (A,)
            best_iou = jnp.max(iou, axis=1)
            cls = jnp.clip(labels[best_gt], 0, self.num_classes - 1)
            a_pos = best_iou >= pos_thr[cls]
            a_neg = (best_iou < neg_thr[cls]) | (best_iou < 0)
            # force-match: each gt's best anchor is positive
            A = anchors.shape[0]
            gt_best_anchor = jnp.argmax(iou, axis=0)  # (G,)
            gt_has = mask & (jnp.max(iou, axis=0) > 1e-6)
            # A (out of bounds) as the invalid index: negative wraps in jnp
            scatter_idx = jnp.where(gt_has, gt_best_anchor, A)
            force = jnp.zeros(A, bool).at[scatter_idx].set(True, mode="drop")
            # the forced anchor's assigned gt becomes that gt
            forced_gt = jnp.full(A, -1, jnp.int32)
            forced_gt = forced_gt.at[scatter_idx].set(
                jnp.arange(gt.shape[0], dtype=jnp.int32), mode="drop"
            )
            assigned = jnp.where(forced_gt >= 0, forced_gt, best_gt)
            pos = a_pos | force
            neg = a_neg & ~pos

            out_labels = jnp.where(
                pos, labels[assigned], self.num_classes
            ).astype(jnp.int32)
            lw = (pos | neg).astype(jnp.float32)
            tgt = delta_encode(anchors, gt[assigned])
            tgt = jnp.where(pos[:, None], tgt, 0.0)
            bw = jnp.where(pos, 1.0, 0.0)
            dir_t = get_direction_target(anchors, tgt, self.dir_offset)
            return out_labels, lw, tgt, bw, dir_t

        labels, lw, tgt, bw, dir_t = jax.vmap(one)(gt_bboxes, gt_labels, gt_mask)
        return {
            "labels": labels,
            "label_weights": lw,
            "bbox_targets": tgt,
            "bbox_weights": bw,
            "dir_targets": dir_t,
        }

    def loss(self, preds, targets):
        """(reference: anchor3d_head.py loss/loss_single:191-372 — sigmoid
        focal cls over pos+neg anchors, smooth-L1 on sin-difference boxes
        over positives, CE direction loss; all averaged by num_pos)."""
        B = preds["cls_score"].shape[0]
        code = self.box_code_size
        cls = preds["cls_score"].reshape(B, -1, self.num_classes)
        box = preds["bbox_pred"].reshape(B, -1, code)
        labels = targets["labels"]
        lw = targets["label_weights"]
        tgt = targets["bbox_targets"]
        bw = targets["bbox_weights"]
        pos = bw > 0
        num_pos = jnp.clip(jnp.sum(pos), 1.0, None)

        # sigmoid focal loss
        onehot = jax.nn.one_hot(labels, self.num_classes)  # bg row -> zeros
        p = jax.nn.sigmoid(cls)
        pt = jnp.where(onehot > 0, p, 1 - p)
        alpha_t = jnp.where(
            onehot > 0, self.focal_alpha, 1 - self.focal_alpha
        )
        ce = -jnp.log(jnp.clip(pt, 1e-12, None))
        focal = alpha_t * (1 - pt) ** self.focal_gamma * ce
        loss_cls = jnp.sum(focal.sum(-1) * lw) / num_pos

        # smooth-L1 with sin-difference on yaw
        pred_box = box
        if self.diff_rad_by_sin:
            sin_p = jnp.sin(pred_box[..., 6]) * jnp.cos(tgt[..., 6])
            sin_t = jnp.cos(pred_box[..., 6]) * jnp.sin(tgt[..., 6])
            pred_box = pred_box.at[..., 6].set(sin_p)
            tgt = tgt.at[..., 6].set(sin_t)
        diff = jnp.abs(pred_box - tgt)
        sl1 = jnp.where(
            diff < self.smooth_l1_beta,
            0.5 * diff**2 / self.smooth_l1_beta,
            diff - 0.5 * self.smooth_l1_beta,
        )
        loss_bbox = jnp.sum(sl1 * bw[..., None]) / num_pos

        losses = {
            "loss_cls": self.loss_cls_weight * loss_cls,
            "loss_bbox": self.loss_bbox_weight * loss_bbox,
        }
        if self.use_direction_classifier and "dir_pred" in preds:
            dirp = preds["dir_pred"].reshape(B, -1, 2)
            logp = jax.nn.log_softmax(dirp, -1)
            dir_ce = -jnp.take_along_axis(
                logp, targets["dir_targets"][..., None], axis=-1
            )[..., 0]
            losses["loss_dir"] = self.loss_dir_weight * (
                jnp.sum(dir_ce * bw) / num_pos
            )
        return losses

    # ---------------- inference (host) ----------------

    def get_bboxes(
        self,
        preds,
        score_thr: float = 0.1,
        max_num: int = 50,
        nms_thr: float = 0.2,
        use_rotate_nms: bool = True,
    ):
        """Decode + per-class NMS on the host (reference:
        anchor3d_head.py get_bboxes_single:424-521, incl. the dir-bin yaw
        correction). Returns per-sample (boxes (n, code), scores, labels)."""
        cls = np.asarray(preds["cls_score"], np.float32)
        box = np.asarray(preds["bbox_pred"], np.float32)
        B, H, W = cls.shape[:3]
        anchors = np.asarray(self.anchors_for((H, W)))
        results = []
        for b in range(B):
            scores = 1 / (1 + np.exp(-cls[b].reshape(-1, self.num_classes)))
            deltas = box[b].reshape(-1, self.box_code_size)
            boxes = np.asarray(delta_decode(jnp.asarray(anchors), jnp.asarray(deltas)))
            dir_scores = None
            if self.use_direction_classifier and "dir_pred" in preds:
                dirp = np.asarray(preds["dir_pred"][b]).reshape(-1, 2)
                dir_scores = dirp.argmax(-1).astype(np.float32)
            padded = np.concatenate([scores, np.zeros((len(scores), 1))], -1)
            bev = boxes[:, [0, 1, 3, 4, 6]]
            out = box3d_multiclass_nms(
                boxes, bev, padded, score_thr, max_num,
                dict(use_rotate_nms=use_rotate_nms, nms_thr=nms_thr),
                mlvl_dir_scores=dir_scores,
            )
            bboxes, sc, lb = out[:3]
            if dir_scores is not None and len(bboxes):
                ds = out[3]
                dir_rot = (
                    bboxes[:, 6] - self.dir_offset
                    - np.floor(
                        (bboxes[:, 6] - self.dir_offset) / np.pi
                        + self.dir_limit_offset
                    ) * np.pi
                )
                bboxes[:, 6] = dir_rot + self.dir_offset + np.pi * ds
            results.append((bboxes, sc, lb))
        return results
