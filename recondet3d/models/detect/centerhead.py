"""CenterPoint-style detection head on BEV features.

Re-implementation of the reference's dense-head capability
(reference: mmdetection3d/mmdet3d/models/dense_heads/centerpoint_head.py
— CenterHead with per-task heatmap + reg/height/dim/rot/vel branches,
gaussian focal loss, L1 regression, top-K + circle/rotated NMS decode;
the ResDet3D config scaffolds a TransFusion-ready head as None —
ResDet3D.py:26, pts_bbox_head=None — this head completes the detection
path on the refinement trunk's BEV features).

TPU design: target heatmaps are drawn fully vectorized (max over a
static max_objs of per-object gaussians — no numba draw loops); decode
is a static top-K gather; NMS runs on the jitted rotated-NMS op or the
native host op.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CenterHead", "gaussian_radius", "draw_heatmap"]

DEFAULT_TASKS = (
    ("car",),
    ("truck", "construction_vehicle"),
    ("bus", "trailer"),
    ("barrier",),
    ("motorcycle", "bicycle"),
    ("pedestrian", "traffic_cone"),
)


def gaussian_radius(dims_xy, min_overlap: float = 0.1):
    """CornerNet-style radius from BEV box dims (feature cells)."""
    w, l = dims_xy[..., 0], dims_xy[..., 1]
    a1 = 1
    b1 = w + l
    c1 = w * l * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, 0, None))) / 2
    a2 = 4
    b2 = 2 * (w + l)
    c2 = (1 - min_overlap) * w * l
    r2 = (b2 + jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, 0, None))) / (2 * a2)
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (w + l)
    c3 = (min_overlap - 1) * w * l
    r3 = (b3 + jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0, None))) / (2 * a3)
    return jnp.maximum(jnp.minimum(jnp.minimum(r1, r2), r3), 0.0)


def draw_heatmap(centers, radii, valid, hw: Tuple[int, int]):
    """Vectorized gaussian splat: centers (M, 2) feature coords, radii (M,),
    valid (M,) -> (H, W) heatmap (max over objects)."""
    H, W = hw
    ys = jnp.arange(H, dtype=jnp.float32)[:, None, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :, None]
    dx = xs - centers[None, None, :, 0]
    dy = ys - centers[None, None, :, 1]
    sigma = jnp.clip((2 * radii + 1) / 6.0, 1e-3, None)
    g = jnp.exp(-(dx ** 2 + dy ** 2) / (2 * sigma[None, None] ** 2))
    g = jnp.where(valid[None, None], g, 0.0)
    return jnp.max(g, axis=-1)


class _TaskBranch(nn.Module):
    n_cls: int
    share_ch: int = 64
    code_size: int = 10  # reg2 + height1 + dim3 + rot2 + vel2

    @nn.compact
    def __call__(self, x, train: bool = False):
        def head(out_ch, name, bias_init=0.0):
            h = nn.Conv(self.share_ch, (3, 3), padding=1, name=f"{name}_conv")(x)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"{name}_bn")(h)
            h = jax.nn.relu(h)
            return nn.Conv(
                out_ch, (3, 3), padding=1,
                bias_init=nn.initializers.constant(bias_init), name=f"{name}_out",
            )(h)

        return dict(
            heatmap=head(self.n_cls, "hm", bias_init=-2.19),  # focal prior
            reg=head(2, "reg"),
            height=head(1, "height"),
            dim=head(3, "dim"),
            rot=head(2, "rot"),
            vel=head(2, "vel"),
        )


class CenterHead(nn.Module):
    in_channels: int = 256
    tasks: Sequence[Sequence[str]] = DEFAULT_TASKS
    share_ch: int = 64
    point_cloud_range: Sequence[float] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    voxel_size: Sequence[float] = (0.075, 0.075, 0.2)
    out_size_factor: int = 8
    max_objs: int = 500
    gaussian_overlap: float = 0.1
    min_radius: float = 2.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 0.25
    code_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2)

    @nn.compact
    def __call__(self, bev_feats, train: bool = False):
        """bev_feats (B, H, W, C) -> list of per-task output dicts."""
        x = nn.Conv(self.share_ch, (3, 3), padding=1, name="shared_conv")(bev_feats)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="shared_bn")(x)
        x = jax.nn.relu(x)
        return [
            _TaskBranch(len(t), self.share_ch, name=f"task_{i}")(x, train)
            for i, t in enumerate(self.tasks)
        ]

    # ------------------------------------------------------------------
    # targets + loss (pure functions of the module config)
    # ------------------------------------------------------------------
    def class_to_task(self):
        mapping = {}
        for ti, cls_list in enumerate(self.tasks):
            for ci, name in enumerate(cls_list):
                mapping[name] = (ti, ci)
        return mapping

    def get_targets(self, gt_boxes, gt_labels, gt_valid, class_names):
        """gt_boxes (B, M, 9), gt_labels (B, M), gt_valid (B, M) ->
        per-task dict(heatmap (B, H, W, C_t), anno (B, max_objs, 10),
        inds (B, max_objs), mask (B, max_objs))."""
        pcr = np.asarray(self.point_cloud_range)
        vs = np.asarray(self.voxel_size)
        fs = self.out_size_factor
        W = int(round((pcr[3] - pcr[0]) / vs[0])) // fs
        H = int(round((pcr[4] - pcr[1]) / vs[1])) // fs
        mapping = self.class_to_task()
        # label id -> (task, in-task class)
        task_of = np.full(len(class_names), -1, np.int32)
        cls_of = np.zeros(len(class_names), np.int32)
        for li, name in enumerate(class_names):
            if name in mapping:
                task_of[li], cls_of[li] = mapping[name]
        task_of_j = jnp.asarray(task_of)
        cls_of_j = jnp.asarray(cls_of)

        B, M = gt_boxes.shape[:2]
        boxes = gt_boxes.astype(jnp.float32)
        cx = (boxes[..., 0] - pcr[0]) / (vs[0] * fs)
        cy = (boxes[..., 1] - pcr[1]) / (vs[1] * fs)
        in_grid = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
        dims_feat = jnp.stack(
            [boxes[..., 3] / (vs[0] * fs), boxes[..., 4] / (vs[1] * fs)], -1
        )
        radii = jnp.maximum(
            gaussian_radius(dims_feat, self.gaussian_overlap), self.min_radius
        )

        ix = jnp.clip(cx.astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(cy.astype(jnp.int32), 0, H - 1)
        inds = iy * W + ix
        vel = boxes[..., 7:9] if boxes.shape[-1] >= 9 else jnp.zeros(boxes.shape[:2] + (2,))
        anno = jnp.concatenate(
            [
                (cx - ix.astype(jnp.float32))[..., None],
                (cy - iy.astype(jnp.float32))[..., None],
                (boxes[..., 2] + boxes[..., 5] * 0.5)[..., None],  # gravity z
                jnp.log(jnp.clip(boxes[..., 3:6], 1e-6, None)),
                jnp.sin(boxes[..., 6])[..., None],
                jnp.cos(boxes[..., 6])[..., None],
                vel,
            ],
            axis=-1,
        )  # (B, M, 10)

        targets = []
        gt_task = task_of_j[jnp.clip(gt_labels, 0, len(class_names) - 1)]
        gt_cls = cls_of_j[jnp.clip(gt_labels, 0, len(class_names) - 1)]
        base_valid = gt_valid & (gt_labels >= 0) & in_grid
        # gaussians are centered on the integer cell (CenterPoint draws at
        # the int center; the reg branch learns the fractional offset) so
        # the peak is exactly 1 for the focal-loss positive mask
        centers = jnp.stack(
            [ix.astype(jnp.float32), iy.astype(jnp.float32)], axis=-1
        )
        for ti, cls_list in enumerate(self.tasks):
            tmask = base_valid & (gt_task == ti)
            hm = []
            for ci in range(len(cls_list)):
                m = tmask & (gt_cls == ci)
                hm.append(
                    jax.vmap(lambda c, r, v: draw_heatmap(c, r, v, (H, W)))(
                        centers, radii, m
                    )
                )
            heatmap = jnp.stack(hm, axis=-1)  # (B, H, W, C_t)
            targets.append(dict(heatmap=heatmap, anno=anno, inds=inds, mask=tmask))
        return targets

    def loss(self, preds, targets):
        """Gaussian focal heatmap loss + masked L1 regression."""
        losses = {}
        for ti, (pred, tgt) in enumerate(zip(preds, targets)):
            hm_pred = jnp.clip(jax.nn.sigmoid(pred["heatmap"]), 1e-4, 1 - 1e-4)
            hm_gt = tgt["heatmap"]
            pos = (hm_gt >= 1.0 - 1e-4).astype(jnp.float32)
            neg_w = (1 - hm_gt) ** 4
            pos_loss = -jnp.log(hm_pred) * (1 - hm_pred) ** 2 * pos
            neg_loss = -jnp.log(1 - hm_pred) * hm_pred ** 2 * neg_w * (1 - pos)
            n_pos = jnp.clip(jnp.sum(pos), 1.0, None)
            losses[f"task{ti}_loss_heatmap"] = (
                (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos * self.loss_cls_weight
            )

            reg_pred = jnp.concatenate(
                [pred["reg"], pred["height"], pred["dim"], pred["rot"], pred["vel"]],
                axis=-1,
            )  # (B, H, W, 10)
            B, H, W, C = reg_pred.shape
            flat = reg_pred.reshape(B, H * W, C)
            picked = jnp.take_along_axis(
                flat, tgt["inds"][..., None].astype(jnp.int32), axis=1
            )  # (B, max? M, 10)
            mask = tgt["mask"].astype(jnp.float32)[..., None]
            cw = jnp.asarray(self.code_weights)
            l1 = jnp.abs(picked - tgt["anno"]) * mask * cw
            losses[f"task{ti}_loss_bbox"] = (
                jnp.sum(l1) / jnp.clip(jnp.sum(mask) * C, 1.0, None)
                * self.loss_bbox_weight
            )
        return losses

    # ------------------------------------------------------------------
    # decode
    # ------------------------------------------------------------------
    def decode(self, preds, max_per_task: int = 128, score_threshold: float = 0.1,
               nms_thresh: float = 0.2, class_names=None):
        """Per-task top-K decode -> host-side dict of boxes/scores/labels
        per batch element (numpy), with rotated NMS.

        Labels are indices into the FLATTENED task order
        (``task_class_names()``) — the reference's convention, where the
        head's tasks enumerate every dataset class in order
        (reference: centerpoint head get_bboxes + nuscenes_dataset.py
        _format_bbox's ``self.CLASSES[label]``). A head whose tasks cover
        only a subset (e.g. the CI config's 3 classes) breaks that
        coincidence, so pass ``class_names`` (the dataset's class list) to
        remap labels into ITS index space before evaluation."""
        pcr = np.asarray(self.point_cloud_range)
        vs = np.asarray(self.voxel_size)
        fs = self.out_size_factor
        all_out = None
        label_base = 0
        outputs = []
        for ti, pred in enumerate(preds):
            hm = jax.nn.sigmoid(pred["heatmap"])  # (B, H, W, C)
            B, H, W, C = hm.shape
            flat = hm.reshape(B, -1)
            scores, idx = jax.lax.top_k(flat, max_per_task)
            cls = (idx % C).astype(jnp.int32)
            pix = idx // C
            iy = pix // W
            ix = pix % W

            def gather(field, k):
                f = pred[field].reshape(B, H * W, -1)
                return jnp.take_along_axis(f, pix[..., None], axis=1)

            reg = gather("reg", 2)
            height = gather("height", 1)
            dim = jnp.exp(gather("dim", 3))
            rot = gather("rot", 2)
            vel = gather("vel", 2)
            x = (ix.astype(jnp.float32) + reg[..., 0]) * vs[0] * fs + pcr[0]
            y = (iy.astype(jnp.float32) + reg[..., 1]) * vs[1] * fs + pcr[1]
            z = height[..., 0] - dim[..., 2] * 0.5  # gravity -> bottom
            yaw = jnp.arctan2(rot[..., 0], rot[..., 1])
            boxes = jnp.stack([x, y, z], -1)
            boxes = jnp.concatenate([boxes, dim, yaw[..., None], vel], axis=-1)
            outputs.append((boxes, scores, cls + label_base))
            label_base += C

        # host-side merge + NMS per sample
        label_map = None
        if class_names is not None:
            label_map = np.array(
                [list(class_names).index(n) for n in self.task_class_names()],
                np.int64,
            )
        results = []
        B = outputs[0][0].shape[0]
        from recondet3d.ops.iou3d import nms_bev

        for b in range(B):
            boxes = np.concatenate([np.asarray(o[0][b]) for o in outputs])
            scores = np.concatenate([np.asarray(o[1][b]) for o in outputs])
            labels = np.concatenate([np.asarray(o[2][b]) for o in outputs])
            keepm = scores >= score_threshold
            boxes, scores, labels = boxes[keepm], scores[keepm], labels[keepm]
            if len(boxes):
                bev = boxes[:, [0, 1, 3, 4, 6]]
                try:
                    from recondet3d.native import native_available, nms_bev_cpu

                    if native_available():
                        keep = nms_bev_cpu(bev, scores, nms_thresh)
                    else:
                        raise RuntimeError
                except Exception:
                    keep = np.asarray(
                        nms_bev(jnp.asarray(bev), jnp.asarray(scores), nms_thresh)
                    )
                boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
            if label_map is not None:
                labels = label_map[labels.astype(np.int64)]
            results.append(
                dict(boxes_3d=boxes, scores_3d=scores, labels_3d=labels)
            )
        return results

    def task_class_names(self):
        return [c for t in self.tasks for c in t]
