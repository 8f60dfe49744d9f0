"""Indoor datasets (ScanNet / SUN RGB-D / S3DIS) + indoor AP evaluation.

Re-implementation of the reference indoor dataset stack
(reference: mmdetection3d/mmdet3d/datasets/{scannet,sunrgbd,s3dis}_dataset.py
+ core/evaluation/indoor_eval.py:8-260 — per-class score-ordered greedy
matching at IoU thresholds (default 0.25/0.5), 'area'-mode AP). Boxes are
the depth-frame (N, 6|7) ``gt_boxes_upright_depth`` arrays the converters
emit; yawed boxes route through the exact rotated-IoU kernel, yaw-free
boxes use a pure-numpy axis-aligned IoU.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from recondet3d.data.indoor.converter import (
    S3DIS_CLASSES,
    SCANNET_CLASSES,
    SUNRGBD_CLASSES,
)

__all__ = [
    "indoor_eval", "average_precision",
    "ScanNetDataset", "SUNRGBDDataset", "S3DISDataset",
]


def average_precision(recalls: np.ndarray, precisions: np.ndarray) -> float:
    """'area' mode AP (reference: indoor_eval.py:8-44)."""
    mrec = np.concatenate([[0.0], recalls, [1.0]])
    mpre = np.concatenate([[0.0], precisions, [0.0]])
    for i in range(len(mpre) - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def _iou_3d(gts: np.ndarray, preds: np.ndarray) -> np.ndarray:
    """(G, 6|7) x (P, 6|7) -> (G, P) 3D IoU; bottom-center z boxes."""
    if len(gts) == 0 or len(preds) == 0:
        return np.zeros((len(gts), len(preds)), np.float32)
    g = np.asarray(gts, np.float32)
    p = np.asarray(preds, np.float32)
    if g.shape[1] == 6:
        g = np.concatenate([g, np.zeros((len(g), 1), np.float32)], -1)
    if p.shape[1] == 6:
        p = np.concatenate([p, np.zeros((len(p), 1), np.float32)], -1)
    if np.abs(g[:, 6]).max(initial=0) > 1e-6 or np.abs(p[:, 6]).max(initial=0) > 1e-6:
        import jax.numpy as jnp

        from recondet3d.ops.iou3d import boxes_iou_3d

        return np.asarray(boxes_iou_3d(jnp.asarray(g), jnp.asarray(p)))
    # axis-aligned: pure numpy
    gmin = g[:, :3] - g[:, 3:6] / 2
    gmax = g[:, :3] + g[:, 3:6] / 2
    gmin[:, 2], gmax[:, 2] = g[:, 2], g[:, 2] + g[:, 5]
    pmin = p[:, :3] - p[:, 3:6] / 2
    pmax = p[:, :3] + p[:, 3:6] / 2
    pmin[:, 2], pmax[:, 2] = p[:, 2], p[:, 2] + p[:, 5]
    lo = np.maximum(gmin[:, None], pmin[None])
    hi = np.minimum(gmax[:, None], pmax[None])
    inter = np.clip(hi - lo, 0, None).prod(-1)
    vg = (gmax - gmin).prod(-1)
    vp = (pmax - pmin).prod(-1)
    return inter / np.clip(vg[:, None] + vp[None] - inter, 1e-8, None)


def indoor_eval(
    gt_annos: List[dict],
    dt_annos: List[dict],
    metric: Sequence[float] = (0.25, 0.5),
    label2cat: Optional[Dict[int, str]] = None,
):
    """gt_annos[i]: {'gt_boxes_upright_depth' (N, 6|7), 'class' (N,)};
    dt_annos[i]: {'boxes_3d' (M, 6|7), 'labels_3d' (M,), 'scores_3d' (M,)}.
    Returns {f'{cls}_AP_{thr}': v, f'mAP_{thr}': v, ...}
    (reference: indoor_eval.py indoor_eval:204-260 + eval_det_cls:56-161)."""
    classes = sorted(
        {int(c) for a in gt_annos for c in np.asarray(a.get("class", [])).reshape(-1)}
        | {int(c) for a in dt_annos for c in np.asarray(a.get("labels_3d", [])).reshape(-1)}
    )
    out = {}
    aps = {t: [] for t in metric}
    for cls in classes:
        # gather per-sample gt/pred of this class
        n_gt = 0
        preds = []  # (score, sample, box)
        gts = []
        for i, (g, d) in enumerate(zip(gt_annos, dt_annos)):
            gb = np.asarray(g.get("gt_boxes_upright_depth", np.zeros((0, 7))))
            gc = np.asarray(g.get("class", np.zeros((0,), int)))
            gts.append(gb[gc == cls] if len(gb) else gb.reshape(0, gb.shape[-1] if gb.size else 7))
            n_gt += len(gts[-1])
            db = np.asarray(d.get("boxes_3d", np.zeros((0, 7))))
            dl = np.asarray(d.get("labels_3d", np.zeros((0,), int)))
            ds = np.asarray(d.get("scores_3d", np.zeros((0,))))
            for b, s in zip(db[dl == cls], ds[dl == cls]):
                preds.append((float(s), i, b))
        preds.sort(key=lambda x: -x[0])
        name = label2cat[cls] if label2cat else str(cls)
        for thr in metric:
            matched = [np.zeros(len(g), bool) for g in gts]
            tp = np.zeros(len(preds))
            fp = np.zeros(len(preds))
            for r, (s, i, b) in enumerate(preds):
                ious = _iou_3d(gts[i], b[None])[:, 0] if len(gts[i]) else np.zeros(0)
                j = int(np.argmax(ious)) if len(ious) else -1
                if j >= 0 and ious[j] >= thr and not matched[i][j]:
                    matched[i][j] = True
                    tp[r] = 1
                else:
                    fp[r] = 1
            if n_gt == 0 or not preds:
                ap = 0.0
                rec = 0.0
            else:
                ctp, cfp = np.cumsum(tp), np.cumsum(fp)
                recalls = ctp / n_gt
                precisions = ctp / np.maximum(ctp + cfp, 1e-9)
                ap = average_precision(recalls, precisions)
                rec = float(recalls[-1])
            out[f"{name}_AP_{thr:.2f}"] = ap
            out[f"{name}_rec_{thr:.2f}"] = rec
            aps[thr].append(ap)
    for thr in metric:
        out[f"mAP_{thr:.2f}"] = float(np.mean(aps[thr])) if aps[thr] else 0.0
    return out


class _IndoorDataset:
    CLASSES: Sequence[str] = ()

    def __init__(self, ann_file: str, data_root: str = "",
                 pipeline: Optional[Sequence] = None, test_mode: bool = False,
                 **kwargs):
        self.data_root = data_root or os.path.dirname(ann_file)
        self.test_mode = test_mode
        self.pipeline = pipeline
        with open(ann_file, "rb") as f:
            self.data_infos = pickle.load(f)

    def __len__(self):
        return len(self.data_infos)

    def get_data_info(self, index: int) -> dict:
        info = self.data_infos[index]
        return dict(
            sample_idx=info["point_cloud"]["lidar_idx"],
            pts_filename=os.path.join(self.data_root, info["pts_path"]),
            ann_info=self.get_ann_info(index),
        )

    def get_ann_info(self, index: int) -> dict:
        a = self.data_infos[index].get("annos", {})
        n = a.get("gt_num", 0)
        if not n:
            return dict(
                gt_bboxes_3d=np.zeros((0, 7)), gt_labels_3d=np.zeros((0,), int)
            )
        boxes = np.asarray(a["gt_boxes_upright_depth"])
        return dict(gt_bboxes_3d=boxes, gt_labels_3d=np.asarray(a["class"]))

    def evaluate(self, results: List[dict], metric=(0.25, 0.5), **kwargs):
        """results[i]: {'boxes_3d', 'labels_3d', 'scores_3d'}
        (reference: scannet_dataset.py evaluate -> indoor_eval)."""
        gt = [i.get("annos", {}) for i in self.data_infos]
        label2cat = dict(enumerate(self.CLASSES))
        return indoor_eval(gt, results, metric=metric, label2cat=label2cat)


class ScanNetDataset(_IndoorDataset):
    CLASSES = SCANNET_CLASSES


class SUNRGBDDataset(_IndoorDataset):
    CLASSES = SUNRGBD_CLASSES


class S3DISDataset(_IndoorDataset):
    CLASSES = S3DIS_CLASSES
