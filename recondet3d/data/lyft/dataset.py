"""Lyft dataset: nuScenes-schema info pkls + kaggle-style IoU mAP.

Re-implementation of the reference LyftDataset
(reference: mmdetection3d/mmdet3d/datasets/lyft_dataset.py +
core/evaluation/lyft_eval.py:90-290 — mAP averaged over 3D-IoU thresholds
0.5:0.05:0.95, greedy score-ordered matching per class). The data side
subclasses NuScenesDataset (same info schema, no velocity, 9 classes);
the IoU matrices run through the jitted exact rotated-overlap kernel.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from recondet3d.data.lyft.converter import LYFT_CLASSES
from recondet3d.data.nuscenes.dataset import NuScenesDataset

__all__ = ["LyftDataset", "lyft_map"]

IOU_THRESHOLDS = tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))


def _iou3d(gts: np.ndarray, preds: np.ndarray) -> np.ndarray:
    """(G, 7) x (P, 7) -> (G, P) 3D IoU via the jitted kernel."""
    if len(gts) == 0 or len(preds) == 0:
        return np.zeros((len(gts), len(preds)), np.float32)
    import jax.numpy as jnp

    from recondet3d.ops.iou3d import boxes_iou_3d

    return np.asarray(
        boxes_iou_3d(jnp.asarray(gts, jnp.float32), jnp.asarray(preds, jnp.float32))
    )


def _single_class_aps(
    gt_by_sample: Dict[str, np.ndarray],
    pred_by_sample: Dict[str, List],
    thresholds=IOU_THRESHOLDS,
) -> np.ndarray:
    """AP per IoU threshold (reference: lyft_eval.py get_single_class_aps:
    199-290 — global score-ordered greedy matching, 1-point-interp-free
    precision/recall integration via np.trapz-style all-point interp)."""
    n_gt = sum(len(v) for v in gt_by_sample.values())
    all_preds = []
    for token, items in pred_by_sample.items():
        for box, score in items:
            all_preds.append((score, token, box))
    all_preds.sort(key=lambda x: -x[0])
    T = len(thresholds)
    tps = np.zeros((len(all_preds), T))
    fps = np.zeros((len(all_preds), T))
    matched = {
        tok: np.zeros((len(v), T), bool) for tok, v in gt_by_sample.items()
    }
    iou_cache: Dict[str, np.ndarray] = {}
    pred_index: Dict[str, List[int]] = {}
    for rank, (score, token, box) in enumerate(all_preds):
        gts = gt_by_sample.get(token, np.zeros((0, 7)))
        if len(gts) == 0:
            fps[rank] = 1
            continue
        ious = _iou3d(gts, np.asarray(box, np.float32)[None])[:, 0]
        order = np.argsort(-ious)
        for t, thr in enumerate(thresholds):
            hit = False
            for g in order:
                if ious[g] <= thr:
                    break
                if not matched[token][g, t]:
                    matched[token][g, t] = True
                    hit = True
                    break
            tps[rank, t] = hit
            fps[rank, t] = not hit
    aps = np.zeros(T)
    if n_gt == 0 or not all_preds:
        return aps
    ctp = np.cumsum(tps, axis=0)
    cfp = np.cumsum(fps, axis=0)
    recall = ctp / n_gt
    precision = ctp / np.maximum(ctp + cfp, 1e-9)
    for t in range(T):
        r = np.concatenate([[0], recall[:, t], [1]])
        p = np.concatenate([[0], precision[:, t], [0]])
        for i in range(len(p) - 1, 0, -1):
            p[i - 1] = max(p[i - 1], p[i])
        idx = np.where(r[1:] != r[:-1])[0]
        aps[t] = float(np.sum((r[idx + 1] - r[idx]) * p[idx + 1]))
    return aps


def lyft_map(
    gt_annos: Dict[str, Dict[str, np.ndarray]],
    results: Dict[str, List],
    class_names: Sequence[str] = LYFT_CLASSES,
):
    """gt_annos: token -> {'boxes' (N, 7), 'names' (N,)};
    results: token -> list of (box (7,), score, name).
    Returns (mAPs per class, overall mAP) at IoU 0.5:0.05:0.95."""
    class_aps = {}
    for cls in class_names:
        gt_by = {
            tok: a["boxes"][np.asarray(a["names"]) == cls]
            if len(a["boxes"]) else np.zeros((0, 7))
            for tok, a in gt_annos.items()
        }
        pred_by = {
            tok: [(b, s) for (b, s, n) in items if n == cls]
            for tok, items in results.items()
        }
        class_aps[cls] = float(np.mean(_single_class_aps(gt_by, pred_by)))
    return class_aps, float(np.mean(list(class_aps.values())))


class LyftDataset(NuScenesDataset):
    CLASSES = LYFT_CLASSES

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("with_velocity", False)
        kwargs.setdefault("classes", LYFT_CLASSES)
        super().__init__(*args, **kwargs)

    def evaluate(self, results, **kwargs):
        """results: token -> list of (box (7+,), score, name). Returns the
        kaggle metric dict (reference: lyft_dataset.py evaluate ->
        lyft_eval)."""
        gt_annos = {}
        for info in self.data_infos:
            gt_annos[info["token"]] = {
                "boxes": np.asarray(info["gt_boxes"]).reshape(-1, 7),
                "names": np.asarray(info["gt_names"]),
            }
        class_aps, overall = lyft_map(gt_annos, results, self.CLASSES)
        out = {f"mAP/{k}": v for k, v in class_aps.items()}
        out["mAP"] = overall
        return out
