"""Self-contained nuScenes detection evaluation: mAP + NDS.

The reference evaluates through the nuScenes devkit's NuScenesEval
(reference: mmdetection3d/mmdet3d/datasets/nuscenes_dataset.py:424-489 —
mAP + NDS with per-class AP at center-distance thresholds {0.5, 1, 2, 4}m
and the TP errors ATE/ASE/AOE/AVE/AAE matched at 2m). The devkit is not
in this image; this module implements the same published algorithm:

- AP: class-wise center-distance matching (greedy by confidence, each GT
  used once), precision/recall with 101-point interpolation restricted to
  recall/precision > 0.1 (the devkit's clipped mean).
- TP errors at the 2m threshold averaged over matched pairs above
  min_recall 0.1.
- NDS = (5*mAP + sum_tp(1 - min(1, err/norm))) / 10 with the devkit's
  normalization (errors clipped at 1 after dividing by their bound).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

__all__ = ["DetectionBox", "evaluate_nuscenes", "DIST_THRESHOLDS"]

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")
MIN_RECALL = 0.1
MIN_PRECISION = 0.1


class DetectionBox(dict):
    """sample_token, translation (3,), size wlh (3,), yaw, velocity (2,),
    detection_name, detection_score, attribute_name."""

    def __init__(self, sample_token, translation, size, yaw, velocity,
                 detection_name, detection_score=1.0, attribute_name=""):
        super().__init__(
            sample_token=sample_token,
            translation=np.asarray(translation, np.float64),
            size=np.asarray(size, np.float64),
            yaw=float(yaw),
            velocity=np.asarray(velocity, np.float64),
            detection_name=detection_name,
            detection_score=float(detection_score),
            attribute_name=attribute_name,
        )

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _yaw_diff(a: float, b: float, period: float = 2 * np.pi) -> float:
    d = (a - b) % period
    return min(d, period - d)


def _scale_iou(gt_size, pred_size) -> float:
    """Aligned-box 3D IoU of sizes (devkit scale_iou)."""
    mn = np.minimum(gt_size, pred_size)
    inter = np.prod(mn)
    union = np.prod(gt_size) + np.prod(pred_size) - inter
    return float(inter / union) if union > 0 else 0.0


def _accumulate(gt_boxes: List[DetectionBox], pred_boxes: List[DetectionBox],
                dist_th: float):
    """Devkit-style accumulate for one class + threshold.

    Returns (ap, tp_errors dict or None)."""
    npos = len(gt_boxes)
    if npos == 0:
        return None, None
    preds = sorted(pred_boxes, key=lambda b: -b.detection_score)
    gt_by_sample: Dict[str, List[DetectionBox]] = {}
    for g in gt_boxes:
        gt_by_sample.setdefault(g.sample_token, []).append(g)
    taken = {}

    tp, fp = [], []
    match_data = {k: [] for k in TP_METRICS}
    match_conf = []
    for p in preds:
        gts = gt_by_sample.get(p.sample_token, [])
        best, best_d = None, float("inf")
        for gi, g in enumerate(gts):
            if taken.get((p.sample_token, gi)):
                continue
            d = np.linalg.norm(np.asarray(g.translation[:2]) - np.asarray(p.translation[:2]))
            if d < best_d:
                best, best_d = gi, d
        if best is not None and best_d < dist_th:
            taken[(p.sample_token, best)] = True
            tp.append(1)
            fp.append(0)
            g = gts[best]
            match_data["trans_err"].append(best_d)
            match_data["scale_err"].append(1 - _scale_iou(g.size, p.size))
            period = np.pi if g.detection_name == "barrier" else 2 * np.pi
            match_data["orient_err"].append(_yaw_diff(g.yaw, p.yaw, period))
            match_data["vel_err"].append(
                float(np.linalg.norm(np.asarray(g.velocity) - np.asarray(p.velocity)))
            )
            match_data["attr_err"].append(
                0.0 if g.attribute_name == p.attribute_name or not g.attribute_name
                else 1.0
            )
            match_conf.append(p.detection_score)
        else:
            tp.append(0)
            fp.append(1)

    if not tp:
        return 0.0, None
    tp_c = np.cumsum(tp)
    fp_c = np.cumsum(fp)
    prec = tp_c / (tp_c + fp_c)
    rec = tp_c / npos

    # 101-point interpolation on a fixed recall grid (devkit)
    rec_grid = np.linspace(0, 1, 101)
    prec_interp = np.interp(rec_grid, rec, prec, right=0)
    # clip: zero out precision below MIN_PRECISION and recall below MIN_RECALL
    prec_clipped = prec_interp[rec_grid >= MIN_RECALL]
    prec_clipped = np.clip(prec_clipped - MIN_PRECISION, 0, None)
    ap = float(prec_clipped.sum() / (len(prec_clipped) * (1 - MIN_PRECISION)))

    # TP metrics: cumulative means on the recall grid, averaged above
    # min_recall (devkit: computed at dist_th == 2.0 only)
    tp_errors = None
    if match_conf:
        tp_errors = {}
        for k in TP_METRICS:
            vals = np.asarray(match_data[k])
            cum = np.cumsum(vals) / (np.arange(len(vals)) + 1)
            rec_at_match = (np.arange(len(vals)) + 1) / npos
            err_interp = np.interp(rec_grid, rec_at_match, cum, right=cum[-1] if len(cum) else 0)
            sel = err_interp[rec_grid >= MIN_RECALL]
            tp_errors[k] = float(sel.mean()) if len(sel) else 1.0
    return ap, tp_errors


def evaluate_nuscenes(
    gt_boxes: Sequence[DetectionBox],
    pred_boxes: Sequence[DetectionBox],
    class_names: Sequence[str],
    eval_vel_attr: bool = True,
) -> Dict:
    """Returns dict with 'mAP', 'NDS', per-class APs, and TP errors."""
    aps: Dict[str, Dict[float, float]] = {}
    tp_all: Dict[str, Dict[str, float]] = {}
    for cls in class_names:
        gts = [g for g in gt_boxes if g.detection_name == cls]
        preds = [p for p in pred_boxes if p.detection_name == cls]
        aps[cls] = {}
        for th in DIST_THRESHOLDS:
            ap, tp_err = _accumulate(gts, preds, th)
            if ap is not None:
                aps[cls][th] = ap
            if th == 2.0 and tp_err is not None:
                tp_all[cls] = tp_err

    class_aps = {
        cls: float(np.mean(list(v.values()))) for cls, v in aps.items() if v
    }
    mean_ap = float(np.mean(list(class_aps.values()))) if class_aps else 0.0

    # mean TP errors over classes (devkit skips undefined combos:
    # velocity for barrier/cone, orientation period handled above)
    tp_means = {}
    for k in TP_METRICS:
        vals = []
        for cls, errs in tp_all.items():
            if k == "vel_err" and cls in ("barrier", "traffic_cone"):
                continue
            if k == "orient_err" and cls == "traffic_cone":
                continue
            if k == "attr_err" and cls in ("barrier", "traffic_cone"):
                continue
            vals.append(errs[k])
        tp_means[k] = float(np.mean(vals)) if vals else 1.0

    # NDS (devkit: trans/vel bounded at 1.0 implicitly via min(1, err)? the
    # published formula divides trans by 1m-equivalents: errors are already
    # in comparable units; NDS uses 1 - min(1, err))
    nds_terms = [max(1 - tp_means[k], 0.0) for k in TP_METRICS]
    if not eval_vel_attr:
        nds_terms = nds_terms[:3]
    nds = float((5 * mean_ap + sum(nds_terms)) / (5 + len(nds_terms)))

    return dict(
        mAP=mean_ap,
        NDS=nds,
        class_aps=class_aps,
        aps_per_threshold=aps,
        tp_errors=tp_means,
    )
