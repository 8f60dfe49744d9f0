"""Box structure tests + GOLDEN-VECTOR nuScenes eval tests.

Every metric assertion below is a hand-computed exact value of the
devkit's published algorithm (nuscenes/eval/detection/algo.py accumulate/
calc_ap/calc_tp; reference consumes it via
mmdetection3d/mmdet3d/datasets/nuscenes_dataset.py:443-489), including
the clipped 101-point interpolation edge cases, the confidence-based TP
error interpolation, the max_recall_ind cutoff, attribute/velocity NaN
handling, and the zero-GT-class contribution to mAP. Derivations are in
the comments so drift is diagnosable."""

import numpy as np
import pytest

from recondet3d.core.box3d import LiDARBoxes3D, limit_period
from recondet3d.train.eval.nuscenes_eval import (
    DetectionBox,
    accumulate,
    calc_ap,
    calc_tp,
    evaluate_nuscenes,
)


def test_corners_axis_aligned():
    b = LiDARBoxes3D([[1.0, 2.0, 0.0, 2.0, 4.0, 2.0, 0.0]])
    c = b.corners[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c[:, 0].min(), 0.0)
    np.testing.assert_allclose(c[:, 0].max(), 2.0)
    np.testing.assert_allclose(c[:, 1].min(), 0.0)
    np.testing.assert_allclose(c[:, 1].max(), 4.0)
    np.testing.assert_allclose(c[:, 2].min(), 0.0)  # bottom-center z
    np.testing.assert_allclose(c[:, 2].max(), 2.0)
    np.testing.assert_allclose(b.gravity_center[0], [1, 2, 1])


def test_rotate_flip_roundtrip():
    b = LiDARBoxes3D([[1.0, 0.0, 0.0, 2.0, 4.0, 2.0, 0.3, 1.0, 0.0]])
    b.rotate(np.pi / 2)
    np.testing.assert_allclose(b.center[0, :2], [0, 1], atol=1e-9)
    np.testing.assert_allclose(b.velocity[0], [0, 1], atol=1e-9)
    b.flip("horizontal")
    np.testing.assert_allclose(b.center[0, :2], [0, -1], atol=1e-9)
    # range is [-pi, pi): 3*pi wraps to the -pi boundary
    assert limit_period(np.array([3 * np.pi]))[0] == pytest.approx(-np.pi, abs=1e-9)
    assert limit_period(np.array([2.5 * np.pi]))[0] == pytest.approx(0.5 * np.pi, abs=1e-9)


def _box(token, xy, name, score=None, yaw=0.0, size=(2.0, 4.0, 1.5),
         vel=(1.0, 0.0), attr="x.attr"):
    return DetectionBox(token, [*xy, 0.0], size, yaw, vel, name,
                        detection_score=0.5 if score is None else score,
                        attribute_name=attr)


# ---------------------------------------------------------------------------
# Golden case 1: one GT, one perfect prediction (matching attribute).
# rec=[1.0] -> interpolated precision 1.0 on the whole grid;
# calc_ap = mean(1.0 - 0.1 over indices 11..100) / 0.9 = 1.0 exactly.
# All TP errors 0 -> NDS = (5*1 + 5*1)/10 = 1.0.
def test_golden_perfect_single():
    gts = [_box("s0", (0, 0), "car")]
    preds = [_box("s0", (0, 0), "car", score=0.9)]
    m = evaluate_nuscenes(gts, preds, ["car"])
    assert m["mAP"] == pytest.approx(1.0, abs=1e-12)
    assert m["NDS"] == pytest.approx(1.0, abs=1e-12)
    for k, v in m["tp_errors"].items():
        assert v == pytest.approx(0.0, abs=1e-12), k


# Golden case 2: the min-recall bin is EXCLUDED ("+1" in calc_ap).
# npos=10, one perfect pred -> max recall exactly 0.10: precision grid is
# 1.0 up to index 10 and 0 above; indices 11..100 are all zero -> AP = 0.
# confidence grid is likewise 0 above index 10 -> max_recall_ind = 10 < 11
# -> every TP error is 1.0 -> NDS = 0.
def test_golden_recall_at_min_bin_excluded():
    gts = [_box("s0", (10 * i, 0), "car") for i in range(10)]
    preds = [_box("s0", (0, 0), "car", score=0.9)]
    m = evaluate_nuscenes(gts, preds, ["car"])
    assert m["mAP"] == pytest.approx(0.0, abs=1e-12)
    for k, v in m["tp_errors"].items():
        assert v == pytest.approx(1.0, abs=1e-12), k
    assert m["NDS"] == pytest.approx(0.0, abs=1e-12)


# Golden case 3: recall 0.12 -> exactly two grid points (0.11, 0.12) carry
# precision 1.0. AP = (2 * (1-0.1)) / (90 * 0.9) = 2/90. Confidence at
# index 12 is 0.7 > 0 -> max_recall_ind = 12, errors all 0.
# NDS = (5 * 2/90 + 5) / 10.
def test_golden_two_live_grid_points():
    gts = [_box("s0", (8 * i, 0), "car") for i in range(25)]
    preds = [
        _box("s0", (0, 0), "car", score=0.9),
        _box("s0", (8, 0), "car", score=0.8),
        _box("s0", (16, 0), "car", score=0.7),
    ]
    m = evaluate_nuscenes(gts, preds, ["car"])
    assert m["mAP"] == pytest.approx(2 / 90, rel=1e-9)
    assert m["tp_errors"]["trans_err"] == pytest.approx(0.0, abs=1e-12)
    assert m["NDS"] == pytest.approx((5 * 2 / 90 + 5) / 10, rel=1e-9)


# Golden case 4: confidence-based TP-error interpolation (the devkit
# interpolates cummean(err) as a function of confidence, NOT recall).
# Two matches: err .2 @ conf .9 (rec .5), err .4 @ conf .5 (rec 1.0).
# cummean = [.2, .3]. conf(g) = .9 for g<=.5, else .9 - .8(g-.5).
# err(g) = .2 for g<=.5, else .2 + .2(g-.5).
# ATE = [40*0.2 + sum_{g=.51..1.00}(.2+.2(g-.5))] / 90
#     = [8 + (10 + .2*12.75)] / 90 = 20.55/90.
def test_golden_conf_interpolated_trans_err():
    gts = [_box("s0", (0, 0), "car"), _box("s0", (10, 0), "car")]
    preds = [
        _box("s0", (0.2, 0), "car", score=0.9),
        _box("s0", (10.4, 0), "car", score=0.5),
    ]
    m = evaluate_nuscenes(gts, preds, ["car"])
    assert m["mAP"] == pytest.approx(1.0, abs=1e-12)
    assert m["tp_errors"]["trans_err"] == pytest.approx(20.55 / 90, rel=1e-9)


# Golden case 5: a higher-confidence false positive ahead of the true
# positive. prec=[0, .5] at rec=[0, 1] -> interpolated precision .5*g;
# positive only where .5*g > .1 (g >= .21):
# AP = sum_{g=.21..1.00}(.5g - .1) / (90*.9) = (24.2-8)/81 = 16.2/81 = .2.
def test_golden_fp_before_tp():
    gts = [_box("s0", (0, 0), "car")]
    preds = [
        _box("s0", (30, 30), "car", score=0.9),  # FP
        _box("s0", (0, 0), "car", score=0.8),    # TP
    ]
    m = evaluate_nuscenes(gts, preds, ["car"])
    assert m["mAP"] == pytest.approx(0.2, rel=1e-9)


# Golden case 6: barrier uses orientation period pi, and its vel/attr are
# excluded (NaN -> nanmean). Perfect position, yaw off by pi - 0.1 ->
# AOE = 0.1 (not pi - 0.1). NDS = (5*1 + 1 + 1 + 0.9 + 0 + 0)/10 = 0.79
# (vel/attr scores collapse to 0 when every class excludes them).
def test_golden_barrier_period_and_exclusions():
    gts = [_box("s0", (0, 0), "barrier", yaw=0.0)]
    preds = [_box("s0", (0, 0), "barrier", score=0.9, yaw=np.pi - 0.1)]
    m = evaluate_nuscenes(gts, preds, ["barrier"])
    assert m["tp_errors"]["orient_err"] == pytest.approx(0.1, rel=1e-9)
    assert m["tp_errors"]["vel_err"] == pytest.approx(1.0, abs=1e-12)
    assert m["tp_errors"]["attr_err"] == pytest.approx(1.0, abs=1e-12)
    assert m["NDS"] == pytest.approx(0.79, rel=1e-9)


# Golden case 7: scale error. GT (2,4,2) vs pred (2,4,1):
# inter = 8, union = 16+8-8 = 16 -> iou .5 -> ASE = .5.
# NDS = (5*1 + (1 + .5 + 1 + 1 + 1))/10 = 0.95.
def test_golden_scale_error():
    gts = [_box("s0", (0, 0), "car", size=(2, 4, 2))]
    preds = [_box("s0", (0, 0), "car", score=0.9, size=(2, 4, 1))]
    m = evaluate_nuscenes(gts, preds, ["car"])
    assert m["tp_errors"]["scale_err"] == pytest.approx(0.5, rel=1e-12)
    assert m["NDS"] == pytest.approx(0.95, rel=1e-9)


# Golden case 8: every configured class counts toward mAP — a class with
# zero GT and zero predictions contributes AP 0 (devkit no_predictions).
def test_golden_zero_gt_class_counts():
    gts = [_box("s0", (0, 0), "car")]
    preds = [_box("s0", (0, 0), "car", score=0.9)]
    m = evaluate_nuscenes(gts, preds, ["car", "truck"])
    assert m["class_aps"]["car"] == pytest.approx(1.0, abs=1e-12)
    assert m["class_aps"]["truck"] == 0.0
    assert m["mAP"] == pytest.approx(0.5, abs=1e-12)


# Golden case 9: matching is per-sample — a prediction in another sample
# cannot match, so there are no matches at all -> no_predictions ->
# AP 0 and TP errors 1.
def test_golden_cross_sample_no_match():
    gts = [_box("s0", (0, 0), "car")]
    preds = [_box("s1", (0, 0), "car", score=0.9)]
    m = evaluate_nuscenes(gts, preds, ["car"])
    assert m["mAP"] == 0.0
    assert m["tp_errors"]["trans_err"] == 1.0


# Golden case 10: empty GT attribute -> attr_err NaN (devkit attr_acc);
# an all-NaN series cummeans to ones -> AAE = 1.0 even for an otherwise
# perfect prediction; NDS = (5 + 4)/10 = 0.9.
def test_golden_empty_attribute_is_nan():
    gts = [_box("s0", (0, 0), "car", attr="")]
    preds = [_box("s0", (0, 0), "car", score=0.9, attr="")]
    m = evaluate_nuscenes(gts, preds, ["car"])
    assert m["tp_errors"]["attr_err"] == pytest.approx(1.0, abs=1e-12)
    assert m["NDS"] == pytest.approx(0.9, rel=1e-12)


# Golden case 11 (accumulate-level): greedy matching consumes the closest
# GT first; a duplicate lower-confidence prediction on the same GT is a FP
# even though it is within threshold.
def test_golden_duplicate_pred_is_fp():
    gts = [_box("s0", (0, 0), "car")]
    md = accumulate(
        [g for g in gts],
        [_box("s0", (0, 0), "car", score=0.9),
         _box("s0", (0.1, 0), "car", score=0.8)],
        dist_th=2.0,
    )
    # tp=[1,0] -> prec=[1, .5] at rec=[1, 1]; grid: left-fill 1.0 below
    # rec 1.0; at the duplicate x=1.0 np.interp returns the LAST value (.5)
    # -> indices 11..99 carry 1.0, index 100 carries 0.5:
    # AP = (89*0.9 + 0.4) / (90*0.9) = 80.5/81
    assert calc_ap(md) == pytest.approx(80.5 / 81, rel=1e-12)
    assert calc_tp(md, "trans_err") == pytest.approx(0.0, abs=1e-12)


# Ordering properties kept from the pre-golden suite ----------------------
def test_eval_false_positives_hurt():
    gts = [_box("s0", (0, 0), "car")]
    good = [_box("s0", (0, 0), "car", score=0.9)]
    noisy = good + [
        _box("s0", (30 + i, 30), "car", score=0.95) for i in range(5)
    ]
    m_good = evaluate_nuscenes(gts, good, ["car"])
    m_noisy = evaluate_nuscenes(gts, noisy, ["car"])
    assert m_noisy["mAP"] < m_good["mAP"]


def test_eval_offset_and_missing():
    gts = [_box("s0", (0, 0), "car"), _box("s0", (10, 0), "car")]
    # one pred offset by 1.5m: matches at thresholds 2/4, misses at .5/1;
    # recall .5 -> AP = 40/(90*.9)*.9 = 4/9 at matched thresholds
    preds = [_box("s0", (1.5, 0), "car", score=0.9)]
    m = evaluate_nuscenes(gts, preds, ["car"])
    assert m["class_aps"]["car"] == pytest.approx((0 + 0 + 4 / 9 + 4 / 9) / 4,
                                                  rel=1e-9)
    assert m["tp_errors"]["trans_err"] == pytest.approx(1.5, rel=1e-9)
