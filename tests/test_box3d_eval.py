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


# ---------------------------------------------------------------------------
# Property test: randomized scenes vs an INDEPENDENT brute-force
# transcription of the devkit algorithm (nuscenes/eval/detection/algo.py).
# The golden vectors above pin the edge cases; this catches drift the
# hand-picked cases miss. The brute force below shares no code with
# recondet3d.train.eval.nuscenes_eval: plain-python greedy matching,
# hand-rolled right=0 linear interpolation, literal formula transcription.

# the devkit's recall grid is np.linspace(0, 1, 101) — its float values
# differ from i/100 in the last ulp (e.g. linspace[70] = 0.7000000000000001
# > 0.7), which right-fill-zeroes grid points an exact i/100 grid would
# interpolate; the brute force must use the same spec constants
_BF_GRID = [float(v) for v in np.linspace(0, 1, 101)]
_BF_TPM = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")


def _bf_interp(x, xs, ys, right):
    """np.interp semantics (ascending xs), hand-rolled: left-fill ys[0],
    right fill `right`, duplicate x -> last value."""
    if not xs:
        return right
    if x < xs[0]:
        return ys[0]
    if x > xs[-1]:
        return right
    # find the last interval containing x (duplicate xs -> later wins)
    for j in range(len(xs) - 1, -1, -1):
        if xs[j] <= x:
            if xs[j] == x:
                # np.interp returns the value at the LAST duplicate x
                while j + 1 < len(xs) and xs[j + 1] == x:
                    j += 1
                return ys[j]
            t = (x - xs[j]) / (xs[j + 1] - xs[j])
            return ys[j] + t * (ys[j + 1] - ys[j])
    return ys[0]


def _bf_cummean(vals):
    if all(v != v for v in vals):  # all NaN
        return [1.0] * len(vals)
    out, s, c = [], 0.0, 0
    for v in vals:
        if v == v:
            s += v
            c += 1
        out.append(s / c if c else 0.0)
    return out


def _bf_accumulate(gts, preds, dist_th):
    npos = len(gts)
    no_pred = ([0.0] * 101, [0.0] * 101, {k: [1.0] * 101 for k in _BF_TPM})
    if npos == 0:
        return no_pred
    order = sorted(range(len(preds)),
                   key=lambda i: (-preds[i].detection_score, i))
    taken = set()
    tp, conf = [], []
    merr = {k: [] for k in _BF_TPM}
    mconf = []
    for i in order:
        p = preds[i]
        best, best_d = None, float("inf")
        for gi, g in enumerate(gts):
            if g.sample_token != p.sample_token or gi in taken:
                continue
            dx = g.translation[0] - p.translation[0]
            dy = g.translation[1] - p.translation[1]
            d = (dx * dx + dy * dy) ** 0.5
            if d < best_d:
                best, best_d = gi, d
        if best is not None and best_d < dist_th:
            taken.add(best)
            g = gts[best]
            tp.append(1)
            conf.append(p.detection_score)
            merr["trans_err"].append(best_d)
            inter = 1.0
            union = 1.0
            mn = [min(a, b) for a, b in zip(g.size, p.size)]
            inter = mn[0] * mn[1] * mn[2]
            union = (g.size[0] * g.size[1] * g.size[2]
                     + p.size[0] * p.size[1] * p.size[2] - inter)
            merr["scale_err"].append(1.0 - (inter / union if union > 0 else 0.0))
            period = np.pi if g.detection_name == "barrier" else 2 * np.pi
            dyaw = (g.yaw - p.yaw) % period
            merr["orient_err"].append(min(dyaw, period - dyaw))
            dvx = g.velocity[0] - p.velocity[0]
            dvy = g.velocity[1] - p.velocity[1]
            merr["vel_err"].append((dvx * dvx + dvy * dvy) ** 0.5)
            merr["attr_err"].append(
                float("nan") if not g.attribute_name
                else 1.0 - float(g.attribute_name == p.attribute_name))
            mconf.append(p.detection_score)
        else:
            tp.append(0)
            conf.append(p.detection_score)
    if not mconf:
        return no_pred
    prec, rec = [], []
    t = f = 0
    for i, hit in enumerate(tp):
        t += hit
        f += 1 - hit
        prec.append(t / (t + f))
        rec.append(t / npos)
    prec_i = [_bf_interp(r, rec, prec, right=0.0) for r in _BF_GRID]
    conf_i = [_bf_interp(r, rec, conf, right=0.0) for r in _BF_GRID]
    errors = {}
    rev_mc = mconf[::-1]
    for k in _BF_TPM:
        cm = _bf_cummean(merr[k])[::-1]
        # interp as a function of confidence; outside-range fill = edge vals
        vals = [_bf_interp(c, rev_mc, cm, right=cm[-1]) for c in conf_i[::-1]]
        errors[k] = vals[::-1]
    return prec_i, conf_i, errors


def _bf_calc_ap(prec_i):
    total = 0.0
    for i in range(11, 101):
        total += max(prec_i[i] - 0.1, 0.0)
    return total / 90.0 / 0.9


def _bf_calc_tp(conf_i, errors, k):
    last = 0
    for i in range(101):
        if conf_i[i] != 0.0:
            last = i
    if last < 11:
        return 1.0
    window = errors[k][11:last + 1]
    return sum(window) / len(window)


def _bf_evaluate(gts, preds, class_names):
    aps, tpe = {}, {}
    for cls in class_names:
        g = [b for b in gts if b.detection_name == cls]
        p = [b for b in preds if b.detection_name == cls]
        vals = []
        for th in (0.5, 1.0, 2.0, 4.0):
            prec_i, conf_i, errors = _bf_accumulate(g, p, th)
            vals.append(_bf_calc_ap(prec_i))
            if th == 2.0:
                errs = {}
                for k in _BF_TPM:
                    if cls == "traffic_cone" and k in (
                            "attr_err", "vel_err", "orient_err"):
                        errs[k] = float("nan")
                    elif cls == "barrier" and k in ("attr_err", "vel_err"):
                        errs[k] = float("nan")
                    else:
                        errs[k] = _bf_calc_tp(conf_i, errors, k)
                tpe[cls] = errs
        aps[cls] = sum(vals) / len(vals)
    mean_ap = sum(aps.values()) / len(aps) if aps else 0.0
    tp_means = {}
    for k in _BF_TPM:
        fin = [tpe[c][k] for c in tpe if tpe[c][k] == tpe[c][k]]
        tp_means[k] = sum(fin) / len(fin) if fin else 1.0
    nds = (5 * mean_ap + sum(max(1.0 - tp_means[k], 0.0) for k in _BF_TPM)) / 10.0
    return dict(mAP=mean_ap, NDS=nds, class_aps=aps, tp_errors=tp_means)


def _random_scene(rng, classes):
    """Randomized multi-sample scene: GTs + noisy matched preds + false
    positives + dropped detections; occasional empty attributes, zero-GT
    classes, and unpredicted samples."""
    gts, preds = [], []
    n_samples = int(rng.integers(1, 4))
    for s in range(n_samples):
        tok = f"s{s}"
        for cls in classes:
            n_gt = int(rng.integers(0, 5))
            for _ in range(n_gt):
                xy = rng.uniform(-20, 20, 2)
                size = rng.uniform(0.5, 4.0, 3)
                yaw = float(rng.uniform(-np.pi, np.pi))
                vel = rng.uniform(-3, 3, 2)
                attr = "" if rng.random() < 0.25 else f"a{int(rng.integers(0, 2))}"
                gts.append(DetectionBox(tok, [*xy, 0.0], size, yaw, vel, cls,
                                        attribute_name=attr))
                if rng.random() < 0.8:  # matched-ish prediction
                    nxy = xy + rng.normal(0, rng.choice([0.2, 1.0, 3.0]), 2)
                    nsize = np.maximum(size + rng.normal(0, 0.3, 3), 0.1)
                    nyaw = yaw + float(rng.normal(0, 0.5))
                    nvel = vel + rng.normal(0, 0.5, 2)
                    nattr = attr if rng.random() < 0.7 else "a9"
                    preds.append(DetectionBox(
                        tok, [*nxy, 0.0], nsize, nyaw, nvel, cls,
                        detection_score=float(rng.uniform(0.05, 1.0)),
                        attribute_name=nattr))
            for _ in range(int(rng.integers(0, 3))):  # false positives
                preds.append(DetectionBox(
                    tok, [*rng.uniform(-25, 25, 2), 0.0],
                    rng.uniform(0.5, 4.0, 3), float(rng.uniform(-np.pi, np.pi)),
                    rng.uniform(-3, 3, 2), cls,
                    detection_score=float(rng.uniform(0.05, 1.0)),
                    attribute_name=f"a{int(rng.integers(0, 2))}"))
    return gts, preds


def test_eval_property_vs_bruteforce():
    classes = ["car", "pedestrian", "barrier", "traffic_cone"]
    rng = np.random.default_rng(20260820)
    for scene in range(100):
        gts, preds = _random_scene(rng, classes)
        got = evaluate_nuscenes(gts, preds, classes)
        want = _bf_evaluate(gts, preds, classes)
        assert got["mAP"] == pytest.approx(want["mAP"], abs=1e-12), scene
        assert got["NDS"] == pytest.approx(want["NDS"], abs=1e-12), scene
        for cls in classes:
            assert got["class_aps"][cls] == pytest.approx(
                want["class_aps"][cls], abs=1e-12), (scene, cls)
        for k in _BF_TPM:
            assert got["tp_errors"][k] == pytest.approx(
                want["tp_errors"][k], abs=1e-12), (scene, k)
