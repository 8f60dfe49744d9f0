"""Box structure + nuScenes-eval tests (perfect/offset/missing predictions
give the expected mAP/NDS ordering; corner/rotate/flip math vs numpy)."""

import numpy as np
import pytest

from recondet3d.core.box3d import LiDARBoxes3D, limit_period
from recondet3d.train.eval.nuscenes_eval import DetectionBox, evaluate_nuscenes


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


def _gt(token, xy, name, yaw=0.0):
    return DetectionBox(token, [*xy, 0.0], [2.0, 4.0, 1.5], yaw, [1.0, 0.0], name)


def test_eval_perfect_predictions():
    gts = [_gt("s0", (0, 0), "car"), _gt("s0", (10, 0), "car"),
           _gt("s1", (5, 5), "pedestrian")]
    preds = [DetectionBox(g.sample_token, g.translation, g.size, g.yaw,
                          g.velocity, g.detection_name, 0.9) for g in gts]
    m = evaluate_nuscenes(gts, preds, ["car", "pedestrian"])
    assert m["mAP"] > 0.95
    assert m["NDS"] > 0.95
    assert m["tp_errors"]["trans_err"] < 1e-6


def test_eval_offset_and_missing():
    gts = [_gt("s0", (0, 0), "car"), _gt("s0", (10, 0), "car")]
    # one pred offset by 1.5m (matches at 2m/4m, misses at 0.5/1m), one missing
    preds = [DetectionBox("s0", [1.5, 0, 0], [2, 4, 1.5], 0.0, [1, 0], "car", 0.9)]
    m = evaluate_nuscenes(gts, preds, ["car"])
    perfect = evaluate_nuscenes(gts, [
        DetectionBox(g.sample_token, g.translation, g.size, g.yaw, g.velocity,
                     g.detection_name, 0.9) for g in gts], ["car"])
    assert 0 < m["mAP"] < perfect["mAP"]
    assert m["tp_errors"]["trans_err"] > 1.0


def test_eval_false_positives_hurt():
    gts = [_gt("s0", (0, 0), "car")]
    good = [DetectionBox("s0", [0, 0, 0], [2, 4, 1.5], 0.0, [1, 0], "car", 0.9)]
    noisy = good + [
        DetectionBox("s0", [30 + i, 30, 0], [2, 4, 1.5], 0.0, [1, 0], "car", 0.95)
        for i in range(5)
    ]
    m_good = evaluate_nuscenes(gts, good, ["car"])
    m_noisy = evaluate_nuscenes(gts, noisy, ["car"])
    assert m_noisy["mAP"] < m_good["mAP"]


def test_eval_orientation_error():
    gts = [_gt("s0", (0, 0), "car", yaw=0.0)]
    preds = [DetectionBox("s0", [0, 0, 0], [2, 4, 1.5], np.pi / 2, [1, 0], "car", 0.9)]
    m = evaluate_nuscenes(gts, preds, ["car"])
    assert m["tp_errors"]["orient_err"] == pytest.approx(np.pi / 2, abs=1e-6)
