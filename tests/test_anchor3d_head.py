"""Anchor3DHead: anchor grid, delta coder roundtrip, assignment, loss,
and a decode-recovers-GT end-to-end check."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recondet3d.models.detect.anchor3d_head import (
    Anchor3DHead,
    delta_decode,
    delta_encode,
    generate_anchors_3d,
    get_direction_target,
)
from recondet3d.ops.iou3d import nearest_bev_iou


def test_generate_anchors_layout():
    a = generate_anchors_3d(
        (4, 6), ranges=[(-10, -10, -1.78, 10, 10, -1.78)],
        sizes=[(3.9, 1.6, 1.56)], rotations=(0.0, np.pi / 2),
    )
    assert a.shape == (4 * 6 * 2, 7)
    # y-major, then x, then rotation; inclusive linspace ends
    np.testing.assert_allclose(a[0, :3], [-10, -10, -1.78])
    np.testing.assert_allclose(a[1, 6], np.pi / 2)
    np.testing.assert_allclose(a[2, 0], -10 + 20 / 5)  # next x
    np.testing.assert_allclose(a[-1, :2], [10, 10])
    np.testing.assert_allclose(a[:, 3:6], np.tile([3.9, 1.6, 1.56], (48, 1)))


def test_delta_coder_roundtrip():
    rng = np.random.default_rng(0)
    anchors = np.concatenate(
        [rng.uniform(-5, 5, (32, 3)), rng.uniform(1, 3, (32, 3)),
         rng.uniform(-np.pi, np.pi, (32, 1))], -1,
    ).astype(np.float32)
    gt = np.concatenate(
        [rng.uniform(-5, 5, (32, 3)), rng.uniform(1, 3, (32, 3)),
         rng.uniform(-np.pi, np.pi, (32, 1))], -1,
    ).astype(np.float32)
    deltas = delta_encode(jnp.asarray(anchors), jnp.asarray(gt))
    back = delta_decode(jnp.asarray(anchors), deltas)
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-4)

    # 9-dim (velocity) variant
    a9 = np.concatenate([anchors, np.zeros((32, 2), np.float32)], -1)
    g9 = np.concatenate([gt, rng.normal(size=(32, 2)).astype(np.float32)], -1)
    back9 = delta_decode(jnp.asarray(a9), delta_encode(jnp.asarray(a9), jnp.asarray(g9)))
    np.testing.assert_allclose(np.asarray(back9), g9, rtol=1e-4, atol=1e-4)


def test_nearest_bev_iou_snapping():
    a = jnp.asarray([[0, 0, 0, 4.0, 2.0, 1.0, 0.0]])
    b_same = jnp.asarray([[0, 0, 0, 4.0, 2.0, 1.0, 0.0]])
    b_rot = jnp.asarray([[0, 0, 0, 2.0, 4.0, 1.0, np.pi / 2]])  # snaps to same
    assert float(nearest_bev_iou(a, b_same)[0, 0]) == pytest.approx(1.0)
    assert float(nearest_bev_iou(a, b_rot)[0, 0]) == pytest.approx(1.0)


def test_direction_target():
    anchors = jnp.zeros((4, 7))
    tgt = jnp.zeros((4, 7)).at[:, 6].set(jnp.asarray([0.1, np.pi - 0.1, -0.1, np.pi + 0.1]))
    bins = np.asarray(get_direction_target(anchors, tgt))
    np.testing.assert_array_equal(bins, [0, 0, 1, 1])


def _make_head():
    return Anchor3DHead(
        num_classes=1, in_channels=16, feat_channels=16,
        anchor_ranges=[(-10, -10, -1.0, 10, 10, -1.0)],
        anchor_sizes=[(3.9, 1.6, 1.56)],
        pos_iou_thr=(0.55,), neg_iou_thr=(0.4,),
    )


def test_assignment_and_loss():
    head = _make_head()
    anchors = head.anchors_for((10, 10))
    # one gt exactly on an anchor
    gt = jnp.asarray([[[anchors[24, 0], anchors[24, 1], -1.0, 3.9, 1.6, 1.56, 0.0],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gt_labels = jnp.asarray([[0, -1]], jnp.int32)
    gt_mask = jnp.asarray([[True, False]])
    targets = head.get_targets(anchors, gt, gt_labels, gt_mask)
    labels = np.asarray(targets["labels"])[0]
    assert (labels == 0).sum() >= 1  # at least the exact-match anchor
    pos = np.asarray(targets["bbox_weights"])[0] > 0
    np.testing.assert_allclose(
        np.asarray(targets["bbox_targets"])[0][pos][:, :6], 0.0, atol=1e-5
    )

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 10, 10, 16)),
                    jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), x)
    preds = head.apply(variables, x)
    losses = head.loss(preds, targets)
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_dir"}


def test_get_bboxes_recovers_gt():
    """Construct predictions that encode a GT box exactly -> decode+NMS
    returns it."""
    head = _make_head()
    H = W = 10
    anchors = np.asarray(head.anchors_for((H, W)))
    A = len(anchors)
    gt_box = np.array([1.5, -2.0, -1.2, 4.1, 1.7, 1.5, 0.2], np.float32)
    # nearest anchor with rotation 0 (even indices)
    d = np.linalg.norm(anchors[::2, :2] - gt_box[:2], axis=1)
    ai = int(np.argmin(d)) * 2
    deltas = np.zeros((A, 7), np.float32)
    deltas[ai] = np.asarray(
        delta_encode(jnp.asarray(anchors[ai]), jnp.asarray(gt_box))
    )
    cls = np.full((1, H, W, 2), -10.0, np.float32)
    cls.reshape(1, A, 1)[0, ai, 0] = 10.0
    dirp = np.zeros((1, H, W, 4), np.float32)
    dirp.reshape(1, A, 2)[0, ai] = [5.0, -5.0]  # bin 0 -> yaw stays in [0, pi)
    preds = {
        "cls_score": jnp.asarray(cls),
        "bbox_pred": jnp.asarray(deltas.reshape(1, H, W, 14)),
        "dir_pred": jnp.asarray(dirp),
    }
    (boxes, scores, labels), = head.get_bboxes(preds, score_thr=0.3)
    assert len(boxes) == 1 and labels[0] == 0 and scores[0] > 0.99
    np.testing.assert_allclose(boxes[0], gt_box, rtol=1e-4, atol=1e-4)
