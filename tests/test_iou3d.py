"""Rotated IoU/NMS golden tests vs shapely-free numpy references
(Monte-Carlo area checks + hand-computed cases)."""

import numpy as np
import pytest

import jax.numpy as jnp

from recondet3d.ops.iou3d import (
    aligned_3d_nms,
    boxes_iou_3d,
    boxes_iou_bev,
    boxes_overlap_bev,
    circle_nms,
    nms_bev,
    nms_normal_bev,
)
from recondet3d.ops.points_in_boxes import points_in_boxes, points_in_boxes_batch


def mc_overlap(b1, b2, n=200000, seed=0):
    """Monte-Carlo rotated-rectangle intersection area."""
    rng = np.random.default_rng(seed)
    lo = np.minimum(b1[:2] - np.max(b1[2:4]), b2[:2] - np.max(b2[2:4]))
    hi = np.maximum(b1[:2] + np.max(b1[2:4]), b2[:2] + np.max(b2[2:4]))
    pts = rng.uniform(lo, hi, (n, 2))

    def inside(b):
        c, s = np.cos(b[4]), np.sin(b[4])
        rx = (pts[:, 0] - b[0]) * c + (pts[:, 1] - b[1]) * s
        ry = -(pts[:, 0] - b[0]) * s + (pts[:, 1] - b[1]) * c
        return (np.abs(rx) <= b[2] / 2) & (np.abs(ry) <= b[3] / 2)

    both = inside(b1) & inside(b2)
    return both.mean() * np.prod(hi - lo)


def test_overlap_axis_aligned_exact():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[1.0, 1.0, 2.0, 2.0, 0.0]])
    np.testing.assert_allclose(np.asarray(boxes_overlap_bev(a, b))[0, 0], 1.0, atol=1e-5)
    # identical boxes
    np.testing.assert_allclose(np.asarray(boxes_iou_bev(a, a))[0, 0], 1.0, atol=1e-5)
    # disjoint
    c = jnp.array([[10.0, 0.0, 2.0, 2.0, 0.0]])
    assert float(boxes_overlap_bev(a, c)[0, 0]) == 0.0


def test_rotated_45_exact():
    # square rotated 45 deg inside an identical axis-aligned square:
    # intersection is a regular octagon with area 2*(sqrt(2)-1)*s^2 for s=1...
    # compare against Monte-Carlo instead of closed form
    a = np.array([0.0, 0.0, 2.0, 2.0, 0.0])
    b = np.array([0.0, 0.0, 2.0, 2.0, np.pi / 4])
    got = float(boxes_overlap_bev(jnp.asarray([a]), jnp.asarray([b]))[0, 0])
    exp = mc_overlap(a, b)
    np.testing.assert_allclose(got, exp, rtol=0.02)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_overlap_random_vs_montecarlo(seed):
    rng = np.random.default_rng(seed)
    a = np.array([*rng.uniform(-1, 1, 2), *rng.uniform(1, 3, 2), rng.uniform(0, np.pi)])
    b = np.array([*rng.uniform(-1, 1, 2), *rng.uniform(1, 3, 2), rng.uniform(0, np.pi)])
    got = float(boxes_overlap_bev(jnp.asarray([a]), jnp.asarray([b]))[0, 0])
    exp = mc_overlap(a, b, seed=seed)
    np.testing.assert_allclose(got, exp, rtol=0.03, atol=0.02)


def test_iou_3d():
    a = jnp.array([[0.0, 0, 0, 2, 2, 2, 0]])
    b = jnp.array([[0.0, 0, 1, 2, 2, 2, 0]])  # shifted up by half height
    np.testing.assert_allclose(float(boxes_iou_3d(a, b)[0, 0]), 1 / 3, atol=1e-5)


def test_nms_bev():
    boxes = jnp.array(
        [
            [0.0, 0.0, 2.0, 2.0, 0.0],
            [0.1, 0.0, 2.0, 2.0, 0.0],  # heavy overlap with 0
            [5.0, 5.0, 2.0, 2.0, 0.3],
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(nms_bev(boxes, scores, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])
    keep2 = np.asarray(nms_normal_bev(boxes, scores, 0.5))
    np.testing.assert_array_equal(keep2, [True, False, True])


def test_circle_nms():
    xy = jnp.array([[0.0, 0.0], [0.5, 0.0], [10.0, 0.0]])
    scores = jnp.array([0.5, 0.9, 0.2])
    keep = np.asarray(circle_nms(xy, scores, thresh=1.0))
    np.testing.assert_array_equal(keep, [False, True, True])


def test_aligned_3d_nms_class_aware():
    boxes = jnp.array([[0, 0, 0, 2, 2, 2], [0.1, 0, 0, 2.1, 2, 2], [0, 0, 0, 2, 2, 2]], jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.85])
    classes = jnp.array([0, 0, 1])
    keep = np.asarray(aligned_3d_nms(boxes, scores, classes, 0.3))
    np.testing.assert_array_equal(keep, [True, False, True])  # class 1 survives


def test_points_in_boxes():
    boxes = jnp.array([[0.0, 0, 0, 2, 4, 2, np.pi / 2]])  # rotated 90deg
    pts = jnp.array([[1.5, 0.0, 1.0], [0.0, 0.5, 1.0], [0.0, 0.0, -0.5], [0, 0, 1.99]])
    m = np.asarray(points_in_boxes_batch(pts, boxes))[:, 0]
    # after 90deg rotation dx(=2) is along y, dy(=4) along x
    np.testing.assert_array_equal(m, [True, True, False, True])
    idx = np.asarray(points_in_boxes(pts, boxes))
    np.testing.assert_array_equal(idx, [0, 0, -1, 0])
