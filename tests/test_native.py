"""Native C++ runtime: box ops vs the JAX implementations, prefetch loader
round-trip."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from recondet3d.native import (
    PrefetchLoader,
    boxes_iou_bev_cpu,
    circle_nms_cpu,
    native_available,
    nms_bev_cpu,
    points_in_boxes_cpu,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ unavailable")


def test_iou_matches_jax():
    from recondet3d.ops.iou3d import boxes_iou_bev

    rng = np.random.default_rng(0)
    a = np.column_stack([rng.uniform(-2, 2, (20, 2)), rng.uniform(1, 3, (20, 2)),
                         rng.uniform(0, np.pi, 20)])
    b = np.column_stack([rng.uniform(-2, 2, (15, 2)), rng.uniform(1, 3, (15, 2)),
                         rng.uniform(0, np.pi, 15)])
    got = boxes_iou_bev_cpu(a, b)
    ref = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_nms_matches_jax():
    from recondet3d.ops.iou3d import nms_bev

    rng = np.random.default_rng(1)
    boxes = np.column_stack([rng.uniform(-5, 5, (50, 2)), rng.uniform(1, 3, (50, 2)),
                             rng.uniform(0, np.pi, 50)])
    scores = rng.uniform(size=50)
    got = nms_bev_cpu(boxes, scores, 0.3)
    ref = np.asarray(nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.3))
    np.testing.assert_array_equal(got, ref)


def test_circle_nms_and_pib():
    xy = np.array([[0.0, 0], [0.5, 0], [10, 0]])
    scores = np.array([0.5, 0.9, 0.2])
    np.testing.assert_array_equal(circle_nms_cpu(xy, scores, 1.0), [False, True, True])

    boxes = np.array([[0.0, 0, 0, 2, 4, 2, np.pi / 2]])
    pts = np.array([[1.5, 0, 1.0], [0, 0.5, 1.0], [0, 0, -0.5]])
    np.testing.assert_array_equal(points_in_boxes_cpu(pts, boxes), [0, 0, -1])


def test_prefetch_loader(tmp_path):
    paths = []
    for i in range(8):
        p = tmp_path / f"f{i}.bin"
        data = np.arange(i * 100, i * 100 + 64, dtype=np.float32)
        data.tofile(str(p))
        paths.append((str(p), data))
    loader = PrefetchLoader(4)
    tids = [loader.submit(p, 64 * 4)[0] for p, _ in paths]
    for tid, (_, expect) in zip(tids, paths):
        raw = loader.pop(tid)
        got = np.frombuffer(raw.tobytes(), np.float32)
        np.testing.assert_array_equal(got, expect)
    loader.close()
