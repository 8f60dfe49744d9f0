"""Rotated BEV IoU + NMS, and 3D IoU.

TPU-native equivalent of the reference CUDA extension (reference:
mmdetection3d/mmdet3d/ops/iou3d/ — iou3d_kernel.cu computes the exact
rotated-rectangle overlap by collecting edge intersections + contained
corners, angle-sorting them and applying the shoelace formula;
iou3d_utils.py:6-60 exposes boxes_iou_bev / nms_gpu / nms_normal_gpu).
The same exact-polygon algorithm is expressed here as fully vectorized
masked tensor ops (24 candidate vertices per box pair), so the whole
(N, M) IoU matrix is one fused XLA program; NMS is a sequential mask
update in a fori_loop over the sorted boxes.

Also provides circle_nms (reference: mmdet3d/core/post_processing/
box3d_nms.py:181 numba) and aligned_3d_nms (:130).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "boxes_iou_bev",
    "boxes_overlap_bev",
    "nms_bev",
    "nms_normal_bev",
    "boxes_iou_3d",
    "nearest_bev_iou",
    "circle_nms",
    "aligned_3d_nms",
]


def _corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) [cx, cy, dx, dy, yaw] -> (N, 4, 2) corners (ccw)."""
    cx, cy, dx, dy, yaw = [boxes[:, i] for i in range(5)]
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    ox = jnp.stack([dx, dx, -dx, -dx], axis=1) / 2
    oy = jnp.stack([-dy, dy, dy, -dy], axis=1) / 2
    x = cx[:, None] + ox * cos[:, None] - oy * sin[:, None]
    y = cy[:, None] + ox * sin[:, None] + oy * cos[:, None]
    return jnp.stack([x, y], axis=-1)


def _point_in_rect(pts, boxes, eps=1e-6):
    """pts (..., 2) vs boxes (..., 5): inside test in the box local frame."""
    cx, cy, dx, dy, yaw = [boxes[..., i] for i in range(5)]
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    rx = (pts[..., 0] - cx) * cos + (pts[..., 1] - cy) * sin
    ry = -(pts[..., 0] - cx) * sin + (pts[..., 1] - cy) * cos
    return (jnp.abs(rx) <= dx / 2 + eps) & (jnp.abs(ry) <= dy / 2 + eps)


def boxes_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Exact rotated-rectangle intersection areas, (N, M).

    boxes: (N, 5) [cx, cy, dx, dy, yaw]."""
    N, M = boxes_a.shape[0], boxes_b.shape[0]
    ca = _corners_bev(boxes_a)  # (N, 4, 2)
    cb = _corners_bev(boxes_b)  # (M, 4, 2)

    # 1) all 16 edge-pair intersections
    a0 = ca[:, None, :, None, :]  # (N,1,4,1,2)
    a1 = jnp.roll(ca, -1, axis=1)[:, None, :, None, :]
    b0 = cb[None, :, None, :, :]  # (1,M,1,4,2)
    b1 = jnp.roll(cb, -1, axis=1)[None, :, None, :, :]
    d1 = a1 - a0
    d2 = b1 - b0
    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]
    db = b0 - a0
    t = (db[..., 0] * d2[..., 1] - db[..., 1] * d2[..., 0]) / jnp.where(
        jnp.abs(denom) < 1e-12, 1.0, denom
    )
    s = (db[..., 0] * d1[..., 1] - db[..., 1] * d1[..., 0]) / jnp.where(
        jnp.abs(denom) < 1e-12, 1.0, denom
    )
    valid_int = (jnp.abs(denom) >= 1e-12) & (t >= 0) & (t <= 1) & (s >= 0) & (s <= 1)
    inter_pts = a0 + t[..., None] * d1  # (N,M,4,4,2)
    inter_pts = inter_pts.reshape(N, M, 16, 2)
    valid_int = valid_int.reshape(N, M, 16)

    # 2) corners of A inside B, corners of B inside A
    a_in_b = _point_in_rect(ca[:, None, :, :], boxes_b[None, :, None, :])  # (N,M,4)
    b_in_a = _point_in_rect(cb[None, :, :, :], boxes_a[:, None, None, :])  # (N,M,4)
    pts = jnp.concatenate(
        [
            inter_pts,
            jnp.broadcast_to(ca[:, None], (N, M, 4, 2)),
            jnp.broadcast_to(cb[None, :], (N, M, 4, 2)),
        ],
        axis=2,
    )  # (N, M, 24, 2)
    mask = jnp.concatenate([valid_int, a_in_b, b_in_a], axis=2)  # (N, M, 24)

    # 3) angle-sort valid candidates around their centroid, shoelace
    cnt = jnp.sum(mask, axis=2, keepdims=True)
    centroid = jnp.sum(jnp.where(mask[..., None], pts, 0), axis=2, keepdims=True) / jnp.maximum(
        cnt[..., None], 1
    )
    ang = jnp.arctan2(pts[..., 1] - centroid[..., 1], pts[..., 0] - centroid[..., 0])
    ang = jnp.where(mask, ang, jnp.inf)
    order = jnp.argsort(ang, axis=2)
    pts_s = jnp.take_along_axis(pts, order[..., None], axis=2)
    mask_s = jnp.take_along_axis(mask, order, axis=2)

    # shoelace over the valid prefix (wrap via index mod cnt)
    idx = jnp.arange(24)
    nxt = jnp.where(
        (idx[None, None, :] + 1) >= cnt, 0, idx[None, None, :] + 1
    )
    pts_n = jnp.take_along_axis(pts_s, nxt[..., None], axis=2)
    cross = pts_s[..., 0] * pts_n[..., 1] - pts_n[..., 0] * pts_s[..., 1]
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(mask_s, cross, 0.0), axis=2))
    return jnp.where(cnt[..., 0] >= 3, area, 0.0)


def boxes_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Rotated BEV IoU matrix (reference: iou3d_utils.py:6 boxes_iou_bev)."""
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    return inter / jnp.clip(area_a + area_b - inter, 1e-8, None)


def boxes_iou_3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """3D IoU for (N, 7) [x y z dx dy dz yaw] boxes (z = bottom center,
    matching the LiDAR box convention)."""
    bev_a = boxes_a[:, [0, 1, 3, 4, 6]]
    bev_b = boxes_b[:, [0, 1, 3, 4, 6]]
    inter_bev = boxes_overlap_bev(bev_a, bev_b)
    za0, za1 = boxes_a[:, 2], boxes_a[:, 2] + boxes_a[:, 5]
    zb0, zb1 = boxes_b[:, 2], boxes_b[:, 2] + boxes_b[:, 5]
    zh = jnp.clip(
        jnp.minimum(za1[:, None], zb1[None, :]) - jnp.maximum(za0[:, None], zb0[None, :]),
        0, None,
    )
    inter = inter_bev * zh
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(vol_a + vol_b - inter, 1e-8, None)


def _greedy_nms_from_iou(iou: jnp.ndarray, scores: jnp.ndarray, thresh: float):
    """Greedy suppression given a pairwise IoU matrix. Returns keep mask in
    the ORIGINAL order."""
    order = jnp.argsort(-scores)
    iou_s = iou[order][:, order]
    n = scores.shape[0]

    def body(i, keep):
        sup = (iou_s[i] > thresh) & keep[i] & (jnp.arange(n) > i)
        return keep & ~sup

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


@functools.partial(jax.jit, static_argnames=("thresh",))
def nms_bev(boxes: jnp.ndarray, scores: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """Rotated NMS (reference: iou3d_utils.py nms_gpu). boxes (N, 5),
    returns (N,) keep mask (static shape; gather indices host-side)."""
    return _greedy_nms_from_iou(boxes_iou_bev(boxes, boxes), scores, thresh)


@functools.partial(jax.jit, static_argnames=("thresh",))
def nms_normal_bev(boxes: jnp.ndarray, scores: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """Axis-aligned NMS on the boxes' AABBs (reference: nms_normal_gpu)."""
    c = _corners_bev(boxes)
    x0, y0 = c[..., 0].min(1), c[..., 1].min(1)
    x1, y1 = c[..., 0].max(1), c[..., 1].max(1)
    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    inter = jnp.clip(ix1 - ix0, 0, None) * jnp.clip(iy1 - iy0, 0, None)
    area = ((x1 - x0) * (y1 - y0))
    iou = inter / jnp.clip(area[:, None] + area[None, :] - inter, 1e-8, None)
    return _greedy_nms_from_iou(iou, scores, thresh)


def nearest_bev_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned IoU on rotation-snapped BEV boxes, (N, M).

    boxes: (N, 7+) [x, y, z, dx, dy, dz, yaw, ...]. Each box's (dx, dy)
    are swapped when its yaw is nearer +-pi/2 than 0, then standard AABB
    IoU (reference: mmdet3d/core/bbox/structures/lidar_box3d.py
    nearest_bev + iou_calculators BboxOverlapsNearest3D — the cheap IoU
    used by anchor target assignment)."""

    def _aabb(b):
        yaw = b[:, 6]
        rot = jnp.abs(yaw - jnp.floor(yaw / jnp.pi + 0.5) * jnp.pi)
        swap = rot > jnp.pi / 4
        dx = jnp.where(swap, b[:, 4], b[:, 3])
        dy = jnp.where(swap, b[:, 3], b[:, 4])
        return (
            b[:, 0] - dx / 2, b[:, 1] - dy / 2,
            b[:, 0] + dx / 2, b[:, 1] + dy / 2,
        )

    ax0, ay0, ax1, ay1 = _aabb(boxes_a)
    bx0, by0, bx1, by1 = _aabb(boxes_b)
    ix = jnp.clip(
        jnp.minimum(ax1[:, None], bx1[None, :])
        - jnp.maximum(ax0[:, None], bx0[None, :]), 0, None,
    )
    iy = jnp.clip(
        jnp.minimum(ay1[:, None], by1[None, :])
        - jnp.maximum(ay0[:, None], by0[None, :]), 0, None,
    )
    inter = ix * iy
    area_a = (ax1 - ax0) * (ay1 - ay0)
    area_b = (bx1 - bx0) * (by1 - by0)
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-8, None)


@functools.partial(jax.jit, static_argnames=("thresh", "post_max_size"))
def circle_nms(boxes_xy: jnp.ndarray, scores: jnp.ndarray, thresh: float,
               post_max_size: int = 83) -> jnp.ndarray:
    """Center-distance NMS (reference: box3d_nms.py:181 numba circle_nms):
    suppress boxes whose center distance^2 < thresh to a kept higher-score
    box. Returns keep mask."""
    d2 = jnp.sum((boxes_xy[:, None, :2] - boxes_xy[None, :, :2]) ** 2, axis=-1)
    iou_like = jnp.where(d2 < thresh, 1.0, 0.0)
    keep = _greedy_nms_from_iou(iou_like, scores, 0.5)
    # cap to post_max_size highest-score kept boxes
    order = jnp.argsort(-jnp.where(keep, scores, -jnp.inf))
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(len(order)))
    return keep & (rank < post_max_size)


@functools.partial(jax.jit, static_argnames=("thresh",))
def aligned_3d_nms(boxes: jnp.ndarray, scores: jnp.ndarray, classes: jnp.ndarray,
                   thresh: float) -> jnp.ndarray:
    """Axis-aligned 3D NMS, class-aware (reference: box3d_nms.py:130).
    boxes (N, 6) [x0 y0 z0 x1 y1 z1]."""
    mn = boxes[:, :3]
    mx = boxes[:, 3:6]
    imn = jnp.maximum(mn[:, None], mn[None, :])
    imx = jnp.minimum(mx[:, None], mx[None, :])
    inter = jnp.prod(jnp.clip(imx - imn, 0, None), axis=-1)
    vol = jnp.prod(mx - mn, axis=-1)
    iou = inter / jnp.clip(vol[:, None] + vol[None, :] - inter, 1e-8, None)
    iou = jnp.where(classes[:, None] == classes[None, :], iou, 0.0)
    return _greedy_nms_from_iou(iou, scores, thresh)
