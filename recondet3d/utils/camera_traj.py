"""Camera trajectory helpers for novel-view rendering.

Re-implementation of the reference trajectory toolbox
(reference: depth_anything_3/utils/camera_trj_helpers.py — pose
interpolation plus wander / wobble / dolly-zoom render paths used by the
gs_video exporter). Poses are (V, 3or4, 4) w2c; interpolation runs on
c2w with quaternion slerp.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from recondet3d.utils.pose_align import _affine_inverse_np, _to44_np

__all__ = [
    "interpolate_camera_path",
    "wander_path",
    "wobble_path",
    "dolly_zoom_path",
]


def _mat_to_quat_np(R):
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                         (R[1, 0] - R[0, 1]) / s, 0.25 * s])
    i = np.argmax(np.diag(R))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
    q = np.zeros(4)
    q[i] = 0.25 * s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    q[3] = (R[k, j] - R[j, k]) / s
    return q


def _quat_to_mat_np(q):
    x, y, z, w = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _slerp(q0, q1, t):
    d = np.dot(q0, q1)
    if d < 0:
        q1, d = -q1, -d
    if d > 0.9995:
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1, 1))
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


def interpolate_camera_path(extrinsics, intrinsics, n_frames: int = 60,
                            loop: bool = False):
    """Smoothly interpolate through the input views (slerp R, lerp t, K)."""
    ext = _to44_np(np.asarray(extrinsics, np.float64))
    c2w = _affine_inverse_np(ext)
    V = len(c2w)
    ixt = np.asarray(intrinsics, np.float64)
    keys = list(range(V)) + ([0] if loop else [])
    n_seg = len(keys) - 1
    if n_seg == 0:
        return (np.repeat(ext[:1], n_frames, 0).astype(np.float32),
                np.repeat(ixt[:1], n_frames, 0).astype(np.float32))
    out_e, out_k = [], []
    for f in range(n_frames):
        s = f * n_seg / max(n_frames - 1, 1)
        i = min(int(s), n_seg - 1)
        t = s - i
        a, b = keys[i], keys[i + 1]
        q = _slerp(_mat_to_quat_np(c2w[a][:3, :3]), _mat_to_quat_np(c2w[b][:3, :3]), t)
        pos = (1 - t) * c2w[a][:3, 3] + t * c2w[b][:3, 3]
        M = np.eye(4)
        M[:3, :3] = _quat_to_mat_np(q)
        M[:3, 3] = pos
        out_e.append(_affine_inverse_np(M[None])[0])
        out_k.append((1 - t) * ixt[a] + t * ixt[b])
    return np.stack(out_e).astype(np.float32), np.stack(out_k).astype(np.float32)


def _apply_local_offsets(ext0, ixt0, offsets, n_frames):
    """Offsets (n, 3) in the camera frame around a base pose."""
    ext0 = _to44_np(np.asarray(ext0, np.float64)[None])[0]
    c2w = _affine_inverse_np(ext0[None])[0]
    outs = []
    for off in offsets:
        M = c2w.copy()
        M[:3, 3] = c2w[:3, 3] + c2w[:3, :3] @ off
        outs.append(_affine_inverse_np(M[None])[0])
    ext = np.stack(outs).astype(np.float32)
    ixt = np.repeat(np.asarray(ixt0, np.float32)[None], n_frames, 0)
    return ext, ixt


def wander_path(ext0, ixt0, n_frames: int = 60, radius: float = 0.3):
    """Circular sideways wander around the base view."""
    th = np.linspace(0, 2 * np.pi, n_frames)
    offsets = np.stack([radius * np.sin(th), radius * np.cos(th) * 0.4,
                        np.zeros_like(th)], 1)
    return _apply_local_offsets(ext0, ixt0, offsets, n_frames)


def wobble_path(ext0, ixt0, n_frames: int = 60, radius: float = 0.1):
    th = np.linspace(0, 4 * np.pi, n_frames)
    offsets = np.stack([radius * np.sin(th), radius * np.sin(2 * th) * 0.5,
                        np.zeros_like(th)], 1)
    return _apply_local_offsets(ext0, ixt0, offsets, n_frames)


def dolly_zoom_path(ext0, ixt0, n_frames: int = 60, depth_range=(0.0, 0.5),
                    fov_scale=(1.0, 1.3)):
    """Move forward while widening the FOV."""
    zs = np.linspace(depth_range[0], depth_range[1], n_frames)
    offsets = np.stack([np.zeros_like(zs), np.zeros_like(zs), zs], 1)
    ext, ixt = _apply_local_offsets(ext0, ixt0, offsets, n_frames)
    scale = np.linspace(fov_scale[0], fov_scale[1], n_frames)
    ixt = ixt.copy()
    ixt[:, 0, 0] /= scale
    ixt[:, 1, 1] /= scale
    return ext, ixt
