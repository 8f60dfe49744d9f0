"""Pose encodings and quaternion<->matrix conversions (JAX).

Re-implementation of the reference pose math
(reference: depth_anything_3/model/utils/transform.py:19-208): 9-D camera
pose encoding (t(3), quat xyzw(4), fov(2)), scalar-last quaternions.
All functions are pure/jittable and broadcast over leading dims.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "quat_to_mat",
    "mat_to_quat",
    "standardize_quaternion",
    "extri_intri_to_pose_encoding",
    "pose_encoding_to_extri_intri",
    "cam_quat_xyzw_to_world_quat_wxyz",
]


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """xyzw (scalar-last) quaternion -> rotation matrix (..., 3, 3)."""
    i, j, k, r = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Non-negative real part (scalar-last layout)."""
    return jnp.where(q[..., 3:4] < 0, -q, q)


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> xyzw quaternion; numerically matches the
    pytorch3d-style branchful conversion the reference uses."""
    batch = m.shape[:-2]
    f = m.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [f[..., i] for i in range(9)]

    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    candidates = quat_by_rijk / denom
    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(candidates, best[..., None, None].repeat(4, -1), axis=-2)
    out = out.squeeze(-2)  # rijk
    out = out[..., [1, 2, 3, 0]]  # -> xyzw
    return standardize_quaternion(out)


def extri_intri_to_pose_encoding(extrinsics, intrinsics, image_size_hw: Tuple[int, int]):
    """(..., 3or4, 4) extrinsics + (..., 3, 3) intrinsics -> 9-D encoding."""
    R = extrinsics[..., :3, :3]
    T = extrinsics[..., :3, 3]
    quat = mat_to_quat(R)
    H, W = image_size_hw
    fov_h = 2 * jnp.arctan((H / 2) / intrinsics[..., 1, 1])
    fov_w = 2 * jnp.arctan((W / 2) / intrinsics[..., 0, 0])
    return jnp.concatenate(
        [T, quat, fov_h[..., None], fov_w[..., None]], axis=-1
    ).astype(jnp.float32)


def pose_encoding_to_extri_intri(pose_encoding, image_size_hw: Tuple[int, int]):
    """9-D encoding -> ((..., 3, 4) extrinsics, (..., 3, 3) intrinsics)."""
    T = pose_encoding[..., :3]
    quat = pose_encoding[..., 3:7]
    fov_h = pose_encoding[..., 7]
    fov_w = pose_encoding[..., 8]
    R = quat_to_mat(quat)
    extr = jnp.concatenate([R, T[..., None]], axis=-1)
    H, W = image_size_hw
    fy = (H / 2.0) / jnp.clip(jnp.tan(fov_h / 2.0), 1e-6, None)
    fx = (W / 2.0) / jnp.clip(jnp.tan(fov_w / 2.0), 1e-6, None)
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    intr = jnp.stack(
        [
            jnp.stack([fx, zeros, ones * (W / 2)], axis=-1),
            jnp.stack([zeros, fy, ones * (H / 2)], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return extr, intr


def cam_quat_xyzw_to_world_quat_wxyz(cam_quat_xyzw, c2w):
    """Rotate camera-space quats into world space, return wxyz
    (reference: transform.py:184-208)."""
    wxyz = jnp.concatenate(
        [cam_quat_xyzw[..., 3:4], cam_quat_xyzw[..., 0:3]], axis=-1
    )
    # wxyz -> matrix via xyzw converter with reshuffled input
    xyzw = jnp.concatenate([wxyz[..., 1:4], wxyz[..., 0:1]], axis=-1)
    rot_cam = quat_to_mat(xyzw)
    rot_world = c2w[..., :3, :3] @ rot_cam
    q_xyzw = mat_to_quat(rot_world)
    return jnp.concatenate([q_xyzw[..., 3:4], q_xyzw[..., 0:3]], axis=-1)
