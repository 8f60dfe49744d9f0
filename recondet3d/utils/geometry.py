"""Homogeneous geometry helpers (JAX).

Re-implementation of the reference geometry toolbox
(reference: depth_anything_3/utils/geometry.py:23-434): homogeneous
extrinsics, affine inverse, normalized image grids, unprojection and world
rays. Everything broadcasts and is jit-safe.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = [
    "as_homogeneous",
    "affine_inverse",
    "homogenize_points",
    "sample_image_grid",
    "unproject",
    "get_world_rays",
    "map_pdf_to_opacity",
    "depth_to_points_cam",
]


def as_homogeneous(ext: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) or (..., 4, 4) -> (..., 4, 4)."""
    if ext.shape[-2:] == (4, 4):
        return ext
    if ext.shape[-2:] == (3, 4):
        bottom = jnp.zeros_like(ext[..., :1, :4]).at[..., 0, 3].set(1.0)
        return jnp.concatenate([ext, bottom], axis=-2)
    raise ValueError(f"invalid extrinsics shape {ext.shape}")


def affine_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of an affine transform; keeps a (3,4) or (4,4) shape."""
    R = A[..., :3, :3]
    T = A[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ T], axis=-1)
    if A.shape[-2] == 3:
        return top
    return jnp.concatenate([top, A[..., 3:, :]], axis=-2)


def homogenize_points(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def sample_image_grid(shape: Tuple[int, int]):
    """Normalized (0..1) xy coordinates + integer ij indices
    (reference: geometry.py:218-238)."""
    h, w = shape
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    jj, ii = jnp.meshgrid(ys, xs, indexing="ij")
    indices = jnp.stack([jj, ii], axis=-1)
    xf = (xs + 0.5) / w
    yf = (ys + 0.5) / h
    xg, yg = jnp.meshgrid(xf, yf, indexing="xy")
    coords = jnp.stack([xg, yg], axis=-1)
    return coords, indices


def unproject(coordinates, z, intrinsics):
    """Unproject 2D (normalized) camera coords with Z values."""
    coords_h = homogenize_points(coordinates)
    inv_k = jnp.linalg.inv(intrinsics.astype(jnp.float32)).astype(intrinsics.dtype)
    dirs = jnp.einsum("...ij,...j->...i", inv_k, coords_h.astype(intrinsics.dtype))
    return dirs * z[..., None]


def get_world_rays(coordinates, extrinsics, intrinsics):
    """Ray origins + normalized directions in world space (c2w extrinsics)."""
    directions = unproject(coordinates, jnp.ones_like(coordinates[..., 0]), intrinsics)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    dir_h = homogenize_points(directions) * jnp.array([1.0, 1.0, 1.0, 0.0])
    org_h = jnp.zeros_like(dir_h).at[..., 3].set(1.0)
    world_dirs = jnp.einsum("...ij,...j->...i", extrinsics, dir_h)[..., :3]
    world_orgs = jnp.einsum("...ij,...j->...i", extrinsics, org_h)[..., :3]
    return world_orgs, world_dirs


def map_pdf_to_opacity(pdf, global_step: int = 0, opacity_mapping=None):
    """Density -> opacity mapping used by the GS adapter
    (reference: geometry.py:333-349). With the default schedule the
    exponent is 2**0 = 1 and this is the identity-average form."""
    if opacity_mapping is not None:
        x = opacity_mapping["initial"] + min(
            global_step / opacity_mapping["warm_up"], 1
        ) * (opacity_mapping["final"] - opacity_mapping["initial"])
    else:
        x = 0.0
    exponent = 2.0 ** x
    return 0.5 * (1 - (1 - pdf) ** exponent + pdf ** (1 / exponent))


def depth_to_points_cam(depth: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Pinhole unprojection of a depth map to camera-frame points.

    depth (..., H, W), intrinsics (..., 3, 3) -> (..., H, W, 3). Vectorized
    equivalent of the reference per-camera loop
    (reference: reconstruction_backbone.py:285-345 _backproject_depth_to_points).
    """
    H, W = depth.shape[-2:]
    vv, uu = jnp.meshgrid(jnp.arange(H, dtype=depth.dtype), jnp.arange(W, dtype=depth.dtype),
                          indexing="ij")
    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]
    z = depth
    x = (uu - cx) * z / fx
    y = (vv - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)
