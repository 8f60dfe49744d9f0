"""Gaussian adapter: raw GS head output -> world-space 3D gaussians.

Re-implementation of the reference adapter
(reference: depth_anything_3/model/gs_adapter.py:27-200): means via ray
unprojection with optional xy/depth offsets, sigmoid scale clamping scaled
by depth and pixel footprint, camera->world quaternion + SH rotation,
opacity from density. Parameter-free (the torch version only registers a
constant sh_mask buffer), so it is a plain callable, not a linen module.

Deviation: the reference's umeyama pose-scale alignment against GT
extrinsics (gs_adapter.py:90-105) is applied when gt poses are provided;
here it uses the JAX umeyama in utils/pose_align.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recondet3d.specs import Gaussians
from recondet3d.utils.geometry import affine_inverse, get_world_rays, sample_image_grid
from recondet3d.utils.sh import rotate_sh
from recondet3d.utils.transforms import cam_quat_xyzw_to_world_quat_wxyz

__all__ = ["GaussianAdapter"]


@dataclasses.dataclass
class GaussianAdapter:
    sh_degree: int = 0
    pred_color: bool = False
    pred_offset_depth: bool = False
    pred_offset_xy: bool = True
    gaussian_scale_min: float = 1e-5
    gaussian_scale_max: float = 30.0

    @property
    def d_sh(self) -> int:
        return 1 if self.pred_color else (self.sh_degree + 1) ** 2

    @property
    def d_in(self) -> int:
        d = 3 + 4 + 3 * self.d_sh
        if self.pred_offset_xy:
            d += 2
        if self.pred_offset_depth:
            d += 1
        return d

    def _sh_mask(self) -> np.ndarray:
        mask = np.ones((self.d_sh,), np.float32)
        for degree in range(1, self.sh_degree + 1):
            mask[degree ** 2 : (degree + 1) ** 2] = 0.1 * 0.25 ** degree
        return mask

    def __call__(
        self,
        extrinsics: jnp.ndarray,  # (B, V, 4, 4) w2c
        intrinsics: jnp.ndarray,  # (B, V, 3, 3)
        depths: jnp.ndarray,  # (B, V, H, W)
        opacities: jnp.ndarray,  # (B, V, H, W)
        raw_gaussians: jnp.ndarray,  # (B, V, H, W, d_in+? )
        image_shape: Tuple[int, int],
        gt_extrinsics: Optional[jnp.ndarray] = None,
        eps: float = 1e-8,
    ) -> Gaussians:
        H, W = image_shape
        b, v = raw_gaussians.shape[:2]
        raw = raw_gaussians.astype(jnp.float32)

        cam2worlds = affine_inverse(extrinsics.astype(jnp.float32))
        intr_normed = intrinsics.astype(jnp.float32)
        intr_normed = intr_normed.at[..., 0, :].divide(W).at[..., 1, :].divide(H)

        if self.pred_offset_depth:
            gs_depths = depths + raw[..., -1]
            raw = raw[..., :-1]
        else:
            gs_depths = depths

        if gt_extrinsics is not None:
            from recondet3d.utils.pose_align import batch_umeyama_pose_scales

            pose_scales = batch_umeyama_pose_scales(
                gt_extrinsics.astype(jnp.float32), extrinsics.astype(jnp.float32)
            )
            pose_scales = jnp.clip(pose_scales, 1 / 3.0, 3.0)
            cam2worlds = cam2worlds.at[:, :, :3, 3].multiply(pose_scales[:, None, None])
            gs_depths = gs_depths * pose_scales[:, None, None, None]

        xy_ray, _ = sample_image_grid((H, W))
        xy_ray = jnp.broadcast_to(xy_ray[None, None], (b, v, H, W, 2))
        if self.pred_offset_xy:
            pixel_size = jnp.array([1.0 / W, 1.0 / H], jnp.float32)
            xy_ray = xy_ray + raw[..., :2] * pixel_size
            raw = raw[..., 2:]

        c2w_hw = cam2worlds[:, :, None, None]
        intr_hw = intr_normed[:, :, None, None]
        origins, directions = get_world_rays(xy_ray, c2w_hw, intr_hw)
        means = origins + directions * gs_depths[..., None]
        means = means.reshape(b, v * H * W, 3)

        scales = raw[..., 0:3]
        rotations = raw[..., 3:7]
        sh = raw[..., 7 : 7 + 3 * self.d_sh]

        smin, smax = self.gaussian_scale_min, self.gaussian_scale_max
        scales = smin + (smax - smin) * jax.nn.sigmoid(scales)
        pixel_size = jnp.array([1.0 / W, 1.0 / H], jnp.float32)
        multiplier = self._scale_multiplier(intr_normed, pixel_size)
        gs_scales = scales * gs_depths[..., None] * multiplier[..., None, None, None]
        gs_scales = gs_scales.reshape(b, v * H * W, 3)

        rotations = rotations / (jnp.linalg.norm(rotations, axis=-1, keepdims=True) + eps)
        cam_quat = rotations.reshape(b, v * H * W, 4)
        c2w_rep = jnp.repeat(cam2worlds, H * W, axis=1)
        world_quat = cam_quat_xyzw_to_world_quat_wxyz(cam_quat, c2w_rep)

        sh = sh.reshape(*sh.shape[:-1], 3, self.d_sh)
        if not self.pred_color:
            sh = sh * jnp.asarray(self._sh_mask())
        if self.pred_color or self.sh_degree == 0:
            sh_world = sh
        else:
            sh_world = rotate_sh(sh, cam2worlds[:, :, None, None, None, :3, :3])
        sh_world = sh_world.reshape(b, v * H * W, 3, self.d_sh)

        return Gaussians(
            means=means,
            harmonics=sh_world,
            opacities=opacities.reshape(b, v * H * W),
            scales=gs_scales,
            rotations=world_quat,
        )

    def _scale_multiplier(self, intr_normed, pixel_size, multiplier: float = 0.1):
        inv2 = jnp.linalg.inv(intr_normed[..., :2, :2])
        return multiplier * jnp.einsum("...ij,j->...i", inv2, pixel_size).sum(-1)
