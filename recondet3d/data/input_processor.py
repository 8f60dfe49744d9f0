"""DA3 input processing: resize to process_res, patch-14 alignment,
ImageNet normalization, intrinsics rescale.

Re-implementation of the reference InputProcessor
(reference: depth_anything_3/utils/io/input_processor.py:35-590): the
tensor-batch path (:136-235, used by the ResDet3D reconstruction
backbone) becomes one jitted function whose two torch interpolations
(bilinear to scale, then area/bilinear to the nearest patch multiple)
compile to two matmul resizes; the PIL list path (:292-500, used by the
DA3 API/CLI) runs host-side on numpy.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recondet3d.utils.constants import IMAGENET_MEAN, IMAGENET_STD, PATCH_SIZE
from recondet3d.utils.interpolation import resize_2d

__all__ = ["InputProcessor", "process_tensor_batch", "compute_process_shape"]


def _nearest_multiple(x: int, p: int) -> int:
    down = (x // p) * p
    up = down + p
    return max(p, up if abs(up - x) <= abs(x - down) else down)


def compute_process_shape(
    H: int, W: int, process_res: int = 504, method: str = "upper_bound_resize"
) -> Tuple[int, int, int, int]:
    """Returns (new_H, new_W) after aspect-preserving resize and
    (final_H, final_W) after patch-14 rounding."""
    if method in ("upper_bound_resize", "upper_bound_crop"):
        scale = process_res / max(H, W)
    elif method in ("lower_bound_resize", "lower_bound_crop"):
        scale = process_res / min(H, W)
    else:
        raise ValueError(method)
    new_H, new_W = int(H * scale), int(W * scale)
    final_H = _nearest_multiple(new_H, PATCH_SIZE)
    final_W = _nearest_multiple(new_W, PATCH_SIZE)
    return new_H, new_W, final_H, final_W


@functools.partial(jax.jit, static_argnames=("process_res", "method", "assume_range"))
def process_tensor_batch(
    images: jnp.ndarray,
    intrinsics: Optional[jnp.ndarray] = None,
    process_res: int = 504,
    method: str = "upper_bound_resize",
    assume_range: str = "auto",  # 'auto' | '255' | '01'
):
    """images (B, N, H, W, 3) -> (B, N, H', W', 3) normalized (+ rescaled
    intrinsics). H', W' are multiples of 14."""
    B, N, H, W, _ = images.shape
    new_H, new_W, final_H, final_W = compute_process_shape(H, W, process_res, method)

    x = images.reshape(B * N, H, W, 3).astype(jnp.float32)
    x = resize_2d(x, (new_H, new_W), mode="bilinear", align_corners=False)
    if (final_H, final_W) != (new_H, new_W):
        upscale = final_H > new_H or final_W > new_W
        x = resize_2d(
            x, (final_H, final_W), mode="bilinear" if upscale else "area",
            align_corners=False,
        )

    if assume_range == "255":
        x = x / 255.0
    elif assume_range == "01":
        pass
    else:
        x = jnp.where(jnp.max(x) > 1.0, x / 255.0, x)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = (x - mean) / std
    x = x.reshape(B, N, final_H, final_W, 3)

    if intrinsics is not None:
        sx = final_W / W
        sy = final_H / H
        scale = jnp.asarray([[sx, 1.0, sx], [1.0, sy, sy], [1.0, 1.0, 1.0]])
        intrinsics = intrinsics * scale
    return x, intrinsics


class InputProcessor:
    """Host-side list-of-images path for the DA3 public API."""

    PATCH_SIZE = PATCH_SIZE

    def __init__(self, process_res: int = 504,
                 process_res_method: str = "upper_bound_resize"):
        self.process_res = process_res
        self.process_res_method = process_res_method

    def __call__(
        self,
        images: Sequence,
        extrinsics: Optional[np.ndarray] = None,
        intrinsics: Optional[np.ndarray] = None,
    ):
        """images: list of HxWx3 uint8 arrays / PIL images / paths.
        Returns (batch (1, N, H', W', 3) float32 normalized, extrinsics,
        intrinsics, processed uint8 images (N, H', W', 3))."""
        arrs = [self._load(im) for im in images]
        processed, k_out = [], []
        for i, arr in enumerate(arrs):
            H, W = arr.shape[:2]
            _, _, fH, fW = compute_process_shape(
                H, W, self.process_res, self.process_res_method
            )
            import cv2

            interp = cv2.INTER_AREA if fW < W else cv2.INTER_CUBIC
            out = cv2.resize(arr, (fW, fH), interpolation=interp)
            processed.append(out)
            if intrinsics is not None:
                k = np.array(intrinsics[i], np.float64).copy()
                k[0] *= fW / W
                k[1] *= fH / H
                k_out.append(k)

        shapes = {p.shape for p in processed}
        if len(shapes) != 1:
            raise ValueError(f"views disagree on processed shape: {shapes}")
        raw = np.stack(processed)  # (N, H', W', 3) uint8
        x = raw.astype(np.float32) / 255.0
        x = (x - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(IMAGENET_STD, np.float32)
        batch = x[None]
        k_arr = np.stack(k_out)[None] if k_out else None
        e_arr = np.asarray(extrinsics, np.float32)[None] if extrinsics is not None else None
        return batch, e_arr, k_arr, raw

    @staticmethod
    def _load(im) -> np.ndarray:
        if isinstance(im, str):
            from PIL import Image

            with Image.open(im) as f:
                return np.asarray(f.convert("RGB"))
        if hasattr(im, "convert"):
            return np.asarray(im.convert("RGB"))
        arr = np.asarray(im)
        if arr.ndim != 3 or arr.shape[-1] != 3:
            raise ValueError(f"bad image shape {arr.shape}")
        return arr
