"""Image/feature-map resizing with exact torch ``F.interpolate`` semantics.

The reference pipeline leans on torch interpolation in several places whose
numerics matter for parity (reference: DPT ``custom_interpolate`` bilinear
align_corners=True in model/utils/head_utils.py:custom_interpolate; DINOv2
positional-embedding bicubic with the 0.1 scale-factor kludge in
model/dinov2/vision_transformer.py:220-254; BEV U-Net bilinear
align_corners=False in sparse_refinement.py forward).

TPU-first design: separable resampling expressed as two dense matmuls with
precomputed (static-shape) weight matrices — the MXU eats these, no gather
kernels, and the weights are built in numpy with bit-faithful torch
coordinate mapping (half-pixel / align-corners / explicit scale_factor,
border clamping, cubic a=-0.75).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["resize_2d", "interp_matrix"]


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (torch uses a=-0.75)."""
    t = np.abs(t)
    out = np.zeros_like(t)
    m1 = t <= 1
    m2 = (t > 1) & (t < 2)
    out[m1] = (a + 2) * t[m1] ** 3 - (a + 3) * t[m1] ** 2 + 1
    out[m2] = a * t[m2] ** 3 - 5 * a * t[m2] ** 2 + 8 * a * t[m2] - 4 * a
    return out


@functools.lru_cache(maxsize=256)
def _interp_matrix_np(
    in_size: int,
    out_size: int,
    mode: str,
    align_corners: bool,
    scale: Optional[float],
) -> np.ndarray:
    """Dense (out_size, in_size) interpolation matrix, torch semantics."""
    o = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = o * ((in_size - 1) / (out_size - 1)) if out_size > 1 else np.zeros_like(o)
    else:
        s = scale if scale is not None else out_size / in_size
        src = (o + 0.5) / s - 0.5

    M = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "nearest":
        # torch 'nearest' (legacy): floor(o * in/out)
        idx = np.minimum((o * (in_size / out_size)).astype(np.int64), in_size - 1)
        M[np.arange(out_size), idx] = 1.0
    elif mode == "bilinear":
        if not align_corners:
            src = np.clip(src, 0, in_size - 1)
        i0 = np.floor(src).astype(np.int64)
        w = src - i0
        i0c = np.clip(i0, 0, in_size - 1)
        i1c = np.clip(i0 + 1, 0, in_size - 1)
        np.add.at(M, (np.arange(out_size), i0c), 1 - w)
        np.add.at(M, (np.arange(out_size), i1c), w)
    elif mode == "area":
        # torch 'area' = adaptive average pooling with integer cell
        # boundaries: [floor(o*in/out), ceil((o+1)*in/out)), equal weights
        for o_i in range(out_size):
            i0 = int(np.floor(o_i * in_size / out_size))
            i1 = int(np.ceil((o_i + 1) * in_size / out_size))
            i1 = min(i1, in_size)
            M[o_i, i0:i1] = 1.0 / (i1 - i0)
    elif mode == "bicubic":
        i0 = np.floor(src).astype(np.int64)
        t = src - i0
        for k in range(-1, 3):
            wk = _cubic_kernel(t - k)
            ik = np.clip(i0 + k, 0, in_size - 1)
            np.add.at(M, (np.arange(out_size), ik), wk)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return M.astype(np.float32)


def interp_matrix(in_size, out_size, mode="bilinear", align_corners=False, scale=None):
    return _interp_matrix_np(int(in_size), int(out_size), mode, bool(align_corners),
                             None if scale is None else float(scale))


def resize_2d(
    x: jnp.ndarray,
    size: Tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
    scale: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """Resize (..., H, W, C) channels-last arrays to ``size`` (out_h, out_w).

    ``scale`` optionally pins the torch ``scale_factor`` coordinate mapping
    (needed for the DINOv2 pos-embed interpolate_offset kludge).
    """
    h, w = x.shape[-3], x.shape[-2]
    out_h, out_w = size
    if (h, w) == (out_h, out_w) and scale is None:
        return x
    sh = None if scale is None else scale[0]
    sw = None if scale is None else scale[1]
    Mh = jnp.asarray(interp_matrix(h, out_h, mode, align_corners, sh), dtype=x.dtype)
    Mw = jnp.asarray(interp_matrix(w, out_w, mode, align_corners, sw), dtype=x.dtype)
    y = jnp.einsum("oh,...hwc->...owc", Mh, x)
    y = jnp.einsum("pw,...owc->...opc", Mw, y)
    return y
