"""PCA feature visualization (reference: depth_anything_3/utils/
pca_utils.py (284 LoC) + utils/export/feat_vis.py — project ViT features
to RGB via a 3-component PCA shared across views, written as PNGs/video).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["pca_feature_rgb", "export_to_feat_vis"]


def pca_feature_rgb(feats: np.ndarray, n_components: int = 3) -> np.ndarray:
    """(..., C) features -> (..., 3) in [0, 1] via shared PCA."""
    shape = feats.shape
    flat = feats.reshape(-1, shape[-1]).astype(np.float64)
    flat = flat - flat.mean(0)
    # top-3 principal directions via the C x C covariance eigvecs
    cov = flat.T @ flat / max(len(flat) - 1, 1)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :n_components]
    proj = flat @ comps
    lo = np.percentile(proj, 2, axis=0)
    hi = np.percentile(proj, 98, axis=0)
    rgb = np.clip((proj - lo) / np.maximum(hi - lo, 1e-9), 0, 1)
    return rgb.reshape(shape[:-1] + (n_components,))


def export_to_feat_vis(prediction, export_dir: str, fps: int = 15) -> str:
    """Render aux feature layers to PCA-RGB PNGs (+ mp4 when multi-view)."""
    import cv2

    if not prediction.aux:
        raise ValueError("prediction has no aux features; pass export_feat_layers")
    os.makedirs(export_dir, exist_ok=True)
    for name, feat in prediction.aux.items():
        f = np.asarray(feat)  # (S, h, w, C)
        rgb = (pca_feature_rgb(f) * 255).astype(np.uint8)
        for i in range(rgb.shape[0]):
            cv2.imwrite(
                os.path.join(export_dir, f"{name}_view{i:02d}.png"),
                cv2.resize(rgb[i][..., ::-1], None, fx=8, fy=8,
                           interpolation=cv2.INTER_NEAREST),
            )
        if rgb.shape[0] > 1:
            H, W = rgb.shape[1:3]
            vw = cv2.VideoWriter(
                os.path.join(export_dir, f"{name}.mp4"),
                cv2.VideoWriter_fourcc(*"mp4v"), fps, (W * 8, H * 8),
            )
            for i in range(rgb.shape[0]):
                vw.write(cv2.resize(rgb[i][..., ::-1], (W * 8, H * 8),
                                    interpolation=cv2.INTER_NEAREST))
            vw.release()
    return export_dir
