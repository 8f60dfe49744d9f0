"""Model output dict -> Prediction (reference:
depth_anything_3/utils/io/output_processor.py:31-200): squeeze the B=1
batch dim, numpy conversion, sky -> bool mask at 0.5."""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from recondet3d.specs import Prediction

__all__ = ["OutputProcessor"]


def _np(x):
    return None if x is None else np.asarray(x)


class OutputProcessor:
    def __call__(self, model_output: Dict[str, Any]) -> Prediction:
        depth = _np(model_output["depth"])[0]  # (N, H, W)
        conf = model_output.get("depth_conf")
        conf = None if conf is None else _np(conf)[0]
        sky = model_output.get("sky")
        sky = None if sky is None else (_np(sky)[0] >= 0.5)
        extr = model_output.get("extrinsics")
        extr = None if extr is None else _np(extr)[0].astype(np.float32)
        intr = model_output.get("intrinsics")
        intr = None if intr is None else _np(intr)[0].astype(np.float32)
        aux = model_output.get("aux")
        if aux is not None:
            aux = {k: _np(v)[0] for k, v in aux.items()}
        gaussians = model_output.get("gaussians")
        sf = model_output.get("scale_factor")
        return Prediction(
            depth=depth.astype(np.float32),
            conf=None if conf is None else conf.astype(np.float32),
            sky=sky,
            extrinsics=extr,
            intrinsics=intr,
            gaussians=gaussians,
            aux=aux,
            scale_factor=None if sf is None else float(np.asarray(sf)),
            is_metric=bool(np.asarray(model_output.get("is_metric", 0))),
        )
