"""resize_2d must match torch F.interpolate bit-for-bit in semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from recondet3d.utils.interpolation import resize_2d


def _cmp(x_nchw, out, mode, align_corners, scale=None):
    kwargs = dict(mode=mode)
    if mode != "nearest":
        kwargs["align_corners"] = align_corners
    if scale is not None:
        ref = F.interpolate(torch.from_numpy(x_nchw), scale_factor=scale, **kwargs)
    else:
        ref = F.interpolate(torch.from_numpy(x_nchw), size=out, **kwargs)
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    got = np.asarray(
        resize_2d(
            x_nhwc,
            tuple(ref.shape[-2:]),
            mode=mode,
            align_corners=align_corners,
            scale=scale,
        )
    )
    got = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref.numpy(), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("mode,ac", [("bilinear", True), ("bilinear", False), ("bicubic", False)])
@pytest.mark.parametrize("shape,out", [((2, 3, 9, 13), (18, 26)), ((1, 4, 12, 12), (7, 5)), ((1, 2, 36, 36), (45, 45))])
def test_resize_matches_torch(mode, ac, shape, out):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    _cmp(x, out, mode, ac)


def test_bicubic_with_explicit_scale_factor():
    # the DINOv2 pos-embed kludge: scale_factor=(w0+0.1)/M
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 37, 37)).astype(np.float32)
    sx = (36 + 0.1) / 37
    _cmp(x, None, "bicubic", False, scale=(sx, sx))


@pytest.mark.parametrize("shape,out", [((1, 3, 283, 504), (280, 504)), ((2, 2, 36, 36), (12, 18))])
def test_area_matches_torch(shape, out):
    rng = np.random.default_rng(5)
    x = rng.normal(size=shape).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=out, mode="area")
    got = np.asarray(
        resize_2d(np.transpose(x, (0, 2, 3, 1)), out, mode="area")
    )
    np.testing.assert_allclose(
        np.transpose(got, (0, 3, 1, 2)), ref.numpy(), atol=2e-5, rtol=2e-5
    )


def test_nearest():
    x = np.arange(2 * 1 * 4 * 4, dtype=np.float32).reshape(2, 1, 4, 4)
    _cmp(x, (8, 8), "nearest", False)
