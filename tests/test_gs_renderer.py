"""Splat renderer tests: a single gaussian lands where the pinhole says,
occlusion ordering is front-to-back, SH rotation consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from recondet3d.models.da3.gs_renderer import render_3dgs
from recondet3d.specs import Gaussians
from recondet3d.utils.sh import SH_C0, eval_sh_basis, rotate_sh


def _gauss(means, colors, scale=0.05, opacity=0.95):
    n = len(means)
    harm = np.zeros((n, 3, 9), np.float32)
    harm[:, :, 0] = (np.asarray(colors) - 0.5) / SH_C0  # DC gives the color
    return Gaussians(
        means=np.asarray(means, np.float32),
        scales=np.full((n, 3), scale, np.float32),
        rotations=np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32),
        harmonics=harm,
        opacities=np.full((n,), opacity, np.float32),
    )


def _cam(W=64, H=48, f=60.0):
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    E = np.eye(4, dtype=np.float32)  # w2c identity: camera at origin +z fwd
    return E, K, (H, W)


def test_single_gaussian_position_and_color():
    g = _gauss([[0.5, -0.2, 4.0]], [[1.0, 0.0, 0.0]], scale=0.08)
    E, K, hw = _cam()
    rgb, dep, alpha = render_3dgs(g, E[None], K[None], hw)
    rgb = np.asarray(rgb)[0]
    u = K[0, 0] * 0.5 / 4.0 + K[0, 2]
    v = K[1, 1] * -0.2 / 4.0 + K[1, 2]
    yy, xx = np.unravel_index(np.argmax(np.asarray(alpha)[0]), alpha.shape[1:])
    assert abs(xx - u) <= 1.5 and abs(yy - v) <= 1.5
    # red dominates at the splat center
    assert rgb[yy, xx, 0] > 0.5 and rgb[yy, xx, 0] > 3 * rgb[yy, xx, 1]
    # depth at center ~ 4
    d = np.asarray(dep)[0, yy, xx] / max(np.asarray(alpha)[0, yy, xx], 1e-6)
    assert abs(d - 4.0) < 0.2


def test_occlusion_order():
    # near green in front of far red at the same ray
    g = _gauss([[0.0, 0.0, 2.0], [0.0, 0.0, 6.0]],
               [[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], scale=0.06)
    E, K, hw = _cam()
    rgb, _, _ = render_3dgs(g, E[None], K[None], hw)
    c = np.asarray(rgb)[0, 24, 32]
    assert c[1] > c[0]  # green wins


def test_offscreen_and_behind_are_culled():
    g = _gauss([[0.0, 0.0, -3.0], [100.0, 0.0, 5.0]],
               [[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]])
    E, K, hw = _cam()
    _, _, alpha = render_3dgs(g, E[None], K[None], hw)
    assert float(np.asarray(alpha).max()) < 1e-3


def test_sh_rotation_preserves_function():
    rng = np.random.default_rng(0)
    sh = jnp.asarray(rng.normal(size=(5, 9)).astype(np.float32))
    th = 0.7
    R = jnp.asarray(np.array([
        [np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]
    ], np.float32))
    sh_rot = rotate_sh(sh, R)
    dirs = rng.normal(size=(20, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    f_rot = jnp.einsum("nd,kd->nk", eval_sh_basis(jnp.asarray(dirs), 2), sh_rot)
    f_orig = jnp.einsum(
        "nd,kd->nk", eval_sh_basis(jnp.asarray(dirs) @ np.asarray(R), 2), sh
    )
    np.testing.assert_allclose(np.asarray(f_rot), np.asarray(f_orig), atol=1e-4)
