"""Ray-pose recovery: synthesize camrays from a known camera, recover
R / focal / principal point / T."""

import numpy as np
import pytest

import jax.numpy as jnp

from recondet3d.utils.ray_utils import camray_to_caminfo, get_extrinsic_from_camray


def _make_camrays(R, f, pp, T, h=24, w=32):
    """Generate the ray field for the fitting model A = R @ L (L lower
    triangular in the identity frame; focal = 1/L_diag, pp = L[2,:2]+1 —
    reference: ray_utils.py ql_decomposition usage)."""
    xs = (np.arange(w) + 0.5) * (2.0 / w) - 1.0
    ys = (np.arange(h) + 0.5) * (2.0 / h) - 1.0
    xg, yg = np.meshgrid(xs, ys, indexing="xy")
    origin = np.stack([xg, yg, np.ones_like(xg)], -1).reshape(-1, 3)
    L = np.array([
        [1 / f[0], 0.0, 0.0],
        [0.0, 1 / f[1], 0.0],
        [pp[0] - 1.0, pp[1] - 1.0, 1.0],
    ])
    dirs = origin @ (R @ L).T
    rays = np.concatenate([dirs, np.tile(T, (len(dirs), 1))], axis=1)
    return rays.reshape(1, 1, h, w, 6).astype(np.float32)


def _rot(axis, theta):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K


@pytest.mark.parametrize("theta", [0.0, 0.2, -0.35])
def test_recover_rotation_and_intrinsics(theta):
    R = _rot([0.3, 1.0, 0.2], theta)
    f = (0.8, 1.1)
    pp = (1.05, 0.95)
    T = np.array([0.3, -0.2, 1.4])
    rays = _make_camrays(R, f, pp, T)
    Rr, Tr, fr, ppr = camray_to_caminfo(jnp.asarray(rays))
    np.testing.assert_allclose(np.asarray(Rr)[0, 0], R, atol=5e-3)
    np.testing.assert_allclose(np.asarray(Tr)[0, 0], T, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fr)[0, 0], f, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(ppr)[0, 0], pp, atol=5e-3)


def test_ransac_rejects_outliers():
    R = _rot([0, 0, 1.0], 0.3)
    rays = _make_camrays(R, (1.0, 1.0), (1.0, 1.0), np.zeros(3))
    rng = np.random.default_rng(0)
    noisy = rays.copy()
    # corrupt 15% of rays badly, give them lower confidence
    n = noisy.shape[2] * noisy.shape[3]
    conf = np.ones((1, 1, noisy.shape[2], noisy.shape[3]), np.float32)
    idx = rng.choice(n, n * 15 // 100, replace=False)
    flat = noisy.reshape(1, 1, -1, 6)
    flat[0, 0, idx, :3] += rng.normal(scale=2.0, size=(len(idx), 3))
    conf.reshape(1, 1, -1)[0, 0, idx] = 0.2
    Rr, _, _, _ = camray_to_caminfo(jnp.asarray(noisy), jnp.asarray(conf))
    np.testing.assert_allclose(np.asarray(Rr)[0, 0], R, atol=2e-2)


def test_get_extrinsic_shape():
    rays = _make_camrays(np.eye(3), (1.0, 1.0), (1.0, 1.0), np.array([1.0, 2, 3]))
    conf = jnp.ones((1, 1, 24, 32, 1))
    ext, focal, pp = get_extrinsic_from_camray(jnp.asarray(rays), conf)
    assert ext.shape == (1, 1, 4, 4)
    np.testing.assert_allclose(np.asarray(ext)[0, 0, 3], [0, 0, 0, 1])
    np.testing.assert_allclose(np.asarray(ext)[0, 0, :3, 3], [1, 2, 3], atol=1e-5)
