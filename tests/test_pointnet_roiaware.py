"""PointNet++ modules, RoI-aware pooling, PAConv op."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recondet3d.models.refine.pointnet_modules import (
    PointFPModule,
    PointSAModule,
    PointSAModuleMSG,
)
from recondet3d.ops.paconv import assign_score_withk
from recondet3d.ops.roiaware_pool3d import roiaware_pool3d


def test_sa_msg_and_fp():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(256, 8)).astype(np.float32))
    sa = PointSAModuleMSG(num_point=64, radii=(0.5, 1.0), sample_nums=(8, 16),
                          mlp_channels=((16, 16), (16, 32)))
    params = sa.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, new_feats, idx = sa.apply(params, xyz, feats)
    assert new_xyz.shape == (64, 3) and new_feats.shape == (64, 48)

    fp = PointFPModule(mlp_channels=(24,))
    p2 = fp.init(jax.random.PRNGKey(1), xyz, new_xyz, feats, new_feats)
    up = fp.apply(p2, xyz, new_xyz, feats, new_feats)
    assert up.shape == (256, 24)
    assert np.all(np.isfinite(np.asarray(up)))


def test_roiaware_pool3d_max_and_avg():
    # a box at origin rotated 0; points with known cell placement
    rois = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    pts = jnp.asarray([
        [-0.9, -0.9, 0.1],   # cell (0, 0, 0)
        [0.9, 0.9, 1.9],     # cell (last, last, last)
        [5.0, 5.0, 5.0],     # outside
    ])
    feats = jnp.asarray([[1.0], [2.0], [99.0]])
    out = roiaware_pool3d(rois, pts, feats, out_size=(4, 4, 4), mode="max")
    assert out.shape == (1, 4, 4, 4, 1)
    o = np.asarray(out)[0, ..., 0]
    assert o[0, 0, 0] == 1.0
    assert o[3, 3, 3] == 2.0
    assert o.sum() == 3.0  # outside point never pooled

    avg = roiaware_pool3d(rois, pts, feats, out_size=(1, 1, 1), mode="avg")
    assert float(avg[0, 0, 0, 0, 0]) == pytest.approx(1.5)


def test_roiaware_rotation():
    rois = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, np.pi / 2]])
    # after 90deg rotation, the box's long (dx=4) axis lies along y
    pts = jnp.asarray([[0.0, 1.9, 1.0], [1.9, 0.0, 1.0]])
    feats = jnp.asarray([[1.0], [1.0]])
    out = np.asarray(roiaware_pool3d(rois, pts, feats, out_size=(2, 2, 2)))
    assert out.sum() == 1.0  # only the first point is inside


def test_assign_score_withk():
    rng = np.random.default_rng(1)
    N, K, M, C = 10, 4, 3, 8
    scores = jnp.asarray(rng.normal(size=(N, K, M)).astype(np.float32))
    pf = jnp.asarray(rng.normal(size=(N, M, C)).astype(np.float32))
    cf = jnp.asarray(rng.normal(size=(N, M, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (N, K)).astype(np.int32))
    out = assign_score_withk(scores, pf, cf, idx)
    assert out.shape == (N, K, C)
    # manual check for one element
    n, k = 2, 1
    exp = sum(
        np.asarray(scores)[n, k, m]
        * (np.asarray(pf)[np.asarray(idx)[n, k], m] - np.asarray(cf)[n, m])
        for m in range(M)
    )
    np.testing.assert_allclose(np.asarray(out)[n, k], exp, rtol=1e-5)
