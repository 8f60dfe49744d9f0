"""Refinement trunk tests: VFEs vs numpy, SparseEncoder/BEV U-Net shapes,
SparseRefinement end-to-end loss on a small grid."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recondet3d.models.refine import (
    BEVHeightOccupancy,
    SparseEncoder,
    SparseRefinement,
    hard_simple_vfe,
    soft_voxel_occupancy_vfe,
)


def test_hard_simple_vfe():
    voxels = np.zeros((2, 4, 3), np.float32)
    voxels[0, :2] = [[1, 2, 3], [3, 4, 5]]
    voxels[1, :1] = [[10, 0, 0]]
    out = np.asarray(hard_simple_vfe(jnp.asarray(voxels), jnp.asarray([2, 1])))
    np.testing.assert_allclose(out[0], [2, 3, 4])
    np.testing.assert_allclose(out[1], [10, 0, 0])


def test_soft_occupancy_vfe_matches_formula():
    rng = np.random.default_rng(0)
    voxels = rng.normal(size=(5, 10, 3)).astype(np.float32)
    nums = np.array([10, 3, 1, 0, 7], np.int32)
    out = np.asarray(soft_voxel_occupancy_vfe(jnp.asarray(voxels), jnp.asarray(nums)))
    for i, n in enumerate(nums):
        xyz = voxels[i, :n]
        if n > 0:
            mean = xyz.mean(0) * n / (n + 1e-6)
            diff = xyz - mean
            var = (diff ** 2).sum(0) / (n + 1e-6)
            var = var.mean()
        else:
            var = 0.0
        exp = 1 - np.exp(-0.3 * n - 5.0 * var)
        np.testing.assert_allclose(out[i, 0], exp, rtol=1e-4, atol=1e-5)


SMALL = dict(
    point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
    voxel_size=(0.1, 0.1, 0.1),  # grid 160x160x40
    max_voxels=2048,
    occ_feature_shape=(20, 20, 8),
    occ_max_voxels=1024,
    sparse_shape=(40, 160, 160),
    unet_channels=(64, 96, 128, 160),
    stage_caps=(2048, 1536, 1024, 512),
    encoder_out_channels=32,
)


@pytest.fixture(scope="module")
def refinement_setup():
    rng = np.random.default_rng(0)
    B, N, M = 2, 500, 400
    pts = rng.uniform(-7, 7, (B, N, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-1.8, 1.8, (B, N))
    gt = rng.uniform(-7, 7, (B, M, 3)).astype(np.float32)
    gt[..., 2] = rng.uniform(-1.8, 1.8, (B, M))
    model = SparseRefinement(**SMALL)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(pts), gt_points=jnp.asarray(gt),
        return_loss=True, train=False,
    )
    return model, params, pts, gt


def test_refinement_forward_and_loss(refinement_setup):
    model, params, pts, gt = refinement_setup
    refined, losses, aux = model.apply(
        params, jnp.asarray(pts), gt_points=jnp.asarray(gt),
        return_loss=True, train=False,
    )
    assert refined.shape == pts.shape
    assert aux["occupancy_logits"].shape == (2, 20, 20, 8)
    assert aux["gt_occupancy_map"].shape == (2, 20, 20, 8)
    loss = float(losses["loss_occupancy"])
    assert np.isfinite(loss) and loss > 0
    gtm = np.asarray(aux["gt_occupancy_map"])
    assert gtm.max() > 0.2  # soft occupancy populated
    assert gtm.min() == 0.0


def test_refinement_gradients_flow(refinement_setup):
    model, params, pts, gt = refinement_setup

    def loss_fn(p):
        _, losses, _ = model.apply(
            {"params": p, "batch_stats": params["batch_stats"]},
            jnp.asarray(pts), gt_points=jnp.asarray(gt),
            return_loss=True, train=False,
        )
        return losses["loss_occupancy"]

    g = jax.grad(loss_fn)(params["params"])
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(g)))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_sparse_encoder_shapes():
    # same z-chain as production ([41]->21->11->5->2), small y/x (32 -> 4)
    model = SparseEncoder(
        in_channels=3, sparse_shape=(41, 32, 32), output_channels=16,
        base_channels=4,
        encoder_channels=((4, 4, 8), (8, 8, 16), (16, 16, 16), (16, 16)),
        stage_caps=(256, 192, 128, 64),
    )
    coors = np.full((256, 4), -1, np.int32)
    rng = np.random.default_rng(1)
    n = 100
    coors[:n, 0] = rng.integers(0, 2, n)
    coors[:n, 1] = rng.integers(0, 41, n)
    coors[:n, 2] = rng.integers(0, 32, n)
    coors[:n, 3] = rng.integers(0, 32, n)
    feats = rng.normal(size=(256, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(coors), 2)
    out = model.apply(params, jnp.asarray(feats), jnp.asarray(coors), 2)
    # BEV: (B, Y/8, X/8, C*Z_out) = (2, 4, 4, 16*2)
    assert out.shape == (2, 4, 4, 32)


def test_bev_unet_shapes():
    model = BEVHeightOccupancy(
        in_channels=32, unet_channels=(32, 64, 96, 128), occ_feature_shape=(20, 20, 8)
    )
    x = jnp.ones((2, 20, 20, 32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 20, 20, 8)
    # fixed head: unbounded logits (the reference's ReLU'd-logits quirk is
    # opt-in — with it, BCE provably cannot push empty voxels below p=0.5)
    rng_x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 20, 20, 32)),
                        jnp.float32)
    out2 = model.apply(params, rng_x)
    assert float(out2.min()) < 0

    quirk = BEVHeightOccupancy(
        in_channels=32, unet_channels=(32, 64, 96, 128),
        occ_feature_shape=(20, 20, 8), bug_compatible_relu_logits=True,
    )
    p2 = quirk.init(jax.random.PRNGKey(0), rng_x)
    assert float(quirk.apply(p2, rng_x).min() ) >= 0
