"""SECOND/SECONDFPN/PointPillars/VFE stack: shapes + a full PointPillars
pseudo-image path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recondet3d.models.refine.second import (
    SECOND,
    SECONDFPN,
    DynamicVFE,
    HardVFE,
    PointPillarsScatter,
)
from recondet3d.ops.voxelize import dynamic_voxelize


def test_second_fpn_shapes():
    second = SECOND(in_channels=16, out_channels=(16, 32, 64),
                    layer_nums=(1, 1, 1), layer_strides=(2, 2, 2))
    x = jnp.ones((2, 32, 32, 16))
    params = second.init(jax.random.PRNGKey(0), x)
    feats = second.apply(params, x)
    assert [f.shape for f in feats] == [(2, 16, 16, 16), (2, 8, 8, 32), (2, 4, 4, 64)]

    fpn = SECONDFPN(in_channels=(16, 32, 64), out_channels=(16, 16, 16),
                    upsample_strides=(1, 2, 4))
    p2 = fpn.init(jax.random.PRNGKey(1), feats)
    out = fpn.apply(p2, feats)
    assert out.shape == (2, 16, 16, 48)


def test_pointpillars_path():
    pcr = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
    vs = (0.5, 0.5, 4.0)  # pillars: grid 32 x 32 x 1
    rng = np.random.default_rng(0)
    pts = np.column_stack([
        rng.uniform(0, 16, 500), rng.uniform(-8, 8, 500),
        rng.uniform(-3, 1, 500), rng.uniform(0, 1, 500),
    ]).astype(np.float32)
    coors = dynamic_voxelize(jnp.asarray(pts), point_cloud_range=pcr, voxel_size=vs)

    vfe = DynamicVFE(in_channels=4, feat_channels=(32,), voxel_size=vs,
                     point_cloud_range=pcr, max_voxels=512)
    params = vfe.init(jax.random.PRNGKey(0), jnp.asarray(pts), coors)
    vfeat, vcoors = vfe.apply(params, jnp.asarray(pts), coors)
    assert vfeat.shape == (512, 32)

    scatter = PointPillarsScatter(in_channels=32, output_shape=(32, 32))
    b = jnp.where(vcoors[:, 0] >= 0, 0, -1)[:, None]
    coors4 = jnp.concatenate([b, vcoors], axis=1)
    canvas = scatter(vfeat, coors4, batch_size=1)
    assert canvas.shape == (1, 32, 32, 32)
    assert float(jnp.abs(canvas).sum()) > 0


def test_hard_vfe():
    pcr = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
    vs = (0.5, 0.5, 4.0)
    rng = np.random.default_rng(1)
    voxels = rng.normal(size=(64, 8, 4)).astype(np.float32)
    nums = rng.integers(1, 8, 64)
    coors = np.zeros((64, 4), np.int32)
    coors[:, 2] = rng.integers(0, 32, 64)
    coors[:, 3] = rng.integers(0, 32, 64)
    vfe = HardVFE(in_channels=4, feat_channels=(16, 32), voxel_size=vs,
                  point_cloud_range=pcr)
    params = vfe.init(jax.random.PRNGKey(0), jnp.asarray(voxels),
                      jnp.asarray(nums), jnp.asarray(coors))
    out = vfe.apply(params, jnp.asarray(voxels), jnp.asarray(nums), jnp.asarray(coors))
    assert out.shape == (64, 32)
    assert np.all(np.isfinite(np.asarray(out)))
