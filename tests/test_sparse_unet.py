"""SparseUNet: encoder-decoder over sparse voxels returns full-res
per-voxel features + a BEV map."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recondet3d.models.refine.sparse_unet import SparseUNet, _children_map
from recondet3d.ops.sparse_conv import SparseTensor


def test_children_map_inverse_of_downsample():
    # a coarse voxel's children must all map back within its field
    fine_coords = np.full((64, 4), -1, np.int32)
    pts = [(0, z, y, x) for z in range(4) for y in range(4) for x in range(4)]
    for i, c in enumerate(pts[:48]):
        fine_coords[i] = c
    fine = SparseTensor(jnp.zeros((64, 1)), jnp.asarray(fine_coords), (4, 4, 4), 1)
    coarse_coords = np.full((8, 4), -1, np.int32)
    coarse_coords[0] = (0, 1, 1, 1)
    coarse = SparseTensor(jnp.zeros((8, 1)), jnp.asarray(coarse_coords), (2, 2, 2), 1)
    rows = np.asarray(_children_map(coarse, fine))
    valid_rows = rows[0][rows[0] < 64]
    # children coords = 2*(1,1,1) + delta - 1 for delta in [0,3)^3
    for r in valid_rows:
        z, y, x = fine_coords[r][1:]
        assert 1 <= z <= 3 and 1 <= y <= 3 and 1 <= x <= 3


def test_sparse_unet_shapes():
    rng = np.random.default_rng(0)
    N = 512
    coords = np.full((N, 4), -1, np.int32)
    n = 400
    coords[:n, 0] = rng.integers(0, 2, n)
    coords[:n, 1] = rng.integers(0, 21, n)
    coords[:n, 2] = rng.integers(0, 32, n)
    coords[:n, 3] = rng.integers(0, 32, n)
    feats = rng.normal(size=(N, 4)).astype(np.float32)

    model = SparseUNet(
        in_channels=4, sparse_shape=(21, 32, 32), base_channels=8,
        output_channels=16,
        encoder_channels=((8,), (16, 16), (32, 32)),
        decoder_channels=((32, 32), (16, 16), (8, 8)),
        stage_caps=(512, 384, 256),
    )
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(coords), 2)
    seg, bev = model.apply(params, jnp.asarray(feats), jnp.asarray(coords), 2)
    assert seg.shape[0] == N  # full-res active set
    assert bev.ndim == 4 and bev.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(seg)))
    assert np.all(np.isfinite(np.asarray(bev)))
