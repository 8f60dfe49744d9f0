"""Golden tests for hard/dynamic voxelization against an independent numpy
reference implementing the documented contract of the reference CUDA op /
VoxelGenerator (first-appearance voxel order, per-voxel point cap,
zyx coors)."""

import numpy as np
import pytest

from recondet3d.ops import Voxelization, dynamic_voxelize, voxelize


def numpy_hard_voxelize(points, pcr, vs, max_pts, max_voxels):
    """Straightforward dict-based reference (matches VoxelGenerator semantics)."""
    pcr = np.asarray(pcr, np.float64)
    vs = np.asarray(vs, np.float64)
    grid = np.round((pcr[3:] - pcr[:3]) / vs).astype(np.int64)  # (X, Y, Z)
    vox = {}
    order = []
    for p in points:
        c = np.floor((p[:3] - pcr[:3]) / vs).astype(np.int64)
        if np.any(c < 0) or np.any(c >= grid):
            continue
        key = (int(c[2]), int(c[1]), int(c[0]))  # zyx
        if key not in vox:
            if len(vox) >= max_voxels:
                continue
            vox[key] = []
            order.append(key)
        if len(vox[key]) < max_pts:
            vox[key].append(p)
    M = len(order)
    C = points.shape[1]
    voxels = np.zeros((M, max_pts, C), points.dtype)
    coors = np.zeros((M, 3), np.int32)
    num = np.zeros((M,), np.int32)
    for i, key in enumerate(order):
        pts = vox[key]
        num[i] = len(pts)
        voxels[i, : len(pts)] = np.stack(pts)
        coors[i] = key
    return voxels, coors, num


PCR = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
VS = (0.5, 0.5, 0.5)


@pytest.mark.parametrize("seed,n", [(0, 500), (1, 2000)])
def test_hard_voxelize_matches_numpy(seed, n):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(-5, 75, n),
            rng.uniform(-45, 45, n),
            rng.uniform(-4, 2, n),
            rng.uniform(0, 1, n),
        ],
        axis=1,
    ).astype(np.float32)

    ref_vox, ref_coors, ref_num = numpy_hard_voxelize(pts, PCR, VS, 5, 4000)
    vox, coors, num, nv = voxelize(
        pts, point_cloud_range=PCR, voxel_size=VS, max_points=5, max_voxels=4000
    )
    nv = int(nv)
    assert nv == len(ref_coors)
    np.testing.assert_array_equal(np.asarray(coors)[:nv], ref_coors)
    np.testing.assert_array_equal(np.asarray(num)[:nv], ref_num)
    np.testing.assert_allclose(np.asarray(vox)[:nv], ref_vox, rtol=1e-6)
    # padding slots flagged with -1 coors
    assert np.all(np.asarray(coors)[nv:] == -1)


def test_max_points_cap():
    # 10 identical points, cap 3 -> one voxel with first 3 points
    pts = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (10, 1))
    pts = np.concatenate([pts, np.arange(10, dtype=np.float32)[:, None]], axis=1)
    vox, coors, num, nv = voxelize(
        pts, point_cloud_range=PCR, voxel_size=VS, max_points=3, max_voxels=10
    )
    assert int(nv) == 1
    assert int(num[0]) == 3
    np.testing.assert_array_equal(np.asarray(vox)[0, :, 3], [0, 1, 2])


def test_max_voxels_cap_appearance_order():
    # points in 5 distinct voxels, cap 3 -> first 3 by appearance survive
    pts = np.array(
        [[i * 1.0 + 0.1, 0.0, 0.0] for i in [4, 1, 3, 0, 2]], np.float32
    )
    vox, coors, num, nv = voxelize(
        pts, point_cloud_range=PCR, voxel_size=VS, max_points=2, max_voxels=3
    )
    assert int(nv) == 3
    got_x = np.asarray(coors)[:3, 2]
    np.testing.assert_array_equal(got_x, [8, 2, 6])  # voxels of x=4.1,1.1,3.1


def test_valid_mask_ignores_padding():
    pts = np.zeros((8, 3), np.float32)
    pts[:4] = [[1, 0, 0], [2, 0, 0], [3, 0, 0], [1, 0, 0]]
    mask = np.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    # padding rows are at origin (a valid cell!) but must be ignored
    pts[4:] = [5, 5, 0]
    vox, coors, num, nv = voxelize(
        pts, mask, point_cloud_range=PCR, voxel_size=VS, max_points=4, max_voxels=10
    )
    assert int(nv) == 3
    assert int(np.asarray(num)[:3].sum()) == 4


def test_dynamic_voxelize():
    pts = np.array([[1.0, 0.0, 0.0], [100.0, 0.0, 0.0], [0.26, -39.9, -2.9]], np.float32)
    coors = np.asarray(dynamic_voxelize(pts, point_cloud_range=PCR, voxel_size=VS))
    np.testing.assert_array_equal(coors[0], [6, 80, 2])
    np.testing.assert_array_equal(coors[1], [-1, -1, -1])  # out of range
    np.testing.assert_array_equal(coors[2], [0, 0, 0])


def test_voxelization_wrapper():
    layer = Voxelization(
        voxel_size=[0.075, 0.075, 0.2],
        point_cloud_range=[-54.0, -54.0, -5.0, 54.0, 54.0, 3.0],
        max_num_points=10,
        max_voxels=(120, 160),
    )
    assert layer.grid_size == (1440, 1440, 40)
    pts = np.random.default_rng(0).uniform(-50, 50, (100, 3)).astype(np.float32)
    pts[:, 2] = np.clip(pts[:, 2] / 20, -4.9, 2.9)
    vox, coors, num, nv = layer(pts, training=False)
    assert vox.shape == (160, 10, 3)
    assert int(nv) > 0


def test_voxel_generator_matches_device_voxelize():
    """The numpy VoxelGenerator agrees with the jitted voxelize op."""
    import numpy as np

    from recondet3d.ops.voxelize import VoxelGenerator, voxelize

    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, (500, 4)).astype(np.float32)
    gen = VoxelGenerator(voxel_size=(0.5, 0.5, 0.5),
                         point_cloud_range=(-2, -2, -2, 2, 2, 2),
                         max_num_points=5, max_voxels=128)
    v_np, c_np, n_np = gen.generate(pts)

    import jax.numpy as jnp
    v, c, n, nv = voxelize(
        jnp.asarray(pts), point_cloud_range=(-2, -2, -2, 2, 2, 2),
        voxel_size=(0.5, 0.5, 0.5), max_points=5, max_voxels=128,
    )
    m = int(nv)
    assert m == len(c_np)
    # same voxels in first-appearance order, same per-voxel counts
    np.testing.assert_array_equal(np.asarray(c)[:m], c_np)
    np.testing.assert_array_equal(np.asarray(n)[:m], n_np)
    np.testing.assert_allclose(np.asarray(v)[:m], v_np, atol=1e-6)
