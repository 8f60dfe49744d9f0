"""Host pipeline transforms over the synthetic nuScenes fixture."""

import os

import numpy as np
import pytest

from nuscenes_fixture import make_fixture
from recondet3d.data.nuscenes import NuScenesDataset, create_nuscenes_infos
from recondet3d.data.pipelines.transforms import (
    Collect3D,
    Compose,
    DefaultFormatBundle3D,
    GlobalRotScaleTrans,
    LoadAnnotations3D,
    LoadMultiViewImageFromFiles,
    LoadPointsFromFile,
    NormalizeMultiviewImage,
    ObjectNameFilter,
    PadMultiViewImage,
    PointsRangeFilter,
    RandomFlip3D,
    ScaleImageMultiViewImage,
)


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nusc_t"))
    make_fixture(root)
    create_nuscenes_infos(root, info_prefix="x", val_scene_names=[])
    ds = NuScenesDataset(ann_file=os.path.join(root, "x_infos_train.pkl"))
    return ds.get_data_info(0)


def test_train_pipeline(sample):
    pipe = Compose([
        LoadPointsFromFile(load_dim=5, use_dim=(0, 1, 2)),
        LoadAnnotations3D(),
        LoadMultiViewImageFromFiles(to_float32=True),
        PointsRangeFilter(point_cloud_range=(-54, -54, -5, 54, 54, 3)),
        ObjectNameFilter(classes=NuScenesDataset.CLASSES),
        DefaultFormatBundle3D(),
        Collect3D(keys=["points", "img", "gt_bboxes_3d", "gt_labels_3d"],
                  meta_keys=("lidar2img", "cam2lidar_rts", "img_shape")),
    ])
    out = pipe(dict(sample))
    assert out["img"].shape == (2, 90, 160, 3)
    assert out["points"].shape[1] == 3
    assert np.all(np.abs(out["points"][:, :2]) <= 54)
    assert len(out["img_metas"]["cam2lidar_rts"]) == 2
    assert len(out["gt_bboxes_3d"]) == len(out["gt_labels_3d"])


def test_geometry_transforms(sample):
    data = Compose([
        LoadPointsFromFile(load_dim=5, use_dim=(0, 1, 2)),
        LoadAnnotations3D(),
    ])(dict(sample))
    pts0 = data["points"].copy()
    box0 = data["gt_bboxes_3d"].tensor.copy()

    GlobalRotScaleTrans(rot_range=(0.5, 0.5), scale_ratio_range=(2.0, 2.0),
                        translation_std=(0, 0, 0))(data)
    # points rotated+scaled consistently with boxes
    c, s = np.cos(0.5), np.sin(0.5)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    np.testing.assert_allclose(data["points"][:, :3], pts0 @ R.T * 2, rtol=1e-5)
    np.testing.assert_allclose(
        data["gt_bboxes_3d"].center, box0[:, :3] @ R.T * 2, rtol=1e-5
    )
    np.testing.assert_allclose(data["gt_bboxes_3d"].dims, box0[:, 3:6] * 2, rtol=1e-6)

    flipped = RandomFlip3D(flip_ratio_bev_horizontal=1.0)(data)
    assert flipped["pcd_horizontal_flip"]


def test_image_aug3d_and_my_resize(sample):
    from recondet3d.data.pipelines.transforms import ImageAug3D, MyResize

    data = LoadMultiViewImageFromFiles(to_float32=True)(dict(sample))
    aug = ImageAug3D(final_dim=(48, 80), resize_lim=(0.6, 0.6),
                     rand_flip=True, is_train=True, seed=0)(data)
    assert all(i.shape[:2] == (48, 80) for i in aug["img"])
    assert len(aug["img_aug_matrix"]) == 2
    A = aug["img_aug_matrix"][0]
    assert A.shape == (3, 3) and abs(abs(A[0, 0]) - 0.6) < 1e-6

    data2 = LoadMultiViewImageFromFiles(to_float32=True)(dict(sample))
    r = MyResize(img_scale=(80, 45))(data2)
    assert r["img"][0].shape[:2] == (45, 80)


def test_image_transforms(sample):
    data = LoadMultiViewImageFromFiles(to_float32=True)(dict(sample))
    data = ScaleImageMultiViewImage(scales=0.5)(data)
    assert data["img"][0].shape[:2] == (45, 80)
    data = NormalizeMultiviewImage(mean=[123.675, 116.28, 103.53],
                                   std=[58.395, 57.12, 57.375])(data)
    data = PadMultiViewImage(size_divisor=32)(data)
    assert data["img"][0].shape[0] % 32 == 0
    assert data["img"][0].shape[1] % 32 == 0


def test_load_points_from_multi_sweeps(sample, tmp_path):
    from recondet3d.data.pipelines.transforms import (
        LoadPointsFromFile,
        LoadPointsFromMultiSweeps,
    )

    data = LoadPointsFromFile(load_dim=5, use_dim=(0, 1, 2, 3, 4))(dict(sample))
    n_key = len(data["points"])
    # synthesize one sweep file: identity transform, 1s older
    sweep_pts = np.zeros((10, 5), np.float32)
    sweep_pts[:, 0] = np.arange(10) + 100  # far in x
    p = tmp_path / "sweep.bin"
    sweep_pts.tofile(p)
    data["sweeps"] = [dict(
        data_path=str(p),
        sensor2lidar_rotation=np.eye(3),
        sensor2lidar_translation=np.array([1.0, 0, 0]),
        timestamp=(data["timestamp"] - 1.0) * 1e6,
    )]
    out = LoadPointsFromMultiSweeps(sweeps_num=10)(data)
    pts = out["points"]
    assert pts.shape == (n_key + 10, 4)  # use_dim (0,1,2,4)
    # key frame dt == 0; sweep dt == 1s; sweep translated +1 in x
    assert pts[:n_key, 3].max() == 0.0
    np.testing.assert_allclose(pts[n_key:, 3], 1.0, atol=1e-6)
    np.testing.assert_allclose(pts[n_key:, 0], np.arange(10) + 101)


def test_object_noise_moves_points_with_box():
    from recondet3d.data.pipelines.transforms import ObjectNoise

    rng = np.random.default_rng(0)
    box = np.array([[5.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    inside = rng.uniform(-0.8, 0.8, (50, 3)) + [5.0, 0.0, 1.0]
    outside = rng.uniform(-0.5, 0.5, (20, 3)) + [50.0, 50.0, 1.0]
    pts = np.concatenate([inside, outside]).astype(np.float32)
    results = dict(points=pts.copy(), gt_bboxes_3d=box.copy())
    out = ObjectNoise(translation_std=(1.0, 1.0, 0.0), seed=1)(results)
    new_box = out["gt_bboxes_3d"][0]
    delta = new_box[:3] - box[0, :3]
    assert np.abs(delta).max() > 1e-3  # actually moved
    # inside points moved coherently; outside untouched
    np.testing.assert_allclose(out["points"][50:], outside, atol=1e-6)
    moved = out["points"][:50] - inside
    assert np.abs(moved).max() > 1e-3
    # distances to box center preserved (rigid motion)
    d0 = np.linalg.norm(inside[:, :2] - box[0, :2], axis=1)
    d1 = np.linalg.norm(out["points"][:50, :2] - new_box[:2], axis=1)
    np.testing.assert_allclose(d0, d1, rtol=1e-4)


def test_multi_scale_flip_aug3d(sample):
    from recondet3d.data.pipelines.transforms import (
        LoadPointsFromFile,
        MultiScaleFlipAug3D,
        RandomFlip3D,
    )

    data = LoadPointsFromFile(load_dim=5, use_dim=(0, 1, 2))(dict(sample))
    tta = MultiScaleFlipAug3D(
        transforms=[RandomFlip3D(sync_2d=False)],
        img_scale=(1333, 800),
        flip=True,
        pcd_horizontal_flip=True,
    )
    out = tta(data)
    assert len(out["points"]) == 2  # no-flip + horizontal flip
    p0, p1 = out["points"]
    np.testing.assert_allclose(p1[:, 1], -p0[:, 1], atol=1e-6)
