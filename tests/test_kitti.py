"""KITTI converter over a synthetic fixture (calib/label/velodyne)."""

import os
import pickle

import numpy as np
import pytest

from recondet3d.data.kitti.converter import (
    camera_to_lidar_boxes,
    create_kitti_infos,
    parse_calib,
    parse_label,
)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    for sub in ("velodyne", "label_2", "calib", "image_2"):
        os.makedirs(root / "training" / sub, exist_ok=True)
    os.makedirs(root / "ImageSets", exist_ok=True)
    rng = np.random.default_rng(0)
    ids = ["000000", "000001"]
    for sid in ids:
        rng.normal(size=(128, 4)).astype(np.float32).tofile(
            str(root / "training" / "velodyne" / f"{sid}.bin")
        )
        with open(root / "training" / "calib" / f"{sid}.txt", "w") as f:
            P2 = "7.2e2 0 6.0e2 0 0 7.2e2 1.7e2 0 0 0 1 0"
            f.write(f"P0: {P2}\nP1: {P2}\nP2: {P2}\nP3: {P2}\n")
            f.write("R0_rect: 1 0 0 0 1 0 0 0 1\n")
            # velo->cam: x_cam = -y_velo, y_cam = -z_velo, z_cam = x_velo
            f.write("Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")
        with open(root / "training" / "label_2" / f"{sid}.txt", "w") as f:
            # Car at cam location (2, 1.5, 10), dims h=1.5 w=1.8 l=4.2, ry=0
            f.write("Car 0.0 0 0.0 500 150 560 200 1.5 1.8 4.2 2.0 1.5 10.0 0.0\n")
            f.write("DontCare -1 -1 -10 0 0 50 50 -1 -1 -1 -1000 -1000 -1000 -10\n")
    with open(root / "ImageSets" / "train.txt", "w") as f:
        f.write("\n".join(ids))
    with open(root / "ImageSets" / "val.txt", "w") as f:
        f.write(ids[1])
    return str(root)


def test_create_kitti_infos(kitti_root):
    paths = create_kitti_infos(kitti_root, info_prefix="kitti")
    with open(paths[0], "rb") as f:
        train = pickle.load(f)
    assert len(train["infos"]) == 2
    info = train["infos"][0]
    assert os.path.exists(info["lidar_path"])
    assert len(info["gt_boxes"]) == 1  # DontCare filtered
    box = info["gt_boxes"][0]
    # cam (2, 1.5, 10) -> velo (z_cam, -x_cam, -y_cam) = (10, -2, -1.5)
    np.testing.assert_allclose(box[:3], [10, -2, -1.5], atol=1e-6)
    np.testing.assert_allclose(box[3:6], [4.2, 1.8, 1.5], atol=1e-6)  # l w h
    assert info["gt_names"][0] == "Car"
