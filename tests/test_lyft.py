"""Lyft converter/dataset over a synthetic lyft-layout fixture, plus the
kaggle IoU-mAP metric."""

import json
import os
import shutil

import numpy as np
import pytest

from nuscenes_fixture import make_fixture
from recondet3d.data.lyft import LyftDataset, create_lyft_infos, lyft_map


@pytest.fixture(scope="module")
def lyft_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lyft"))
    inner = os.path.join(root, "v1.01-train")
    make_fixture(inner)
    # lyft layout: tables at root/version/version, lyft flat class names
    shutil.move(os.path.join(inner, "v1.0-mini"),
                os.path.join(inner, "v1.01-train"))
    cat_path = os.path.join(inner, "v1.01-train", "category.json")
    with open(cat_path) as f:
        cats = json.load(f)
    renames = {"vehicle.car": "car", "human.pedestrian.adult": "pedestrian"}
    for c in cats:
        c["name"] = renames.get(c["name"], c["name"])
    with open(cat_path, "w") as f:
        json.dump(cats, f)
    return root


def test_create_lyft_infos_and_dataset(lyft_root):
    train_p, val_p = create_lyft_infos(
        lyft_root, info_prefix="lf", val_scene_names=["scene-0001"]
    )
    assert os.path.exists(train_p) and os.path.exists(val_p)
    ds = LyftDataset(ann_file=train_p)
    assert len(ds) > 0
    info = ds.get_data_info(0)
    assert os.path.exists(info["pts_filename"])
    ann = ds.get_ann_info(0)
    assert ann["gt_bboxes_3d"].shape[1] == 7  # no velocity
    names = set(np.asarray(ds.data_infos[0]["gt_names"]).tolist())
    assert names <= set(LyftDataset.CLASSES)


def test_lyft_map_perfect_and_miss():
    gt = {
        "s0": {"boxes": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
               "names": np.array(["car"])},
    }
    perfect = {"s0": [(np.array([0, 0, 0, 4, 2, 1.5, 0.0], np.float32), 0.9, "car")]}
    aps, overall = lyft_map(gt, perfect, class_names=("car",))
    assert overall == pytest.approx(1.0)

    shifted = {"s0": [(np.array([3.0, 0, 0, 4, 2, 1.5, 0.0], np.float32), 0.9, "car")]}
    _, overall2 = lyft_map(gt, shifted, class_names=("car",))
    assert overall2 < 0.1
