"""GT database creation + ObjectSample over the synthetic fixture."""

import os
import pickle

import numpy as np
import pytest

from nuscenes_fixture import make_fixture
from recondet3d.data.nuscenes import NuScenesDataset, create_nuscenes_infos
from recondet3d.data.nuscenes.gt_database import ObjectSample, create_groundtruth_database
from recondet3d.data.pipelines.transforms import (
    Compose,
    LoadAnnotations3D,
    LoadPointsFromFile,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nusc_db"))
    make_fixture(root)
    create_nuscenes_infos(root, info_prefix="x", val_scene_names=[])
    ds = NuScenesDataset(ann_file=os.path.join(root, "x_infos_train.pkl"))
    pkl = create_groundtruth_database(ds, root, info_prefix="x")
    return root, ds, pkl


def test_database_contents(setup):
    root, ds, pkl = setup
    with open(pkl, "rb") as f:
        db = pickle.load(f)
    assert "car" in db and "pedestrian" in db
    info = db["car"][0]
    assert os.path.exists(info["path"])
    assert info["box3d_lidar"].shape == (7,)


def test_object_sample(setup):
    root, ds, pkl = setup
    data = Compose([
        LoadPointsFromFile(load_dim=5, use_dim=(0, 1, 2)),
        LoadAnnotations3D(),
    ])(ds.get_data_info(0))
    n_boxes0 = len(data["gt_bboxes_3d"])
    n_pts0 = len(data["points"])
    sampler = ObjectSample(pkl, sample_groups=dict(car=5, pedestrian=5),
                           classes=list(ds.CLASSES), seed=1)
    out = sampler(data)
    assert len(out["gt_bboxes_3d"]) >= n_boxes0
    assert len(out["gt_labels_3d"]) == len(out["gt_bboxes_3d"])
    # fading disables it
    sampler.enabled = False
    out2 = sampler(dict(out))
    assert len(out2["gt_bboxes_3d"]) == len(out["gt_bboxes_3d"])
