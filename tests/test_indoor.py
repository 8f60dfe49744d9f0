"""Indoor converters over synthetic ScanNet/SUN RGB-D/S3DIS layouts."""

import os
import pickle

import numpy as np
import pytest

from recondet3d.data.indoor import create_indoor_infos


def _write_scannet(root):
    inst = os.path.join(root, "scannet_instance_data")
    meta = os.path.join(root, "meta_data")
    os.makedirs(inst), os.makedirs(meta)
    rng = np.random.default_rng(0)
    for split, scans in (("train", ["scene0000_00"]), ("val", ["scene0001_00"]),
                         ("test", [])):
        with open(os.path.join(meta, f"scannetv2_{split}.txt"), "w") as f:
            f.write("\n".join(scans))
    for scan in ("scene0000_00", "scene0001_00"):
        n = 500
        np.save(os.path.join(inst, f"{scan}_vert.npy"),
                rng.normal(size=(n, 6)).astype(np.float32))
        np.save(os.path.join(inst, f"{scan}_ins_label.npy"),
                rng.integers(0, 4, n))
        np.save(os.path.join(inst, f"{scan}_sem_label.npy"),
                rng.integers(0, 40, n))
        boxes = np.zeros((2, 7))
        boxes[:, 3:6] = 1.0
        boxes[:, 6] = [4, 5]  # nyu40 ids: bed, chair
        np.save(os.path.join(inst, f"{scan}_aligned_bbox.npy"), boxes)
        np.save(os.path.join(inst, f"{scan}_unaligned_bbox.npy"), boxes)
        np.save(os.path.join(inst, f"{scan}_axis_align_matrix.npy"), np.eye(4))


def test_scannet_converter(tmp_path):
    root = str(tmp_path)
    _write_scannet(root)
    paths = create_indoor_infos("scannet", root)
    assert len(paths) == 3
    with open(paths[0], "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1
    a = infos[0]["annos"]
    assert a["gt_num"] == 2
    assert list(a["name"]) == ["bed", "chair"]
    assert os.path.exists(os.path.join(root, infos[0]["pts_path"]))
    pts = np.fromfile(os.path.join(root, infos[0]["pts_path"]), np.float32)
    assert pts.size == 500 * 6


def test_sunrgbd_converter(tmp_path):
    root = str(tmp_path)
    tv = os.path.join(root, "sunrgbd_trainval")
    for d in ("depth", "label", "calib", "image"):
        os.makedirs(os.path.join(tv, d))
    rng = np.random.default_rng(1)
    for split, ids in (("train", [1]), ("val", [2])):
        with open(os.path.join(tv, f"{split}_data_idx.txt"), "w") as f:
            f.write("\n".join(str(i) for i in ids))
    for i in (1, 2):
        np.save(os.path.join(tv, "depth", f"{i:06d}.npy"),
                rng.normal(size=(1000, 6)).astype(np.float32))
        with open(os.path.join(tv, "label", f"{i:06d}.txt"), "w") as f:
            f.write("bed 1 2 30 40 0.5 2.0 0.4 0.45 1.0 0.3 1.0 0.0\n")
            f.write("unknown_cls 1 2 3 4 0 0 0 1 1 1 1 0\n")
        with open(os.path.join(tv, "calib", f"{i:06d}.txt"), "w") as f:
            f.write(" ".join(["1", "0", "0", "0", "1", "0", "0", "0", "1"]) + "\n")
            f.write(" ".join(["500", "0", "0", "0", "500", "0", "320", "240", "1"]) + "\n")
    paths = create_indoor_infos("sunrgbd", root)
    with open(paths[0], "rb") as f:
        infos = pickle.load(f)
    a = infos[0]["annos"]
    assert a["gt_num"] == 1 and a["name"][0] == "bed"
    # dims doubled, yaw = -atan2(oy, ox) = 0
    np.testing.assert_allclose(a["dimensions"][0], [2.0, 0.9, 0.6])
    assert a["rotation_y"][0] == pytest.approx(0.0)
    assert infos[0]["calib"]["K"][0, 0] == 500.0


def test_s3dis_converter(tmp_path):
    root = str(tmp_path)
    d = os.path.join(root, "s3dis_data")
    os.makedirs(d)
    rng = np.random.default_rng(2)
    n = 300
    pts = rng.normal(size=(n, 6)).astype(np.float32)
    ins = np.zeros(n, np.int64)
    sem = np.zeros(n, np.int64)
    ins[:50] = 1
    sem[:50] = 8  # chair
    np.save(os.path.join(d, "Area_1_office_1_point.npy"), pts)
    np.save(os.path.join(d, "Area_1_office_1_ins_label.npy"), ins)
    np.save(os.path.join(d, "Area_1_office_1_sem_label.npy"), sem)
    paths = create_indoor_infos("s3dis", root)
    assert len(paths) == 1
    with open(paths[0], "rb") as f:
        infos = pickle.load(f)
    a = infos[0]["annos"]
    assert a["gt_num"] == 1 and a["name"][0] == "chair"
    # AABB of the instance points
    mn, mx = pts[:50, :3].min(0), pts[:50, :3].max(0)
    np.testing.assert_allclose(a["gt_boxes_upright_depth"][0, 3:6], mx - mn,
                               rtol=1e-6)


def test_scannet_dataset_and_indoor_eval(tmp_path):
    from recondet3d.data.indoor import ScanNetDataset

    root = str(tmp_path)
    _write_scannet(root)
    paths = create_indoor_infos("scannet", root)
    ds = ScanNetDataset(ann_file=paths[0], data_root=root)
    assert len(ds) == 1
    info = ds.get_data_info(0)
    assert os.path.exists(info["pts_filename"])
    ann = ds.get_ann_info(0)
    assert len(ann["gt_bboxes_3d"]) == 2

    # perfect predictions -> AP 1.0 at both thresholds
    results = [dict(
        boxes_3d=ann["gt_bboxes_3d"],
        labels_3d=ann["gt_labels_3d"],
        scores_3d=np.full(len(ann["gt_labels_3d"]), 0.9),
    )]
    m = ds.evaluate(results)
    assert m["mAP_0.25"] == pytest.approx(1.0)
    assert m["mAP_0.50"] == pytest.approx(1.0)

    # shifted predictions -> AP drops at 0.5
    shifted = ann["gt_bboxes_3d"].copy()
    shifted[:, 0] += 0.45  # dims are 1.0 cubes -> IoU ~0.38
    m2 = ds.evaluate([dict(boxes_3d=shifted, labels_3d=ann["gt_labels_3d"],
                           scores_3d=np.full(2, 0.9))])
    assert m2["mAP_0.25"] == pytest.approx(1.0)
    assert m2["mAP_0.50"] == 0.0
