"""Waymo (KITTI-format) -> info-pkl converter.

The reference converts Waymo in two stages
(reference: tools/data_converter/waymo_converter.py Waymo2KITTI:23-369 —
TFRecords -> KITTI-format files via the waymo-open-dataset + tensorflow
readers; then kitti_converter.create_waymo_info_file:150-240 builds the
info pkls from that layout). The TFRecord stage needs packages absent
from this environment, so it is gated with a clear error; this module
implements the second stage over the extracted layout:

  root/ImageSets/{train,val,test}.txt
  root/training/{velodyne,calib,label_all,pose,image_0..4}/*

Waymo specifics vs KITTI: 6-feature lidar points (x y z intensity
elongation timestamp), per-frame ego pose, 5 cameras, labels already in
the label_all convention, and num_points_in_gt counted from the bins.
"""

from __future__ import annotations

import os
import pickle
from typing import List

import numpy as np

from recondet3d.data.kitti.converter import (
    camera_to_lidar_boxes,
    parse_calib,
    parse_label,
)

__all__ = ["create_waymo_infos", "convert_tfrecords"]

NUM_POINT_FEATURES = 6
N_CAMERAS = 5


def convert_tfrecords(*args, **kwargs):
    raise NotImplementedError(
        "Waymo TFRecord extraction requires the waymo-open-dataset and "
        "tensorflow packages (reference: waymo_converter.py Waymo2KITTI), "
        "which are not available in this environment. Extract to the "
        "KITTI-format layout elsewhere, then run create_waymo_infos() on it."
    )


def _count_points_in_boxes(lidar_path: str, gt_boxes: np.ndarray) -> np.ndarray:
    if not os.path.exists(lidar_path) or len(gt_boxes) == 0:
        return np.full(len(gt_boxes), -1)
    pts = np.fromfile(lidar_path, np.float32).reshape(-1, NUM_POINT_FEATURES)[:, :3]
    counts = []
    for b in gt_boxes:
        c, s = np.cos(b[6]), np.sin(b[6])
        px = pts[:, 0] - b[0]
        py = pts[:, 1] - b[1]
        lx = px * c + py * s
        ly = -px * s + py * c
        inside = (
            (np.abs(lx) <= b[3] / 2) & (np.abs(ly) <= b[4] / 2)
            & (pts[:, 2] >= b[2]) & (pts[:, 2] <= b[2] + b[5])
        )
        counts.append(int(inside.sum()))
    return np.asarray(counts)


def create_waymo_infos(
    root_path: str,
    info_prefix: str = "waymo",
    splits=("train", "val"),
    count_points: bool = True,
) -> List[str]:
    """(reference: kitti_converter.create_waymo_info_file:150-240)."""
    out_paths = []
    for split in splits:
        idx_file = os.path.join(root_path, "ImageSets", f"{split}.txt")
        if not os.path.exists(idx_file):
            continue
        with open(idx_file) as f:
            ids = [ln.strip() for ln in f if ln.strip()]
        infos = []
        for sid in ids:
            tdir = os.path.join(root_path, "training")
            calib = parse_calib(os.path.join(tdir, "calib", f"{sid}.txt"))
            label_path = os.path.join(tdir, "label_all", f"{sid}.txt")
            objs = parse_label(label_path) if os.path.exists(label_path) else []
            objs = [o for o in objs if o["name"] != "DontCare"]
            gt_boxes = camera_to_lidar_boxes(objs, calib)
            lidar_path = os.path.join(tdir, "velodyne", f"{sid}.bin")
            pose_path = os.path.join(tdir, "pose", f"{sid}.txt")
            pose = (
                np.loadtxt(pose_path).reshape(4, 4)
                if os.path.exists(pose_path) else np.eye(4)
            )
            npts = (
                _count_points_in_boxes(lidar_path, gt_boxes)
                if count_points else np.full(len(gt_boxes), -1)
            )
            infos.append(dict(
                token=sid,
                lidar_path=lidar_path,
                image_paths=[
                    os.path.join(tdir, f"image_{c}", f"{sid}.png")
                    for c in range(N_CAMERAS)
                ],
                calib=dict(calib),
                pose=pose,
                gt_boxes=gt_boxes,
                gt_names=np.array([o["name"] for o in objs]),
                gt_bboxes_2d=np.stack([o["bbox"] for o in objs])
                if objs else np.zeros((0, 4)),
                num_lidar_pts=npts,
                valid_flag=(npts != 0) if count_points
                else np.ones(len(gt_boxes), bool),
                num_point_features=NUM_POINT_FEATURES,
                timestamp=0,
                sweeps=[],
            ))
        path = os.path.join(root_path, f"{info_prefix}_infos_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump(
                dict(infos=infos, metadata=dict(version=f"waymo-{split}")), f
            )
        out_paths.append(path)
    return out_paths
