"""Synthetic mini nuScenes fixture: writes the JSON tables + lidar bins +
jpeg images that the converter/dataset consume (structure per the public
nuScenes schema)."""

import json
import os

import numpy as np


def _quat_about_z(theta):
    return [float(np.cos(theta / 2)), 0.0, 0.0, float(np.sin(theta / 2))]


def make_fixture(root: str, n_scenes: int = 2, samples_per_scene: int = 2,
                 n_cams: int = 2, seed: int = 0, structured: bool = False,
                 all_classes: bool = False):
    """Write a synthetic v1.0-mini tree.

    ``structured=True`` swaps the uniform-noise geometry for a scene with
    learnable structure (the VERDICT round-1 ask): GT boxes sit at fixed
    lidar-frame positions inside ±8 m, and the lidar bins contain a ground
    plane plus dense point clusters inside each box — so occupancy has a
    real signal and a detection head can be trained to nonzero mAP on it.

    ``all_classes=True`` adds one GT object of each remaining detection
    class so every one of the 10 nuScenes classes carries GT — required by
    eval tests that assert a perfect mAP, because the devkit-exact
    evaluator scores zero-GT classes as AP 0 (devkit ``no_predictions``
    semantics; reference: mmdet3d nuscenes_dataset.py:443-489 -> devkit).
    """
    rng = np.random.default_rng(seed)
    version = "v1.0-mini"
    tdir = os.path.join(root, version)
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(os.path.join(root, "samples", "LIDAR_TOP"), exist_ok=True)

    cams = [f"CAM_{i}" for i in range(n_cams)]
    cams[0] = "CAM_FRONT"
    if n_cams > 1:
        cams[1] = "CAM_BACK"
    for c in cams:
        os.makedirs(os.path.join(root, "samples", c), exist_ok=True)

    tables = {k: [] for k in [
        "category", "attribute", "visibility", "instance", "sensor",
        "calibrated_sensor", "ego_pose", "log", "scene", "sample",
        "sample_data", "sample_annotation", "map",
    ]}

    category_names = [
        "vehicle.car", "human.pedestrian.adult", "movable_object.trafficcone",
    ] + ([n for n, _ in EXTRA_CLASS_OBJS] if all_classes else [])
    cat_tok = {}
    for ci, name in enumerate(category_names):
        cat_tok[name] = f"cat-{ci}"
        tables["category"].append(dict(token=f"cat-{ci}", name=name, description=""))
    tables["log"].append(dict(token="log-0", logfile="", vehicle="v", date_captured="", location="x"))

    tables["sensor"].append(dict(token="sens-lidar", channel="LIDAR_TOP", modality="lidar"))
    for c in cams:
        tables["sensor"].append(dict(token=f"sens-{c}", channel=c, modality="camera"))

    # calibrated sensors (fixed rig)
    tables["calibrated_sensor"].append(dict(
        token="cs-lidar", sensor_token="sens-lidar",
        translation=[0.9, 0.0, 1.8], rotation=_quat_about_z(0.0),
        camera_intrinsic=[],
    ))
    for i, c in enumerate(cams):
        K = [[400.0, 0.0, 80.0], [0.0, 400.0, 45.0], [0.0, 0.0, 1.0]]
        tables["calibrated_sensor"].append(dict(
            token=f"cs-{c}", sensor_token=f"sens-{c}",
            translation=[1.5 + 0.1 * i, 0.2 * i, 1.5],
            rotation=_quat_about_z(np.pi * i / n_cams),
            camera_intrinsic=K,
        ))

    ts = 1_000_000_000
    sample_count = 0
    for si in range(n_scenes):
        scene_token = f"scene-tok-{si}"
        first = last = None
        prev_sample = ""
        for sj in range(samples_per_scene):
            tok = f"samp-{si}-{sj}"
            if first is None:
                first = tok
            last = tok
            ts += 500000
            ego_t = [float(si * 100 + sj * 5), float(sj), 0.0]
            sample = dict(token=tok, timestamp=ts, scene_token=scene_token,
                          prev=prev_sample, next="", data={}, anns=[])
            if prev_sample:
                for s in tables["sample"]:
                    if s["token"] == prev_sample:
                        s["next"] = tok
            prev_sample = tok

            # ego poses + sample data
            pose_tok = f"pose-{tok}-lidar"
            tables["ego_pose"].append(dict(token=pose_tok, timestamp=ts,
                                           translation=ego_t, rotation=_quat_about_z(0.1 * sj)))
            lidar_file = f"samples/LIDAR_TOP/{tok}.pcd.bin"
            if structured:
                pts = _structured_lidar(rng, sj)
            else:
                pts = rng.uniform(-30, 30, (256, 5)).astype(np.float32)
            pts.tofile(os.path.join(root, lidar_file))
            sd_tok = f"sd-{tok}-lidar"
            tables["sample_data"].append(dict(
                token=sd_tok, sample_token=tok, ego_pose_token=pose_tok,
                calibrated_sensor_token="cs-lidar", timestamp=ts,
                fileformat="pcd.bin", is_key_frame=True, filename=lidar_file,
                prev="", next="", width=0, height=0,
            ))
            sample["data"]["LIDAR_TOP"] = sd_tok

            for c in cams:
                img_file = f"samples/{c}/{tok}.jpg"
                _write_jpeg(os.path.join(root, img_file),
                            rng.integers(0, 255, (90, 160, 3), np.uint8))
                pose_tok_c = f"pose-{tok}-{c}"
                tables["ego_pose"].append(dict(token=pose_tok_c, timestamp=ts + 1,
                                               translation=ego_t, rotation=_quat_about_z(0.1 * sj)))
                sdc = f"sd-{tok}-{c}"
                tables["sample_data"].append(dict(
                    token=sdc, sample_token=tok, ego_pose_token=pose_tok_c,
                    calibrated_sensor_token=f"cs-{c}", timestamp=ts + 1,
                    fileformat="jpg", is_key_frame=True, filename=img_file,
                    prev="", next="", width=160, height=90,
                ))
                sample["data"][c] = sdc

            # annotations: 8 objects / 3 classes when structured (VERDICT
            # r2 ask #7), one car + one pedestrian otherwise
            if structured:
                objs = [(name, list(size)) for _, _, _, _, size, name
                        in STRUCTURED_BOXES]
            else:
                objs = [("vehicle.car", [2.0, 4.5, 1.6]),
                        ("human.pedestrian.adult", [0.6, 0.6, 1.8])]
            if all_classes:
                objs = objs + [(n, list(s)) for n, s in EXTRA_CLASS_OBJS] + [
                    ("movable_object.trafficcone", [0.4, 0.4, 0.8])]
            for ai, (cat, size) in enumerate(objs):
                ann_tok = f"ann-{tok}-{ai}"
                inst_tok = f"inst-{si}-{ai}"
                if not any(i["token"] == inst_tok for i in tables["instance"]):
                    tables["instance"].append(dict(
                        token=inst_tok, category_token=cat_tok[cat],
                        nbr_annotations=samples_per_scene,
                        first_annotation_token="", last_annotation_token="",
                    ))
                if structured:
                    # fixed LIDAR-frame pose (see STRUCTURED_BOXES): global
                    # pose = ego2global o lidar2ego of that fixed pose, so
                    # the converter's global->lidar chain recovers it
                    # exactly for every sample — memorizable by a head.
                    cx, cy, cz, yaw, _, _ = STRUCTURED_BOXES[ai]
                    ego_off = np.array([cx + 0.9, cy, cz + 1.8])
                    th = 0.1 * sj
                    R = np.array([[np.cos(th), -np.sin(th), 0],
                                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
                    trans = (np.asarray(ego_t) + R @ ego_off).tolist()
                    rot = _quat_about_z(yaw + th)
                    npts = 100
                elif all_classes:
                    # keep every object inside the devkit per-class eval
                    # range (30 m for barrier/traffic_cone): <= ~25 m out
                    trans = [ego_t[0] + 8 + (ai % 5) * 4,
                             ego_t[1] + 2 + (ai // 5) * 3, 1.0]
                    rot = _quat_about_z(0.3 * ai)
                    npts = 10
                else:
                    trans = [ego_t[0] + 10 + ai * 5, ego_t[1] + 2, 1.0]
                    rot = _quat_about_z(0.3 * ai)
                    npts = 10
                tables["sample_annotation"].append(dict(
                    token=ann_tok, sample_token=tok, instance_token=inst_tok,
                    attribute_tokens=[], visibility_token="1",
                    translation=trans, size=size, rotation=rot,
                    num_lidar_pts=npts, num_radar_pts=0,
                    prev="", next="",
                ))
                sample["anns"].append(ann_tok)
            tables["sample"].append(sample)
            sample_count += 1
        tables["scene"].append(dict(
            token=scene_token, name=f"scene-{si:04d}", description="",
            log_token="log-0", nbr_samples=samples_per_scene,
            first_sample_token=first, last_sample_token=last,
        ))

    for name, rows in tables.items():
        with open(os.path.join(tdir, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    return root


# (raw category name, size) of one GT object per detection class not
# already covered by the default car+pedestrian pair — with the trafficcone
# appended in make_fixture, all_classes=True yields GT in all 10 classes
EXTRA_CLASS_OBJS = [
    ("vehicle.truck", [2.5, 7.0, 2.8]),
    ("vehicle.construction", [2.8, 6.5, 3.2]),
    ("vehicle.bus.rigid", [2.9, 11.0, 3.4]),
    ("vehicle.trailer", [2.9, 12.0, 3.8]),
    ("movable_object.barrier", [2.5, 0.5, 1.0]),
    ("vehicle.motorcycle", [0.8, 2.1, 1.5]),
    ("vehicle.bicycle", [0.6, 1.7, 1.3]),
]


# lidar-frame (cx, cy, cz, yaw, size[w,l,h], class) of the 8 structured
# GT objects (3 classes — VERDICT r2 ask #7); constant across samples
# (lidar rig is fixed relative to ego). The first two rows keep the
# round-1 2-object layout.
STRUCTURED_BOXES = [
    (3.1, 1.5, -1.3, 0.0, (2.0, 4.5, 1.6), "vehicle.car"),
    (5.6, 1.5, -1.3, 0.3, (0.6, 0.6, 1.8), "human.pedestrian.adult"),
    (-4.0, 3.0, -1.3, 1.2, (1.9, 4.2, 1.5), "vehicle.car"),
    (1.0, -5.0, -1.3, -0.7, (2.1, 4.8, 1.7), "vehicle.car"),
    (-2.5, -3.5, -1.0, 2.0, (0.7, 0.7, 1.7), "human.pedestrian.adult"),
    (-6.0, -1.0, -1.0, 0.0, (0.6, 0.6, 1.8), "human.pedestrian.adult"),
    (2.0, 4.5, -1.5, 0.0, (0.4, 0.4, 0.8), "movable_object.trafficcone"),
    (-1.5, 6.0, -1.5, 0.0, (0.4, 0.4, 0.8), "movable_object.trafficcone"),
]


def _structured_lidar(rng, sj, n_total: int = 3072):
    """Lidar-frame points: checkerboard ground patches at z=-1.8 + dense
    clusters inside each STRUCTURED_BOXES box (+ per-sample jitter via
    rng).

    The checkerboard (0.8 m cells, 50% coverage) tunes the occupancy
    class balance to the reference's measured production statistics —
    ~2,400 occupied of ~32,400 BEV cells per channel (~7.4%, reference:
    projects/mmdet3d_plugin/models/losses/occupancy_loss.py:15) — instead
    of a fully-occupied ground channel, so the fixture's loss trajectory
    is comparable to the reference's logged one
    (ANALYSIS_OCCUPANCY_TRAINING.md:6-9)."""
    parts = []
    n_box = 100
    for cx, cy, cz, yaw, (w, l, h), _ in STRUCTURED_BOXES:
        local = rng.uniform(-0.5, 0.5, (n_box, 3)) * np.array([l, w, h])
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        parts.append(local @ R.T + np.array([cx, cy, cz]))
    n_ground = n_total - sum(len(p) for p in parts)
    gx = rng.uniform(-8, 8, (4 * n_ground, 2))
    cell = np.floor((gx + 8.0) / 0.8).astype(np.int64)
    gx = gx[(cell[:, 0] + cell[:, 1]) % 2 == 0][:n_ground]
    gz = -1.8 + rng.normal(0, 0.02, (len(gx), 1))
    parts.append(np.concatenate([gx, gz], axis=1))
    xyz = np.concatenate(parts).astype(np.float32)
    extra = np.zeros((len(xyz), 2), np.float32)  # intensity, ring
    return np.concatenate([xyz, extra], axis=1)


def _write_jpeg(path, rgb):
    import cv2

    cv2.imwrite(path, rgb[..., ::-1])
