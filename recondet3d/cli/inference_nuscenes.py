"""Per-sample DA3 inference over raw nuScenes with GT-extrinsics fusion.

Re-implementation of the *intended* behavior of the reference script
(reference: tools/inference_nuscenes.py:33-1090 — iterate nusc.sample,
pull the 6 camera images, run DepthAnything3.inference, unproject with
predicted intrinsics, fuse into the LiDAR frame via the GT cam2lidar
chain, voxel/ball-query/FPS downsample, save/visualize; the snapshot has
an IndentationError at :700 and imports a missing module, so the behavior
here follows the evident intent).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

CAM_TYPES = [
    "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
    "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DA3 inference over raw nuScenes")
    p.add_argument("--dataroot", required=True)
    p.add_argument("--version", default="v1.0-mini")
    p.add_argument("--model", default="depth-anything/DA3NESTED-GIANT-LARGE")
    p.add_argument("--cache-dir", default="ckpts")
    p.add_argument("--out-dir", default="output")
    p.add_argument("--max-samples", type=int, default=1)
    p.add_argument("--max-depth", type=float, default=100.0)
    p.add_argument("--conf-thresh-percentile", type=float, default=30.0)
    p.add_argument("--num-points", type=int, default=40000)
    p.add_argument("--anchor-points", type=int, default=25000)
    p.add_argument("--voxel-size", type=float, default=0.1)
    p.add_argument("--process-res", type=int, default=504)
    return p.parse_args(argv)


def get_nusc_info(nusc, sample):
    """Per-camera cam2lidar R/t via the sensor2top chain
    (reference: inference_nuscenes.py:33-95 get_nusc_info)."""
    from recondet3d.data.nuscenes.converter import obtain_sensor2top
    from recondet3d.data.nuscenes.tables import quat_wxyz_to_matrix

    lidar_sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
    cs = nusc.get("calibrated_sensor", lidar_sd["calibrated_sensor_token"])
    pose = nusc.get("ego_pose", lidar_sd["ego_pose_token"])
    l2e_r = quat_wxyz_to_matrix(cs["rotation"])
    l2e_t = np.asarray(cs["translation"])
    e2g_r = quat_wxyz_to_matrix(pose["rotation"])
    e2g_t = np.asarray(pose["translation"])
    info = {}
    for cam in CAM_TYPES:
        if cam not in sample["data"]:
            continue
        info[cam] = obtain_sensor2top(
            nusc, sample["data"][cam], l2e_t, l2e_r, e2g_t, e2g_r, cam
        )
    return info


def run_inference_for_frame(model, cam_infos, args):
    """DA3 on the 6 camera images -> fused LiDAR-frame point cloud
    (reference: inference_nuscenes.py:658-856 run_inference_for_frame +
    load_point_cloud_from_prediction)."""
    import jax.numpy as jnp

    from recondet3d.data.pipelines.point_pipeline import PointPipeline

    paths = [cam_infos[c]["data_path"] for c in CAM_TYPES if c in cam_infos]
    pred = model.inference(paths, process_res=args.process_res)

    all_pts = []
    N, H, W = pred.depth.shape
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    for i, cam in enumerate([c for c in CAM_TYPES if c in cam_infos]):
        z = pred.depth[i]
        K = pred.intrinsics[i]
        x = (uu - K[0, 2]) * z / K[0, 0]
        y = (vv - K[1, 2]) * z / K[1, 1]
        pts = np.stack([x, y, z], -1).reshape(-1, 3)
        valid = (z > 0).reshape(-1) & (z <= args.max_depth).reshape(-1)
        if pred.conf is not None:
            thr = np.percentile(pred.conf[i], args.conf_thresh_percentile)
            valid &= (pred.conf[i] >= thr).reshape(-1)
        if pred.sky is not None:
            valid &= ~pred.sky[i].reshape(-1)
        pts = pts[valid]
        A = np.asarray(cam_infos[cam]["sensor2lidar_rotation"])
        t = np.asarray(cam_infos[cam]["sensor2lidar_translation"])
        all_pts.append(pts @ A.T + t)
    pts = np.concatenate(all_pts).astype(np.float32)

    # pad to a static cap for the jitted pipeline
    cap = 1 << int(np.ceil(np.log2(max(len(pts), 1))))
    buf = np.zeros((cap, 3), np.float32)
    buf[: len(pts)] = pts
    valid = np.arange(cap) < len(pts)
    pipeline = PointPipeline([
        dict(type="VoxelDownsample", voxel_size=(args.voxel_size,) * 3,
             point_cloud_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 6.0),
             max_voxels=min(cap, 1 << 18)),
        dict(type="BallQueryDownsample", anchor_points=args.anchor_points,
             max_radius=0.5, sample_num=16),
        dict(type="FPSDownsample", num_points=args.num_points),
    ])
    out, msk = pipeline(jnp.asarray(buf), jnp.asarray(valid))
    return np.asarray(out)[np.asarray(msk)]


def main(argv=None):
    from recondet3d.api import DepthAnything3
    from recondet3d.data.export import write_pcd
    from recondet3d.data.nuscenes import NuScenesTables

    args = parse_args(argv)
    nusc = NuScenesTables(args.version, args.dataroot)
    model = DepthAnything3.from_pretrained(args.model, cache_dir=args.cache_dir)
    os.makedirs(args.out_dir, exist_ok=True)

    for i, sample in enumerate(nusc.sample):
        if i >= args.max_samples:
            break
        cam_infos = get_nusc_info(nusc, sample)
        pts = run_inference_for_frame(model, cam_infos, args)
        path = os.path.join(args.out_dir, f"sample_{i}_points.pcd")
        write_pcd(path, pts)
        print(f"wrote {path} ({len(pts)} points)", flush=True)
    return 0


if __name__ == "__main__":
    main()
