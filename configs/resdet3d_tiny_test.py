"""Tiny ResDet3D config for CI / smoke training.

Same structure as resdet3d_nuscenes_mini.py (reference:
projects/configs/ResDet3D_nuscenes_mini_config.py) with every capacity
shrunk so the full config -> model -> train-step path runs on a CPU test
worker in seconds. Exercised by tests/test_configs.py.
"""

point_cloud_range = [-8.0, -8.0, -2.0, 8.0, 8.0, 2.0]
voxel_size = [0.1, 0.1, 0.1]

class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]

data_root = "data/nuscenes_mini/"

model = dict(
    type="ResDet3D",
    reconstruction_backbone=dict(
        type="ReconstructionBackbone",
        pretrained="da3-small",
        process_res=56,
        ref_view_strategy="first",
        use_ray_pose=False,
        max_depth=20.0,
        freeze_da3=True,
        filter_range=point_cloud_range,
        bq_anchor_points=128,
        bq_max_radius=0.5,
        bq_sample_num=8,
        num_points=256,
        gt_num_points=512,
        refinement=dict(
            type="SparseRefinement",
            point_cloud_range=point_cloud_range,
            voxel_size=voxel_size,
            max_voxels=1024,
            occ_max_voxels=512,
            occ_feature_shape=(20, 20, 8),
            sparse_shape=(40, 160, 160),
            unet_channels=(32, 48, 64, 96),
            stage_caps=(1024, 512, 384, 256),
            encoder_out_channels=16,
            loss_type="bce",
            occupancy_loss_weight=10.0,
        ),
    ),
)

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=1,
    train=dict(
        type="NuScenesDataset",
        ann_file=data_root + "tiny_infos_train.pkl",
        data_root=data_root,
        classes=class_names,
    ),
    test=dict(
        type="NuScenesDataset",
        ann_file=data_root + "tiny_infos_train.pkl",
        data_root=data_root,
        classes=class_names,
    ),
)

optimizer = dict(type="AdamW", lr=1e-3, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=100.0, norm_type=2))
total_epochs = 1
