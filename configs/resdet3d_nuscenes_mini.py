"""ResDet3D nuScenes-mini training config.

Mirrors the reference config surface
(reference: projects/configs/ResDet3D_nuscenes_mini_config.py) on the
recondet3d stack: DA3 nested-giant backbone (frozen), ball-query/FPS
point pipeline (25k anchors / 40k points), 0.075m voxels over +-54m,
SECOND-style sparse encoder, BEV occupancy U-Net with BCE(x10), AdamW
1e-3 + cyclic LR/momentum, grad clip 100.
"""

point_cloud_range = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
voxel_size = [0.075, 0.075, 0.2]
out_size_factor = 8

class_names = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]

data_root = "data/nuscenes_mini/"

model = dict(
    type="ResDet3D",
    reconstruction_backbone=dict(
        type="ReconstructionBackbone",
        pretrained="depth-anything/DA3NESTED-GIANT-LARGE",
        cache_dir="ckpts",
        process_res=504,
        ref_view_strategy="saddle_balanced",
        use_ray_pose=False,
        max_depth=100.0,
        freeze_da3=True,
        # point pipeline (reference rescon_pipeline)
        filter_range=[-54.0, -54.0, -5.0, 54.0, 54.0, 6.0],
        bq_anchor_points=25000,
        bq_max_radius=0.5,
        bq_sample_num=16,
        num_points=40000,
        refinement=dict(
            type="SparseRefinement",
            point_cloud_range=point_cloud_range,
            voxel_size=voxel_size,
            max_voxels=40960,
            occ_feature_shape=[180, 180, 32],
            occ_max_voxels=65536,
            sparse_shape=[41, 1440, 1440],
            unet_channels=[256, 512, 1024, 2048],
            stage_caps=[40960, 32768, 24576, 16384],
            loss_type="bce",
            occupancy_loss_weight=10.0,
        ),
    ),
    pts_bbox_head=None,  # scaffolded like the reference; see centerhead config
)

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=2,
    train=dict(
        type="CBGSDataset",
        dataset=dict(
            type="NuScenesDataset",
            data_root=data_root,
            ann_file=data_root + "nuscenes_mini_infos_train.pkl",
            load_interval=1,
            classes=class_names,
            test_mode=False,
        ),
    ),
    val=dict(
        type="NuScenesDataset",
        data_root=data_root,
        ann_file=data_root + "nuscenes_mini_infos_val.pkl",
        classes=class_names,
        test_mode=True,
    ),
    test=dict(
        type="NuScenesDataset",
        data_root=data_root,
        ann_file=data_root + "nuscenes_mini_infos_val.pkl",
        classes=class_names,
        test_mode=True,
    ),
)

optimizer = dict(type="AdamW", lr=1e-3, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=100.0, norm_type=2))
lr_config = dict(policy="cyclic", target_ratio=(10, 1e-4), cyclic_times=1,
                 step_ratio_up=0.4)
momentum_config = dict(policy="cyclic", target_ratio=(0.8947368421052632, 1),
                       cyclic_times=1, step_ratio_up=0.4)
total_epochs = 8
checkpoint_config = dict(interval=1)
log_config = dict(interval=1)
work_dir = "work_dirs/resdet3d_nuscenes_mini"
