"""ResDet3D + CenterPoint head (detection training enabled).

The reference leaves its detection head scaffolded (pts_bbox_head=None,
TransFusion assigner/coder registered but unwired); this config enables
the recondet3d CenterHead on the refinement trunk's BEV features.
"""

_base = dict()
exec(open(__file__.replace("resdet3d_centerhead.py",
                           "resdet3d_nuscenes_mini.py")).read())  # noqa: S102

model["pts_bbox_head"] = dict(  # noqa: F821
    type="CenterHead",
    in_channels=256,
    point_cloud_range=point_cloud_range,  # noqa: F821
    voxel_size=voxel_size,  # noqa: F821
    out_size_factor=out_size_factor,  # noqa: F821
    tasks=[
        ["car"], ["truck", "construction_vehicle"], ["bus", "trailer"],
        ["barrier"], ["motorcycle", "bicycle"], ["pedestrian", "traffic_cone"],
    ],
    max_objs=500,
    loss_cls_weight=1.0,
    loss_bbox_weight=0.25,
    code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2],
)
work_dir = "work_dirs/resdet3d_centerhead"
