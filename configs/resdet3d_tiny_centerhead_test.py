"""Tiny ResDet3D + CenterHead config for CI (detection eval path).

Extends resdet3d_tiny_test.py the same way resdet3d_centerhead.py extends
the mini config."""

exec(open(__file__.replace("resdet3d_tiny_centerhead_test.py",
                           "resdet3d_tiny_test.py")).read())  # noqa: S102

model["pts_bbox_head"] = dict(  # noqa: F821
    type="CenterHead",
    in_channels=32,
    share_ch=16,
    point_cloud_range=point_cloud_range,  # noqa: F821
    voxel_size=voxel_size,  # noqa: F821
    out_size_factor=8,
    tasks=[["car"], ["pedestrian", "traffic_cone"]],
    max_objs=32,
)
