from recondet3d.ops.attention import attention_xla, flash_attention, multi_head_attention
from recondet3d.ops.ball_query import ball_query
from recondet3d.ops.grouping import gather_points, group_points, three_interpolate, three_nn
from recondet3d.ops.knn import knn
from recondet3d.ops.sampling import furthest_point_sample, furthest_point_sample_with_dist
from recondet3d.ops.scatter import DynamicScatter, dynamic_scatter
from recondet3d.ops.voxelize import (
    Voxelization,
    compute_grid_size,
    dynamic_voxelize,
    voxel_centers,
    voxelize,
)
