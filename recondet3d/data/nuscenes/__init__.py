from recondet3d.data.nuscenes.converter import (
    CAM_TYPES,
    create_nuscenes_infos,
    obtain_sensor2top,
)
from recondet3d.data.nuscenes.dataset import CBGSDataset, NuScenesDataset
from recondet3d.data.nuscenes.tables import NuScenesTables, quat_wxyz_to_matrix
