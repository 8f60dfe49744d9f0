from recondet3d.data.indoor.converter import (
    S3DIS_CLASSES,
    S3DISData,
    SCANNET_CLASSES,
    SUNRGBD_CLASSES,
    ScanNetData,
    SUNRGBDData,
    create_indoor_infos,
)
from recondet3d.data.indoor.dataset import (
    S3DISDataset,
    ScanNetDataset,
    SUNRGBDDataset,
    average_precision,
    indoor_eval,
)
