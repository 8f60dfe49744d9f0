from recondet3d.data.indoor.converter import (
    S3DIS_CLASSES,
    S3DISData,
    SCANNET_CLASSES,
    SUNRGBD_CLASSES,
    ScanNetData,
    SUNRGBDData,
    create_indoor_infos,
)
