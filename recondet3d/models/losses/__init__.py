from recondet3d.models.losses.occupancy_loss import OccupancyLoss
from recondet3d.models.losses.point_losses import (
    ColorLoss,
    EMDLoss,
    SimpleL2Loss,
    SmoothnessLoss,
    emd_loss,
)
