from recondet3d.models.detect.anchor3d_head import Anchor3DHead
from recondet3d.models.detect.centerhead import CenterHead
from recondet3d.models.detect.reconstruction_backbone import ReconstructionBackbone
from recondet3d.models.detect.resdet3d import ResDet3D
