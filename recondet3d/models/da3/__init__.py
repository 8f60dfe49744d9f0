from recondet3d.models.da3.cam import CameraDec, CameraEnc
from recondet3d.models.da3.dpt import DPT, DualDPT, GSDPT
from recondet3d.models.da3.gs_adapter import GaussianAdapter
from recondet3d.models.da3.net import DepthAnything3Net, NestedDepthAnything3Net
from recondet3d.models.da3.presets import MODEL_REGISTRY, PRESETS, build_da3
from recondet3d.models.da3.vit import DinoViT
