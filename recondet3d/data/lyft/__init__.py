from recondet3d.data.lyft.converter import LYFT_CLASSES, create_lyft_infos
from recondet3d.data.lyft.dataset import LyftDataset, lyft_map
