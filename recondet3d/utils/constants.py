"""Framework-wide constants (reference: depth_anything_3/utils/constants.py)."""

# Minimum number of views before reference-view selection/reordering kicks in
# (reference: utils/constants.py:19 THRESH_FOR_REF_SELECTION = 3).
THRESH_FOR_REF_SELECTION = 3

# ImageNet normalization used by the input processor
# (reference: utils/io/input_processor.py).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# DA3 processing resolution (reference: reconstruction_backbone.py:554-555).
DEFAULT_PROCESS_RES = 504
PATCH_SIZE = 14
