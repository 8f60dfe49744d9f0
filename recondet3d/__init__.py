"""recondet3d — TPU-native 3D reconstruction + detection framework.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of
hiepbk/3D-Reconstruction-Detection (Depth Anything 3 multi-view depth +
ResDet3D pseudo-LiDAR occupancy refinement on nuScenes), designed for TPU:

- All compute-path kernels are jitted JAX / Pallas with static shapes.
- Scaling is expressed through ``jax.sharding.Mesh`` + ``pjit`` (no process
  groups, no scatter wrappers).
- The model family lives in ``recondet3d.models`` (flax.linen), ops in
  ``recondet3d.ops``, data machinery in ``recondet3d.data``, and the
  DepthAnything3-compatible public API in ``recondet3d.api``.
"""

from recondet3d.version import __version__

__all__ = ["__version__"]
