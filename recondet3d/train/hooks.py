"""Training hooks: device-memory logging, occupancy debug dumps,
augmentation fading.

Re-implementations of (reference):
- ComponentMemoryLoggerHook (projects/mmdet3d_plugin/utils/
  memory_logger_hook.py:9-95 — per-component VRAM + iter peak in the
  train logs) -> HBM stats from jax device memory_stats per interval.
- SparseRefinement debug pickles (sparse_refinement.py:589-647 — pseudo/
  GT occupancy grids dumped every N iters, visualized by
  tools/vis_coord_features.py) -> OccupancyDebugHook.
- Fading (projects/mmdet3d_plugin/core/hook/fading.py:7 — drop the
  ObjectSample augmentation after epoch N) -> FadingHook flipping a flag
  on the dataset/pipeline.

Hooks are callables ``hook(step, state, metrics)`` invoked by the Trainer.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Callable, Optional

import numpy as np

from recondet3d.core.registry import HOOKS
from recondet3d.utils.logger import get_logger

logger = get_logger("recondet3d.hooks")

__all__ = ["DeviceMemoryLoggerHook", "OccupancyDebugHook", "FadingHook", "TimingHook"]


@HOOKS.register()
class DeviceMemoryLoggerHook:
    def __init__(self, interval: int = 1):
        self.interval = interval

    def __call__(self, step, state, metrics):
        if step % self.interval:
            return
        try:
            import jax

            stats = jax.local_devices()[0].memory_stats() or {}
            in_use = stats.get("bytes_in_use", 0) / 2 ** 30
            peak = stats.get("peak_bytes_in_use", 0) / 2 ** 30
            limit = stats.get("bytes_limit", 0) / 2 ** 30
            logger.info(
                f"step {step}: HBM {in_use:.2f} GiB in use "
                f"(peak {peak:.2f} / limit {limit:.2f})"
            )
        except Exception:  # noqa: BLE001
            pass


@HOOKS.register()
class OccupancyDebugHook:
    """Dump occupancy maps for offline visualization every N iters
    (consumed by recondet3d.cli.vis_occupancy, the vis_coord_features
    equivalent). The trainer must put 'occupancy_logits' /
    'gt_occupancy_map' into metrics-aux via ``aux_fn``."""

    def __init__(self, out_dir: str, interval: int = 10,
                 aux_fn: Optional[Callable] = None,
                 voxel_size=(0.075, 0.075, 0.2),
                 point_cloud_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)):
        self.out_dir = out_dir
        self.interval = interval
        self.aux_fn = aux_fn
        self.voxel_size = list(voxel_size)
        self.point_cloud_range = list(point_cloud_range)
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, step, state, metrics):
        if step % self.interval or self.aux_fn is None:
            return
        aux = self.aux_fn()
        if not aux:
            return

        def sigmoid(x):
            return 1 / (1 + np.exp(-np.asarray(x, np.float64)))

        data = {
            "pseudo_occupancy_map": sigmoid(aux["occupancy_logits"])
            if "occupancy_logits" in aux else None,
            "gt_occupancy_map": np.asarray(aux["gt_occupancy_map"])
            if "gt_occupancy_map" in aux else None,
            "pseudo_coors": np.asarray(aux["pseudo_coors"])
            if "pseudo_coors" in aux else None,
            "voxel_size": self.voxel_size,
            "point_cloud_range": self.point_cloud_range,
            "step": step,
        }
        path = os.path.join(self.out_dir, f"debug_iter_{step:06d}.pkl")
        with open(path, "wb") as f:
            pickle.dump(data, f)


@HOOKS.register()
class FadingHook:
    """Disable an augmentation after a given step (reference Fading hook
    drops ObjectSample after epoch N)."""

    def __init__(self, target, attr: str = "enabled", after_step: int = 0):
        self.target = target
        self.attr = attr
        self.after_step = after_step
        self._done = False

    def __call__(self, step, state, metrics):
        if not self._done and step >= self.after_step:
            setattr(self.target, self.attr, False)
            self._done = True
            logger.info(f"fading: disabled {type(self.target).__name__}.{self.attr} "
                        f"at step {step}")


@HOOKS.register()
class TimingHook:
    """Per-stage wall-clock logging (the reference wraps preprocess/
    forward/export in time.time() prints, api.py:301-438)."""

    def __init__(self, interval: int = 10):
        self.interval = interval
        self._last = time.time()
        self._steps = 0

    def __call__(self, step, state, metrics):
        self._steps += 1
        if self._steps % self.interval == 0:
            now = time.time()
            logger.info(
                f"step {step}: {self.interval / (now - self._last):.2f} steps/s"
            )
            self._last = now
