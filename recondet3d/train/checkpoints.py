"""Checkpoint save/load via orbax.

Replaces the mmcv CheckpointHook machinery (reference:
ResDet3D_nuscenes_mini_config.py:372 checkpoint_config interval=1;
tools/train_mmdet3d.py:183-184 --resume-from, :280-290 meta embedding).
Checkpoints carry step/params/batch_stats/opt_state plus a meta dict with
framework version + config text, like the reference embeds.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


def _ckpt_dir(work_dir: str) -> str:
    d = os.path.join(os.path.abspath(work_dir), "checkpoints")
    os.makedirs(d, exist_ok=True)
    return d


def save_checkpoint(work_dir: str, state, meta: Optional[dict] = None) -> str:
    import orbax.checkpoint as ocp

    from recondet3d.version import __version__

    step = int(state.step)
    path = os.path.join(_ckpt_dir(work_dir), f"step_{step:08d}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    meta = dict(meta or {})
    meta.update(version=__version__, step=step)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)
    return path


def latest_checkpoint(work_dir: str) -> Optional[str]:
    d = _ckpt_dir(work_dir)
    steps = sorted(
        p for p in os.listdir(d) if p.startswith("step_") and not p.endswith(".json")
    )
    return os.path.join(d, steps[-1]) if steps else None


def load_checkpoint(path: str, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)
