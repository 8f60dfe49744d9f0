"""YAML preset registry (reference: depth_anything_3/registry.py:19-51 —
scans configs/*.yaml into a name -> path dict)."""

from __future__ import annotations

import glob
import os
from typing import Dict

__all__ = ["MODEL_REGISTRY", "get_all_models", "get_config_path", "build_from_yaml"]

_PRESET_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models", "da3", "presets",
)


def _scan() -> Dict[str, str]:
    return {
        os.path.splitext(os.path.basename(p))[0]: p
        for p in sorted(glob.glob(os.path.join(_PRESET_DIR, "*.yaml")))
    }


MODEL_REGISTRY: Dict[str, str] = _scan()


def get_all_models():
    return sorted(MODEL_REGISTRY)


def get_config_path(name: str) -> str:
    key = name.split("/")[-1].lower()
    if key not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {get_all_models()}")
    return MODEL_REGISTRY[key]


def build_from_yaml(name: str):
    """Instantiate an unbound DA3 model from its YAML preset."""
    from recondet3d.core.config import create_object, load_config

    return create_object(load_config(get_config_path(name)))
