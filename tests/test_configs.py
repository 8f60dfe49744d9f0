"""Config-drift tests: build every shipped config and run the train CLI
end to end on the nuScenes fixture (the reference's test strategy builds
all configs in tests/test_runtime/test_config.py and smoke-tests the
train API; reference: mmdetection3d/tests/test_runtime/)."""

import glob
import os
import sys

import numpy as np
import pytest

from nuscenes_fixture import make_fixture
from recondet3d.cli.train import build_model_from_cfg, main as train_main
from recondet3d.core.config import load_py_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.py")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds_model(path):
    cfg = load_py_config(path)
    model = build_model_from_cfg(cfg)
    rb = cfg["model"]["reconstruction_backbone"]
    bk = model.reconstruction_backbone
    # the config surface must actually reach the modules (drift guard)
    if "process_res" in rb:
        assert bk.process_res == int(rb["process_res"])
    if "bq_anchor_points" in rb:
        assert bk.bq_anchor_points == int(rb["bq_anchor_points"])
    if "filter_range" in rb:
        assert tuple(bk.filter_range) == tuple(rb["filter_range"])
    ref = rb.get("refinement", {})
    if "stage_caps" in ref:
        assert tuple(bk.refinement.stage_caps) == tuple(ref["stage_caps"])
    if "occ_feature_shape" in ref:
        assert tuple(bk.refinement.occ_feature_shape) == tuple(
            ref["occ_feature_shape"]
        )


def test_train_cli_end_to_end(tmp_path):
    """Two optimizer steps of the tiny config on the fixture dataset via
    the real CLI: config load, model build, dataset + host loader (native
    prefetch when available), trainer, checkpoint save."""
    root = str(tmp_path / "nusc")
    make_fixture(root)
    from recondet3d.data.nuscenes.converter import create_nuscenes_infos

    create_nuscenes_infos(root, "tiny", version="v1.0-mini")
    work = str(tmp_path / "work")
    rc = train_main([
        os.path.join(REPO, "configs", "resdet3d_tiny_test.py"),
        "--work-dir", work,
        "--max-steps", "2",
        "--cfg-options",
        f"data.train.ann_file={os.path.join(root, 'tiny_infos_train.pkl')}",
        f"data.train.data_root={root}",
    ])
    assert rc == 0
    from recondet3d.train import latest_checkpoint

    assert latest_checkpoint(work) is not None


def test_train_cli_detection_head_end_to_end(tmp_path):
    """One optimizer step with the CenterHead enabled: GT boxes flow from
    the dataset through the loader into the head's target/loss path."""
    root = str(tmp_path / "nusc")
    make_fixture(root)
    from recondet3d.data.nuscenes.converter import create_nuscenes_infos

    create_nuscenes_infos(root, "tiny", version="v1.0-mini")
    work = str(tmp_path / "work")
    rc = train_main([
        os.path.join(REPO, "configs", "resdet3d_tiny_centerhead_test.py"),
        "--work-dir", work,
        "--max-steps", "1",
        "--cfg-options",
        f"data.train.ann_file={os.path.join(root, 'tiny_infos_train.pkl')}",
        f"data.train.data_root={root}",
    ])
    assert rc == 0


def test_cli_override_typing():
    """--cfg-options values parse as python literals (bools/numbers/lists)
    and fall back to strings (paths) — bool('False') coercion bugs are the
    classic failure here."""
    from recondet3d.core.config import parse_cli_overrides

    ov = parse_cli_overrides([
        "a.flag=False", "a.n=3", "a.f=1.5", "a.lst=[1,2]",
        "a.path=/data/x.pkl", "a.s=hello",
    ])
    assert ov["a.flag"] is False
    assert ov["a.n"] == 3 and ov["a.f"] == 1.5
    assert ov["a.lst"] == [1, 2]
    assert ov["a.path"] == "/data/x.pkl"
    assert ov["a.s"] == "hello"
    with pytest.raises(ValueError):
        parse_cli_overrides(["noequals"])

    cfg = load_py_config(
        os.path.join(REPO, "configs", "resdet3d_tiny_test.py"),
        parse_cli_overrides(
            ["model.reconstruction_backbone.freeze_da3=False"]
        ),
    )
    assert cfg["model"]["reconstruction_backbone"]["freeze_da3"] is False


def test_yaml_presets_match_code_built():
    """Every YAML preset instantiates and equals the code-built module tree
    (reference ships 7 configs/da3-*.yaml; the config-file contract is that
    users can edit these and get the same models the code builds)."""
    import jax.numpy as jnp

    from recondet3d.api.registry import build_from_yaml, get_all_models
    from recondet3d.models.da3.presets import MODEL_REGISTRY, build_da3

    yaml_names = get_all_models()
    for name in MODEL_REGISTRY:
        assert name in yaml_names, f"preset {name} has no YAML on disk"
    # da3-small-mono is a YAML-only inheritance demo; skip the comparison
    for name in MODEL_REGISTRY:
        y = build_from_yaml(name)
        c = build_da3(name, dtype=jnp.float32)
        assert type(y) is type(c), name
        assert repr(y) == repr(c), f"YAML-built != code-built for {name}"


def test_nested_yaml_inheritance_chain():
    """da3nested-giant-large.yaml composes giant + metric-large via nested
    __inherit__ (reference: configs/da3nested-giant-large.yaml)."""
    from recondet3d.api.registry import build_from_yaml
    from recondet3d.models.da3.net import NestedDepthAnything3Net

    m = build_from_yaml("da3nested-giant-large")
    assert isinstance(m, NestedDepthAnything3Net)
    assert m.anyview.net.name_preset == "vitg"
    assert m.anyview.gs_head is not None
    assert m.metric.net.name_preset == "vitl"
    assert m.metric.net.alt_start == -1
