"""CLI smoke tests: create_data, inference_mmdet3d (PCD outputs — the
reference's intended tools/inference_mmdet3d.py behavior, which is
syntactically broken in the snapshot), and test.py (detection eval)."""

import os
import sys

import numpy as np
import pytest

from nuscenes_fixture import make_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def nusc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nusc"))
    make_fixture(root)
    from recondet3d.cli.create_data import main as create_data_main

    rc = create_data_main([
        "nuscenes", "--root-path", root,
        "--extra-tag", "tiny", "--version", "v1.0-mini",
    ])
    assert rc in (0, None)
    assert os.path.exists(os.path.join(root, "tiny_infos_train.pkl"))
    return root


def _cfg_overrides(root):
    return [
        "--cfg-options",
        f"data.train.ann_file={os.path.join(root, 'tiny_infos_train.pkl')}",
        f"data.train.data_root={root}",
        f"data.test.ann_file={os.path.join(root, 'tiny_infos_train.pkl')}",
        f"data.test.data_root={root}",
    ]


def test_inference_mmdet3d_writes_pcd(nusc_root, tmp_path):
    from recondet3d.cli.inference_mmdet3d import main

    out = str(tmp_path / "out")
    rc = main([
        "--config", os.path.join(REPO, "configs", "resdet3d_tiny_test.py"),
        "--out-dir", out, "--max-samples", "1",
    ] + _cfg_overrides(nusc_root))
    assert rc == 0
    pcds = [f for f in os.listdir(out) if f.endswith(".pcd")]
    assert pcds, "no PCD written"
    from recondet3d.data.export import read_pcd

    pts, _ = read_pcd(os.path.join(out, pcds[0]))
    assert pts.ndim == 2 and pts.shape[1] >= 3


def test_test_cli_detection_eval(nusc_root, capsys):
    from recondet3d.cli.test import main

    rc = main([
        os.path.join(REPO, "configs", "resdet3d_tiny_centerhead_test.py"),
        "--max-samples", "1",
    ] + _cfg_overrides(nusc_root))
    assert rc == 0
    out = capsys.readouterr().out
    assert "NDS" in out


def test_inference_nuscenes_cli(nusc_root, tmp_path):
    """The devkit-style per-sample DA3 inference path (the reference's
    tools/inference_nuscenes.py intent): raw tables -> DA3 (random-init
    da3-small) -> GT-extrinsics fusion -> downsample pipeline -> PCD."""
    from recondet3d.cli.inference_nuscenes import main

    out = str(tmp_path / "out")
    rc = main([
        "--dataroot", nusc_root, "--model", "da3-small",
        "--out-dir", out, "--max-samples", "1", "--process-res", "56",
        "--num-points", "256", "--anchor-points", "64",
        "--max-depth", "20",
    ])
    assert rc in (0, None)
    assert os.path.exists(os.path.join(out, "sample_0_points.pcd"))


def test_da3_cli_auto_images(tmp_path):
    """`da3 auto <dir>` with a random-init small preset: input detection,
    inference, and export dispatch (reference: cli.py:45-176)."""
    import cv2

    d = str(tmp_path / "imgs")
    os.makedirs(d)
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(os.path.join(d, f"im{i}.jpg"),
                    rng.integers(0, 255, (120, 160, 3), np.uint8))
    from recondet3d.cli.da3 import main

    out = str(tmp_path / "exp")
    rc = main([
        "auto", d, "--model", "da3-small", "--export-dir", out,
        "--export-format", "mini_npz-depth_vis", "--process-res", "56",
    ])
    assert rc == 0
    files = []
    for r, _, fs in os.walk(out):
        files += [os.path.join(r, f) for f in fs]
    assert any(f.endswith(".npz") for f in files)
    assert any(f.endswith(".png") or f.endswith(".jpg") for f in files)


def test_vis_occupancy_hook_to_cli(tmp_path):
    """Producer-consumer contract: OccupancyDebugHook dump -> vis CLI
    heatmaps (the reference's SparseRefinement pickle dumps ->
    tools/vis_coord_features.py path)."""
    from recondet3d.cli.vis_occupancy import main
    from recondet3d.train.hooks import OccupancyDebugHook

    rng = np.random.default_rng(0)
    dbg = str(tmp_path / "dbg")
    aux = dict(
        occupancy_logits=rng.normal(size=(1, 20, 20, 8)).astype(np.float32),
        gt_occupancy_map=rng.uniform(0, 1, (1, 20, 20, 8)).astype(np.float32),
    )
    hook = OccupancyDebugHook(dbg, interval=10, aux_fn=lambda: aux)
    hook(10, None, {})
    assert any(f.startswith("debug_iter_") for f in os.listdir(dbg))

    out = str(tmp_path / "vis")
    rc = main([dbg, "--out-dir", out])
    assert rc in (0, None)
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert any("pseudo" in f for f in pngs) and any("gt" in f for f in pngs)


def test_gt_vis_cli(tmp_path):
    """Lidar .bin -> BEV scatter image (reference tools/gt_vis.py)."""
    rng = np.random.default_rng(0)
    binp = str(tmp_path / "000001.bin")
    rng.uniform(-30, 30, (5000, 5)).astype(np.float32).tofile(binp)
    from recondet3d.cli.gt_vis import main

    out = str(tmp_path / "gtv")
    rc = main([binp, "--out-dir", out])
    assert rc in (0, None)
    assert os.listdir(out)


def test_check_model_memory_cli(capsys):
    from recondet3d.cli.check_model_memory import main

    rc = main([os.path.join(REPO, "configs", "resdet3d_tiny_test.py")])
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert "param" in out.lower() or "MB" in out
