"""Full training->evaluation loop on the structured fixture.

The complete reference workflow (SURVEY §3.1/§3.2 + the mmdet3d eval
path, reference: tools/create_data.py -> tools/train_mmdet3d.py ->
tools/test.py -> nuscenes_dataset.py:424-489 mAP/NDS) exercised end to
end through this repo's CLIs: raw nuScenes tables -> info pkls -> train
(occupancy + CenterHead losses) -> orbax checkpoint -> detection decode
-> devkit-free mAP/NDS, asserting memorization-grade detection quality.

The fixture (nuscenes_fixture.make_fixture(structured=True)) places
EIGHT GT objects of three classes (car/pedestrian/traffic_cone) at fixed
lidar-frame poses with dense in-box point clusters and a checkerboard
ground whose occupancy class balance matches the reference's measured
production statistics (~7.4% occupied per BEV channel, reference:
occupancy_loss.py:15) — so the occupancy loss trajectory is comparable
to the reference's logged one and the CenterHead must actually decode
multiple classes to pass.
"""

import os
import re

import numpy as np
import pytest

from nuscenes_fixture import STRUCTURED_BOXES, _structured_lidar, make_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_structured_fixture_occupancy_balance():
    """The fixture's occupancy class balance matches the reference's
    production statistics: ~2,400 occupied of ~32,400 cells per 180x180
    BEV channel (~7.4%, reference: occupancy_loss.py:15). Voxelized at
    the tiny config's grid (point_cloud_range +-8 m, occ grid 20x20x8)
    the structured cloud must land in the same regime (4-12% occupied),
    NOT the fully-occupied ground channel of the round-1 fixture."""
    rng = np.random.default_rng(0)
    pts = _structured_lidar(rng, 0)[:, :3]
    lo = np.array([-8.0, -8.0, -2.0])
    cell = np.array([0.8, 0.8, 0.5])  # 20 x 20 x 8 over +-8 m, z in [-2, 2]
    c = np.floor((pts - lo) / cell).astype(np.int64)
    ok = ((c >= 0) & (c < np.array([20, 20, 8]))).all(axis=1)
    c = c[ok]
    occupied = len(np.unique(c[:, 0] * 160 + c[:, 1] * 8 + c[:, 2]))
    frac = occupied / (20 * 20 * 8)
    assert 0.04 <= frac <= 0.12, f"occupied fraction {frac:.3f}"
    # and all three classes are present
    assert len({name for *_, name in STRUCTURED_BOXES}) == 3


@pytest.mark.slow
def test_full_detection_loop(tmp_path, capsys):
    root = str(tmp_path / "nusc")
    make_fixture(root, structured=True)

    from recondet3d.cli.create_data import main as create_data_main

    rc = create_data_main([
        "nuscenes", "--root-path", root,
        "--extra-tag", "tiny", "--version", "v1.0-mini",
    ])
    assert rc in (0, None)
    ann = os.path.join(root, "tiny_infos_train.pkl")

    cfg = os.path.join(REPO, "configs", "resdet3d_tiny_centerhead_test.py")
    overrides = [
        "--cfg-options",
        f"data.train.ann_file={ann}", f"data.train.data_root={root}",
        f"data.test.ann_file={ann}", f"data.test.data_root={root}",
    ]

    from recondet3d.cli.train import main as train_main

    wd = str(tmp_path / "wd")
    # --num-devices 1: the suite's 8-virtual-device CPU mesh would make the
    # global batch 8 on one physical core (8x slower per step); convergence
    # was measured at batch 1
    steps = os.environ.get("RECONDET3D_LOOP_STEPS", "150")
    rc = train_main([cfg, "--work-dir", wd, "--max-steps", steps,
                     "--num-devices", "1"] + overrides)
    assert rc in (0, None)
    out = capsys.readouterr().out
    # normalized loss curve: losses divided by the initial loss, so the
    # trajectory is comparable across loss scales. The reference's logged
    # production run goes 1.35 -> ~1.19 (0.88 normalized) and STAGNATES
    # after ~300 iters (reference: ANALYSIS_OCCUPANCY_TRAINING.md:6-9, an
    # issue their own analysis attributes to class imbalance + a shallow
    # U-Net); this fixture must do strictly better — a broken loss/assign
    # path cannot reach 0.25 normalized.
    losses = [float(m.group(1))
              for m in re.finditer(r" loss=([0-9.]+)", out)]
    assert len(losses) >= 2
    normalized = [l / losses[0] for l in losses]
    assert normalized[-1] < 0.25, f"normalized loss curve tail {normalized[-5:]}"

    from recondet3d.train import latest_checkpoint

    ckpt = latest_checkpoint(wd)
    assert ckpt is not None

    from recondet3d.cli.test import main as test_main

    rc = test_main([cfg, "--checkpoint", ckpt] + overrides)
    assert rc in (0, None)
    out = capsys.readouterr().out
    metrics = dict(
        (m.group(1), float(m.group(2)))
        for m in re.finditer(r"pts_bbox_NuScenes/(\S+): ([0-9.]+)", out)
    )
    import sys

    print(f"[full-loop] steps={steps} metrics={metrics}",
          file=sys.__stderr__)
    # memorization-grade thresholds (VERDICT r2 ask #7): a regressed
    # decode/assign/NMS/label-remap path cannot reach these on the
    # 8-object fixture. Note devkit semantics: mAP averages over ALL 10
    # nuScenes classes (absent classes contribute AP=0, reference:
    # nuscenes_dataset.py:443-489), so with 3 classes present the
    # arithmetic ceiling is 0.3 — the per-present-class mean is the
    # memorization-strength assert. Measured on this host at 150 steps:
    # car 0.58 / ped 0.23 / traffic_cone 0.37, mAP 0.119, NDS 0.140.
    present = ["car_AP", "pedestrian_AP", "traffic_cone_AP"]
    present_mean = sum(metrics[k] for k in present) / len(present)
    assert present_mean > 0.2, metrics
    assert metrics["car_AP"] > 0.35, metrics
    assert all(metrics[k] > 0.0 for k in present), metrics
    assert metrics["mAP"] > 0.06, metrics
    assert metrics["NDS"] > 0.1, metrics
