"""Full training->evaluation loop on the structured fixture.

The complete reference workflow (SURVEY §3.1/§3.2 + the mmdet3d eval
path, reference: tools/create_data.py -> tools/train_mmdet3d.py ->
tools/test.py -> nuscenes_dataset.py:424-489 mAP/NDS) exercised end to
end through this repo's CLIs: raw nuScenes tables -> info pkls -> train
(occupancy + CenterHead losses) -> orbax checkpoint -> detection decode
-> devkit-free mAP/NDS, asserting a NONZERO mAP.

The fixture (nuscenes_fixture.make_fixture(structured=True)) places two
GT objects at fixed lidar-frame poses with dense in-box point clusters
and a ground plane, so the occupancy loss has real signal and the
CenterHead can memorize the scene within a few dozen steps.
"""

import os
import re

import pytest

from nuscenes_fixture import make_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    steps = os.environ.get("RECONDET3D_LOOP_STEPS", "80")
    rc = train_main([cfg, "--work-dir", wd, "--max-steps", steps,
                     "--num-devices", "1"] + overrides)
    assert rc in (0, None)
    out = capsys.readouterr().out
    # loss must decrease: compare first and last logged total loss
    losses = [float(m.group(1))
              for m in re.finditer(r" loss=([0-9.]+)", out)]
    assert len(losses) >= 2 and losses[-1] < 0.5 * losses[0]

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
    # The 48-step trajectory proved machine-sensitive (mAP 0.089 on the
    # round-1 host, 0.016 on the round-2 host from FP-codegen divergence
    # alone), so the default runs 80 steps, where the head has clearly
    # memorized the fixture on both hosts (0.84 car_AP round-1 host).
    # Thresholds leave wide margin — the point is NONZERO detection
    # quality through the whole loop.
    import sys

    print(f"[full-loop] steps={steps} metrics={metrics}",
          file=sys.__stderr__)
    assert metrics["mAP"] > 0.02, metrics
    assert metrics["car_AP"] > 0.05, metrics
    assert metrics["NDS"] > 0.1, metrics
