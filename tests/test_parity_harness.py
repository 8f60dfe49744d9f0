"""Tests for the real-weight parity harness (scripts/parity_vs_reference.py).

The metric machinery is tested unconditionally; the checkpoint-driven
end-to-end run is present-but-skipped until a DA3 safetensors checkpoint
exists (none ships in this environment and huggingface.co is unreachable
— the harness records the download attempt in PARITY.json).
Reference contract: output/sample_0_points.pcd (+ batch_0_pred_*.pcd),
produced by tools/inference_mmdet3d.py:286-289.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import parity_vs_reference as pv  # noqa: E402

CKPT = os.environ.get("RECONDET3D_BENCH_CKPT")


def test_chamfer_identity_is_zero():
    pts = np.random.default_rng(0).normal(size=(500, 3)).astype(np.float32)
    c = pv.chamfer(pts, pts)
    assert c["mean_m"] == 0.0 and c["p90_m"] == 0.0


def test_chamfer_known_offset():
    # two interleaved grids offset by d: nearest neighbor is exactly d away
    g = np.stack(np.meshgrid(*[np.arange(8.0)] * 3), -1).reshape(-1, 3)
    d = 0.25
    c = pv.chamfer(g.astype(np.float32), (g + [d, 0, 0]).astype(np.float32))
    assert abs(c["mean_m"] - d) < 1e-6
    assert abs(c["median_m"] - d) < 1e-6


def test_chamfer_chunking_matches_unchunked():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(300, 3)).astype(np.float32)
    b = rng.normal(size=(211, 3)).astype(np.float32)
    assert pv.chamfer(a, b, chunk=7) == pv.chamfer(a, b, chunk=10_000)


def test_distribution_stats_fields():
    pts = np.random.default_rng(2).uniform(-10, 10, (1000, 3)).astype(np.float32)
    s = pv.distribution_stats(pts)
    assert s["count"] == 1000
    assert len(s["range_quantiles"]) == 101
    q = np.asarray(s["range_quantiles"])
    assert (np.diff(q) >= 0).all()


def test_reference_pcds_readable():
    from recondet3d.data.export.pointcloud_io import read_pcd

    for p in pv.REFERENCE_PCDS:
        if not os.path.exists(p):
            pytest.skip("reference outputs not mounted")
        pts, cols = read_pcd(p)
        assert pts.shape == (40000, 3)
        assert np.isfinite(pts).all()


@pytest.mark.skipif(
    not (CKPT and os.path.exists(CKPT)),
    reason="no DA3 checkpoint in this environment (RECONDET3D_BENCH_CKPT "
    "unset); harness is ready — see scripts/parity_vs_reference.py",
)
def test_parity_run_with_checkpoint(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_vs_reference.py"),
         "--ckpt", CKPT, "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=3600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.load(open(tmp_path / "PARITY.json"))
    assert report["verdict"] in ("PASS", "FAIL")
    assert (tmp_path / "points.pcd").exists()
