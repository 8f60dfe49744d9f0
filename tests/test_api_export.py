"""Public API + exporters: inference on synthetic images end-to-end, and
round-trips for PCD/PLY/GLB/COLMAP/NPZ writers."""

import json
import os
import struct

import numpy as np
import pytest

from recondet3d.api import DepthAnything3
from recondet3d.data.export import (
    export,
    read_pcd,
    read_ply,
    write_pcd,
    write_ply,
)
from recondet3d.data.export.pointcloud_io import write_gs_ply
from recondet3d.specs import Prediction


@pytest.fixture(scope="module")
def da3_small():
    return DepthAnything3.from_pretrained("da3-small", cache_dir="/nonexistent")


@pytest.fixture(scope="module")
def prediction(da3_small, tmp_path_factory):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (90, 160, 3), np.uint8) for _ in range(2)]
    return da3_small.inference(imgs, process_res=56)


def test_inference_shapes(prediction):
    p = prediction
    assert p.depth.ndim == 3 and p.depth.shape[0] == 2
    assert p.depth.shape[1] % 14 == 0 and p.depth.shape[2] % 14 == 0
    assert p.conf.shape == p.depth.shape
    assert p.extrinsics.shape == (2, 3, 4)
    assert p.intrinsics.shape == (2, 3, 3)
    assert p.processed_images.shape[:3] == p.depth.shape
    assert np.all(p.depth > 0)


def test_inference_with_extrinsics_alignment(da3_small):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (90, 160, 3), np.uint8) for _ in range(2)]
    ext = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    ext[1, 0, 3] = 1.0
    ixt = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    ixt[:, 0, 0] = ixt[:, 1, 1] = 100.0
    ixt[:, 0, 2], ixt[:, 1, 2] = 80, 45
    p = da3_small.inference(imgs, extrinsics=ext, intrinsics=ixt, process_res=56)
    # aligned back to the input extrinsics
    np.testing.assert_allclose(p.extrinsics, ext[:, :3], atol=1e-5)


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "x.pcd")
    write_pcd(path, pts, cols)
    p2, c2 = read_pcd(path)
    np.testing.assert_allclose(p2, pts, rtol=1e-6)
    np.testing.assert_allclose(c2, np.floor(cols * 255) / 255.0, atol=1 / 255)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    path = str(tmp_path / "x.ply")
    write_ply(path, pts)
    data = read_ply(path)
    np.testing.assert_allclose(
        np.stack([data["x"], data["y"], data["z"]], 1), pts, rtol=1e-6
    )


def test_gs_ply_layout(tmp_path):
    n = 10
    rng = np.random.default_rng(4)
    path = str(tmp_path / "gs.ply")
    write_gs_ply(
        path,
        rng.normal(size=(n, 3)),
        np.abs(rng.normal(size=(n, 3))) + 0.01,
        rng.normal(size=(n, 4)),
        rng.normal(size=(n, 3, 9)),  # sh_degree 2
        rng.uniform(0.1, 0.9, size=(n,)),
    )
    data = read_ply(path)
    assert "f_dc_0" in data and "f_rest_23" in data and "rot_3" in data
    assert len(data["x"]) == n


def test_export_dispatch(prediction, tmp_path):
    out = export(prediction, "glb-npz-mini_npz-depth_vis", str(tmp_path))
    assert set(out) == {"glb", "npz", "mini_npz", "depth_vis"}
    glb_path = str(tmp_path / "scene.glb")
    with open(glb_path, "rb") as f:
        magic, version, _ = struct.unpack("<III", f.read(12))
    assert magic == 0x46546C67 and version == 2
    npz = np.load(str(tmp_path / "prediction.npz"))
    assert "depth" in npz
    assert os.path.exists(str(tmp_path / "depth_000.png"))


def test_colmap_export(prediction, tmp_path):
    from recondet3d.data.export import export_to_colmap
    from recondet3d.data.export.colmap_io import read_cameras_bin, read_images_bin

    out = export_to_colmap(prediction, str(tmp_path))
    cams = read_cameras_bin(os.path.join(out, "cameras.bin"))
    imgs = read_images_bin(os.path.join(out, "images.bin"))
    assert len(cams) == 2 and len(imgs) == 2
    H, W = prediction.depth.shape[1:]
    assert cams[1]["width"] == W and cams[1]["height"] == H


def test_read_reference_pcd_artifacts():
    """Interop: parse the reference's checked-in inference outputs
    (reference: output/*.pcd — binary v0.7, fields x y z rgb)."""
    import os

    import numpy as np
    import pytest

    from recondet3d.data.export.pointcloud_io import read_pcd

    path = "/root/reference/output/sample_0_points.pcd"
    if not os.path.exists(path):
        pytest.skip("reference artifacts not mounted")
    pts, colors = read_pcd(path)
    assert pts.shape == (40000, 3)
    assert np.isfinite(pts).all()
    assert colors is not None and colors.shape == (40000, 3)
    assert colors.max() <= 255 and colors.min() >= 0
    # plausibly scene-scaled coordinates
    assert 1.0 < np.abs(pts).max() < 1000.0
