"""Camera trajectory helpers: interpolation, offset paths, stabilization."""

import numpy as np

from recondet3d.utils.camera_traj import (
    dolly_zoom_path,
    interpolate_camera_path,
    stabilization_path,
    wander_path,
    wobble_path,
)


def _base():
    ext = np.eye(4, dtype=np.float32)
    ixt = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]], np.float32)
    return ext, ixt


def test_interpolate_camera_path():
    ext0, ixt = _base()
    ext1 = ext0.copy()
    ext1[0, 3] = 2.0
    ext, ixts = interpolate_camera_path(
        np.stack([ext0, ext1]), np.stack([ixt, ixt]), n_frames=10
    )
    assert ext.shape[0] == 10 and ixts.shape[0] == 10
    assert abs(ext[0, 0, 3] - 0.0) < 1e-5
    assert abs(ext[-1, 0, 3] - 2.0) < 1e-5
    # monotone translation
    assert np.all(np.diff(ext[:, 0, 3]) >= -1e-6)


def test_offset_paths_shapes():
    ext0, ixt = _base()
    for fn in (wander_path, wobble_path):
        e, i = fn(ext0, ixt, n_frames=12)
        assert e.shape == (12, 4, 4) and i.shape == (12, 3, 3)
    e, i = dolly_zoom_path(ext0, ixt, n_frames=12)
    assert i[0, 0, 0] > i[-1, 0, 0]  # fov widens -> focal shrinks


def test_stabilization_path_smooths():
    rng = np.random.default_rng(0)
    n = 30
    poses = np.repeat(np.eye(4)[None], n, 0)
    poses[:, 0, 3] = np.linspace(0, 5, n) + rng.normal(0, 0.3, n)
    out = stabilization_path(poses, k_size=9)

    def jerk(p):
        return np.var(np.diff(p[:, 0, 3], 2))

    assert jerk(out) < jerk(poses) * 0.3
    R = out[:, :3, :3]
    assert np.abs(np.einsum("nij,nkj->nik", R, R) - np.eye(3)).max() < 1e-5
    # trivial cases
    assert stabilization_path(poses[:1]).shape == (1, 4, 4)
    assert stabilization_path(poses[:2], k_size=45).shape == (2, 4, 4)
