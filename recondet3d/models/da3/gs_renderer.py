"""3D gaussian splatting renderer (TPU-native, static shapes).

Replaces the reference's gsplat CUDA rasterizer
(reference: depth_anything_3/model/utils/gs_renderer.py:35-340 —
``render_3dgs`` rendering RGB+depth through gsplat.rasterization, plus
camera-trajectory video rendering).

Design (no atomics, no dynamic lists):
- EWA projection: 3D covariance R S^2 R^T pushed through the perspective
  Jacobian to a 2D conic (+0.3px low-pass like gsplat).
- Tile binning as a *selection* problem: for every 16x16 tile, the K
  nearest-by-depth overlapping gaussians are found with a running top-k
  over gaussian blocks (one fused scan; top-k by depth doubles as the
  depth sort).
- Per-tile front-to-back alpha compositing is a scan over the K
  candidates vectorized across the tile's 256 pixels.

Complexities are static: O(tiles * N) for binning, O(tiles * K * 256)
for compositing.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recondet3d.specs import Gaussians
from recondet3d.utils.sh import eval_sh_basis
from recondet3d.utils.transforms import quat_to_mat

__all__ = ["render_3dgs", "render_trajectory_video"]

TILE = 16


def _quat_wxyz_to_mat(q):
    xyzw = jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)
    return quat_to_mat(xyzw)


def _project_gaussians(means, scales, rots_wxyz, w2c, K):
    """World gaussians -> screen: (xy (N,2), depth (N,), conic (N,3),
    radius (N,), valid (N,))."""
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    p_cam = means @ R.T + t
    z = p_cam[:, 2]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    zc = jnp.clip(z, 1e-4, None)
    x2d = fx * p_cam[:, 0] / zc + cx
    y2d = fy * p_cam[:, 1] / zc + cy

    Rg = _quat_wxyz_to_mat(rots_wxyz)  # (N, 3, 3)
    M = Rg * scales[:, None, :]  # R @ diag(s)
    cov3d = M @ jnp.swapaxes(M, 1, 2)
    cov_cam = jnp.einsum("ij,njk,lk->nil", R, cov3d, R)

    # perspective jacobian (EWA)
    J = jnp.zeros((means.shape[0], 2, 3))
    J = J.at[:, 0, 0].set(fx / zc)
    J = J.at[:, 0, 2].set(-fx * p_cam[:, 0] / zc ** 2)
    J = J.at[:, 1, 1].set(fy / zc)
    J = J.at[:, 1, 2].set(-fy * p_cam[:, 1] / zc ** 2)
    cov2d = jnp.einsum("nij,njk,nlk->nil", J, cov_cam, J)
    cov2d = cov2d.at[:, 0, 0].add(0.3).at[:, 1, 1].add(0.3)

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] ** 2
    det = jnp.clip(det, 1e-12, None)
    conic = jnp.stack(
        [cov2d[:, 1, 1] / det, -cov2d[:, 0, 1] / det, cov2d[:, 0, 0] / det], axis=-1
    )
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam = mid + jnp.sqrt(jnp.clip(mid ** 2 - det, 0.1, None))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))
    valid = z > 0.01
    return jnp.stack([x2d, y2d], -1), z, conic, radius, valid


@functools.partial(jax.jit, static_argnames=("hw", "max_per_tile", "sh_degree"))
def render_3dgs_single(
    means, scales, rots_wxyz, harmonics, opacities,
    w2c, K, hw: Tuple[int, int], max_per_tile: int = 192, sh_degree: int = 2,
    background: float = 0.0,
):
    """Render one view. Returns (rgb (H, W, 3), depth (H, W), alpha (H, W))."""
    H, W = hw
    Hp, Wp = ((H + TILE - 1) // TILE) * TILE, ((W + TILE - 1) // TILE) * TILE
    n_ty, n_tx = Hp // TILE, Wp // TILE
    n_tiles = n_ty * n_tx
    N = means.shape[0]

    xy, depth, conic, radius, valid = _project_gaussians(
        means.astype(jnp.float32), scales.astype(jnp.float32),
        rots_wxyz.astype(jnp.float32), w2c.astype(jnp.float32), K.astype(jnp.float32)
    )

    # view-dependent color from SH
    cam_pos = -w2c[:3, :3].T @ w2c[:3, 3]
    dirs = means - cam_pos
    dirs = dirs / jnp.clip(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8, None)
    basis = eval_sh_basis(dirs, sh_degree)  # (N, d_sh)
    colors = jnp.clip(
        jnp.einsum("ncd,nd->nc", harmonics.astype(jnp.float32), basis) + 0.5, 0.0, None
    )

    # tile bounds per gaussian
    x0 = xy[:, 0] - radius
    x1 = xy[:, 0] + radius
    y0 = xy[:, 1] - radius
    y1 = xy[:, 1] + radius
    tiles_x = jnp.arange(n_tx) * TILE
    tiles_y = jnp.arange(n_ty) * TILE

    # per-tile top-K by depth over gaussian blocks
    BLK = 4096
    pad = (-N) % BLK
    def padv(v, fill=0.0):
        return jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1), constant_values=fill)

    depth_p = padv(depth, jnp.inf)
    x0p, x1p, y0p, y1p = padv(x0), padv(x1, -1.0), padv(y0), padv(y1, -1.0)
    valid_p = padv(valid.astype(jnp.float32)) > 0.5
    idx_p = jnp.arange(N + pad, dtype=jnp.int32)

    tx = jnp.broadcast_to(tiles_x[None, :], (n_ty, n_tx)).reshape(-1)
    ty = jnp.broadcast_to(tiles_y[:, None], (n_ty, n_tx)).reshape(-1)

    def bin_body(carry, blk):
        best_d, best_i = carry
        d, bx0, bx1, by0, by1, v, ix = blk
        overlap = (
            (bx1[None] >= tx[:, None]) & (bx0[None] <= (tx[:, None] + TILE - 1))
            & (by1[None] >= ty[:, None]) & (by0[None] <= (ty[:, None] + TILE - 1))
            & v[None]
        )  # (n_tiles, BLK)
        dd = jnp.where(overlap, d[None], jnp.inf)
        md = jnp.concatenate([best_d, dd], axis=1)
        mi = jnp.concatenate([best_i, jnp.broadcast_to(ix[None], dd.shape)], axis=1)
        neg, sel = jax.lax.top_k(-md, max_per_tile)
        return (-neg, jnp.take_along_axis(mi, sel, axis=1)), None

    init = (
        jnp.full((n_tiles, max_per_tile), jnp.inf, jnp.float32),
        jnp.zeros((n_tiles, max_per_tile), jnp.int32),
    )
    blocks = (
        depth_p.reshape(-1, BLK), x0p.reshape(-1, BLK), x1p.reshape(-1, BLK),
        y0p.reshape(-1, BLK), y1p.reshape(-1, BLK), valid_p.reshape(-1, BLK),
        idx_p.reshape(-1, BLK),
    )
    (cand_d, cand_i), _ = jax.lax.scan(bin_body, init, blocks)
    cand_ok = jnp.isfinite(cand_d)  # (n_tiles, K) sorted near-to-far

    # gather candidate attributes
    xy_c = xy[cand_i]  # (n_tiles, K, 2)
    conic_c = conic[cand_i]
    color_c = colors[cand_i]
    opac_c = opacities.astype(jnp.float32)[cand_i]
    depth_c = jnp.where(cand_ok, cand_d, 0.0)  # inf * 0 would NaN the sum

    # pixel coords per tile
    px = (tx[:, None] + jnp.arange(TILE)[None, :]).astype(jnp.float32)  # (T, 16)
    py = (ty[:, None] + jnp.arange(TILE)[None, :]).astype(jnp.float32)
    pxx = jnp.broadcast_to(px[:, None, :], (n_tiles, TILE, TILE)).reshape(n_tiles, -1)
    pyy = jnp.broadcast_to(py[:, :, None], (n_tiles, TILE, TILE)).reshape(n_tiles, -1)

    def composite(carry, k):
        rgb, dep, T = carry
        dx = pxx - xy_c[:, k, 0:1] + 0.5 - 0.5  # pixel centers at integer coords
        dy = pyy - xy_c[:, k, 1:2]
        a, b, c = conic_c[:, k, 0:1], conic_c[:, k, 1:2], conic_c[:, k, 2:3]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = jnp.clip(
            opac_c[:, k, None] * jnp.exp(jnp.minimum(power, 0.0)), 0.0, 0.999
        )
        alpha = jnp.where(cand_ok[:, k, None] & (alpha > 1.0 / 255), alpha, 0.0)
        w = T * alpha
        rgb = rgb + w[..., None] * color_c[:, k, None, :]
        dep = dep + w * depth_c[:, k, None]
        return (rgb, dep, T * (1 - alpha)), None

    rgb0 = jnp.zeros((n_tiles, TILE * TILE, 3))
    dep0 = jnp.zeros((n_tiles, TILE * TILE))
    T0 = jnp.ones((n_tiles, TILE * TILE))
    (rgb, dep, T), _ = jax.lax.scan(
        composite, (rgb0, dep0, T0), jnp.arange(max_per_tile)
    )
    alpha_img = 1 - T
    rgb = rgb + T[..., None] * background

    def untile(img):
        c = img.shape[-1] if img.ndim == 3 else None
        x = img.reshape(n_ty, n_tx, TILE, TILE, -1)
        x = x.transpose(0, 2, 1, 3, 4).reshape(Hp, Wp, -1)
        return x[:H, :W]

    return (
        untile(rgb)[..., :3],
        untile(dep[..., None])[..., 0],
        untile(alpha_img[..., None])[..., 0],
    )


def render_3dgs(
    gaussians: Gaussians,
    extrinsics,  # (V, 4, 4) or (B, V, 4, 4) w2c
    intrinsics,  # (V, 3, 3) matching
    hw: Tuple[int, int],
    max_per_tile: int = 192,
    background: float = 0.0,
):
    """Batched multi-view rendering (reference: gs_renderer.py:44
    render_3dgs). Returns (rgb (V, H, W, 3), depth (V, H, W), alpha)."""
    means = jnp.asarray(gaussians.means).reshape(-1, 3)
    scales = jnp.asarray(gaussians.scales).reshape(-1, 3)
    rots = jnp.asarray(gaussians.rotations).reshape(-1, 4)
    harm = jnp.asarray(gaussians.harmonics)
    harm = harm.reshape(-1, harm.shape[-2], harm.shape[-1])
    opac = jnp.asarray(gaussians.opacities).reshape(-1)
    sh_degree = int(np.sqrt(harm.shape[-1])) - 1

    ext = jnp.asarray(extrinsics).reshape(-1, 4, 4)
    ixt = jnp.asarray(intrinsics).reshape(-1, 3, 3)
    outs = [
        render_3dgs_single(
            means, scales, rots, harm, opac, ext[v], ixt[v], tuple(hw),
            max_per_tile=max_per_tile, sh_degree=sh_degree, background=background,
        )
        for v in range(ext.shape[0])
    ]
    rgb = jnp.stack([o[0] for o in outs])
    dep = jnp.stack([o[1] for o in outs])
    alp = jnp.stack([o[2] for o in outs])
    return rgb, dep, alp


def render_trajectory_video(
    gaussians: Gaussians, extrinsics, intrinsics, hw, out_path: str,
    fps: int = 15, **kwargs,
):
    """Render a camera trajectory to a video file (reference:
    gs_renderer.py trajectory rendering; moviepy replaced by cv2)."""
    import cv2

    rgb, _, _ = render_3dgs(gaussians, extrinsics, intrinsics, hw, **kwargs)
    frames = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
    H, W = frames.shape[1:3]
    vw = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H)
    )
    for f in frames:
        vw.write(f[..., ::-1])
    vw.release()
    return out_path
