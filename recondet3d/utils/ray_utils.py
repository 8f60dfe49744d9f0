"""Ray-based camera pose estimation (the ``use_ray_pose`` path).

Re-implementation of the reference ray utilities
(reference: depth_anything_3/utils/ray_utils.py — camray_to_caminfo:435,
get_extrinsic_from_camray:506, RANSAC weighted homography fitting
:147-380, ql_decomposition:97): the DualDPT aux head predicts per-patch
camera rays (direction + translation); the rotation+intrinsics come from
the homography between the identity-camera ray grid and the predicted
directions (A = K R), split by QL decomposition; translation is the
confidence-weighted mean.

TPU design: homographies are fit by eigen-solving the 9x9 weighted
normal equations (the reference SVDs a (2N, 9) matrix — same nullspace,
but O(N) + a tiny eigh instead of a giant SVD); the RANSAC loop is a
fixed-size batch of 100 minimal 8-point fits scored in one shot, seeded
deterministically (the reference's torch.randperm is unseeded).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["get_extrinsic_from_camray", "camray_to_caminfo"]

_N_ITER = 100
_N_MINIMAL = 8


def _homography_from_normal_eqs(src, dst, w):
    """Weighted DLT: rows of A for each point pair, solve min ||A h|| via
    eigh(A^T W A). src/dst (..., N, 2), w (..., N) -> (..., 3, 3)."""
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -ones, zeros, zeros, zeros, x * u, y * u, u], axis=-1)
    r2 = jnp.stack([zeros, zeros, zeros, -x, -y, -ones, x * v, y * v, v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2N, 9)
    ww = jnp.concatenate([w, w], axis=-1)[..., None]  # (..., 2N, 1)
    AtA = jnp.einsum("...ni,...nj->...ij", A * ww, A)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]  # smallest eigenvalue
    H = h.reshape(h.shape[:-1] + (3, 3))
    return H / H[..., 2:3, 2:3]


def _ransac_homography(src, dst, weights, key, reproj_threshold=0.2):
    """src/dst (N, 2), weights (N,) -> (3, 3). Fixed-iteration RANSAC."""
    N = src.shape[0]
    n_sample = max(_N_MINIMAL, int(N * 0.3))
    # sample minimal sets from the top-weighted n_sample points
    order = jnp.argsort(-weights)[:n_sample]
    perm = jax.vmap(
        lambda k: jax.random.permutation(k, n_sample)[:_N_MINIMAL]
    )(jax.random.split(key, _N_ITER))  # (n_iter, 8)
    idx = order[perm]  # (n_iter, 8)

    H_cand = _homography_from_normal_eqs(src[idx], dst[idx], weights[idx])

    src_h = jnp.concatenate([src, jnp.ones((N, 1))], axis=-1)  # (N, 3)
    proj = jnp.einsum("kij,nj->kni", H_cand, src_h)
    proj_xy = proj[..., :2] / jnp.where(
        jnp.abs(proj[..., 2:3]) < 1e-12, 1e-12, proj[..., 2:3]
    )
    err = jnp.linalg.norm(proj_xy - dst[None], axis=-1)  # (n_iter, N)
    inlier = err < reproj_threshold
    score = jnp.sum(inlier * weights[None], axis=-1)
    best = jnp.argmax(score)
    best_inlier = inlier[best]

    # refit on all inliers (weighted); fall back to the best candidate when
    # too few inliers
    w_in = jnp.where(best_inlier, weights, 0.0)
    H_fit = _homography_from_normal_eqs(src, dst, w_in)
    return jnp.where(jnp.sum(best_inlier) >= 4, H_fit, H_cand[best])


def _ql_decomposition(A):
    """A = Q L with Q rotation, L lower-triangular, positive diagonal
    (reference: ray_utils.py:97-110)."""
    P = jnp.array([[0.0, 0, 1], [0, 1, 0], [1, 0, 0]])
    Qt, Rt = jnp.linalg.qr(A @ P)
    Q = Qt @ P
    L = P @ Rt @ P
    d = jnp.sign(jnp.diagonal(L))
    Q = Q * d[None, :]
    L = L * d[:, None]
    return Q, L


def camray_to_caminfo(camray, confidence=None, reproj_threshold: float = 0.2,
                      seed: int = 42):
    """camray (B, S, h, w, 6), confidence (B, S, h, w) ->
    (R (B,S,3,3), T (B,S,3), focal (B,S,2), pp (B,S,2))."""
    B, S, h, w, _ = camray.shape
    if confidence is None:
        confidence = jnp.ones(camray.shape[:-1], camray.dtype)

    # identity-camera unit-depth ray grid with normalized K (principal at
    # (1,1), image spanning 2x2 — reference: camray_to_caminfo I_K setup)
    xs = (jnp.arange(w) + 0.5) * (2.0 / w) - 1.0
    ys = (jnp.arange(h) + 0.5) * (2.0 / h) - 1.0
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    origin = jnp.stack([xg, yg, jnp.ones_like(xg)], axis=-1)  # (h, w, 3)

    rays_o = jnp.broadcast_to(origin[None], (B * S, h, w, 3)).reshape(B * S, -1, 3)
    cam = camray.reshape(B * S, h * w, 6).astype(jnp.float32)
    conf = confidence.reshape(B * S, h * w).astype(jnp.float32)
    rays_t = cam[..., :3]

    z_ok = (jnp.abs(rays_t[..., 2]) > 1e-4) & (jnp.abs(rays_o[..., 2]) > 1e-4)
    def z_norm(r):
        z = jnp.where(jnp.abs(r[..., 2:3]) > 1e-4, r[..., 2:3], 1.0)
        return r[..., :2] / z

    src = z_norm(rays_o)
    dst = z_norm(rays_t)
    wts = jnp.where(z_ok, conf, 0.0)

    keys = jax.random.split(jax.random.PRNGKey(seed), B * S)
    A = jax.vmap(
        lambda s, d, w_, k: _ransac_homography(s, d, w_, k, reproj_threshold)
    )(src, dst, wts, keys)
    A = jnp.where(jnp.linalg.det(A)[:, None, None] < 0, -A, A)

    Q, L = jax.vmap(_ql_decomposition)(A)
    L = L / L[:, 2:3, 2:3]
    f = jnp.stack([L[:, 0, 0], L[:, 1, 1]], axis=-1)
    pp = jnp.stack([L[:, 2, 0], L[:, 2, 1]], axis=-1)

    T = jnp.sum(cam[..., 3:] * conf[..., None], axis=1) / jnp.clip(
        jnp.sum(conf, axis=1, keepdims=True), 1e-8, None
    )

    return (
        Q.reshape(B, S, 3, 3),
        T.reshape(B, S, 3),
        (1.0 / f).reshape(B, S, 2),
        (pp + 1.0).reshape(B, S, 2),
    )


def get_extrinsic_from_camray(camray, conf, patch_size_y=None, patch_size_x=None):
    """(B, S, h, w, 6) rays + (B, S, h, w) conf -> (w2c (B,S,4,4),
    focal (B,S,2), pp (B,S,2)) (reference: ray_utils.py:506-545)."""
    if conf is not None and conf.ndim == camray.ndim:
        conf = conf[..., 0]
    R, T, focal, pp = camray_to_caminfo(camray, conf)
    B, S = R.shape[:2]
    bottom = jnp.broadcast_to(jnp.array([0.0, 0, 0, 1.0]), (B, S, 1, 4))
    ext = jnp.concatenate(
        [jnp.concatenate([R, T[..., None]], axis=-1), bottom], axis=-2
    )
    return ext, focal, pp
