"""Real spherical harmonics: evaluation + rotation (JAX).

Replaces the reference's e3nn-based SH rotation
(reference: depth_anything_3/utils/sh_helpers.py:rotate_sh, which computes
per-degree Wigner-D matrices from Euler angles). e3nn is torch-only, so
here rotation matrices for each degree are built by *projection*: real SH
of degree l span a (2l+1)-dim rotation-invariant space, so evaluating the
basis at a fixed well-conditioned set of directions and at their rotated
images yields the exact linear map D(R) via a precomputed pseudo-inverse.
Exact for any degree, batched over rotations, jit-friendly (no Euler-angle
branches).

Basis: the standard 3DGS ("graphdeco") real-SH convention — the same one
the splat renderer uses, keeping the pipeline self-consistent.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["eval_sh_basis", "rotate_sh", "SH_C0"]

SH_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def eval_sh_basis(dirs, degree: int):
    """Evaluate the real SH basis at unit directions.

    dirs: (..., 3) -> (..., (degree+1)**2), 3DGS channel ordering."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, SH_C0, dtype=dirs.dtype)]
    if degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        out += [
            _C3[0] * y * (3 * xx - yy),
            _C3[1] * x * y * z,
            _C3[2] * y * (4 * zz - xx - yy),
            _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            _C3[4] * x * (4 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3 * yy),
        ]
    return jnp.stack(out, axis=-1)


@functools.lru_cache(maxsize=8)
def _sample_dirs_and_pinv(degree: int):
    """Fixed sample directions + pinv of their per-degree SH evaluations."""
    rng = np.random.default_rng(1234)
    n = max(16, 4 * (degree + 1) ** 2)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pinvs = {}
    # force concrete evaluation even when first called under a trace
    # (jit init / eval_shape of the GS path)
    import jax

    with jax.ensure_compile_time_eval():
        basis = np.asarray(eval_sh_basis(jnp.asarray(v), degree))
    for l in range(degree + 1):
        sl = slice(l * l, (l + 1) * (l + 1))
        Yl = basis[:, sl]  # (n, 2l+1)
        pinvs[l] = np.linalg.pinv(Yl)
    return v.astype(np.float32), pinvs


def rotate_sh(sh: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """Rotate SH coefficient vectors into a rotated frame.

    sh: (..., n) with n = (deg+1)^2; rotations: (..., 3, 3) (e.g. cam2world
    R). Returns coefficients c' with sum_i c'_i Y_i(u) = sum_i c_i
    Y_i(R^T u) — a function on directions carried through the rotation,
    matching the camera->world SH transport of the reference adapter.
    """
    n = sh.shape[-1]
    degree = int(np.sqrt(n)) - 1
    v_np, pinvs = _sample_dirs_and_pinv(degree)
    v = jnp.asarray(v_np)  # (K, 3)
    R = rotations.astype(jnp.float32)
    # directions R^T u for each batched rotation: (..., K, 3)
    vr = jnp.einsum("...ji,kj->...ki", R, v)
    basis_r = eval_sh_basis(vr, degree)  # (..., K, n)
    outs = []
    for l in range(degree + 1):
        sl = slice(l * l, (l + 1) * (l + 1))
        Nl = basis_r[..., sl]  # (..., K, 2l+1)
        Dl = jnp.einsum("mk,...kj->...mj", jnp.asarray(pinvs[l]), Nl)  # (..., 2l+1, 2l+1)
        outs.append(jnp.einsum("...ij,...j->...i", Dl, sh[..., sl].astype(jnp.float32)))
    return jnp.concatenate(outs, axis=-1).astype(sh.dtype)
