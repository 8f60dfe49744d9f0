"""Camera pose encoder / decoder heads.

Re-implementation of the reference camera heads
(reference: depth_anything_3/model/cam_enc.py:23-81, cam_dec.py:19-46).
CameraEnc turns GT poses into conditioning tokens (9-D encoding -> MLP ->
4 transformer blocks); CameraDec maps the ViT camera token to a 9-D pose
encoding (t, quat xyzw, fov). Both run fp32 (the reference wraps cam_enc
in autocast(enabled=False) — da3.py:126-128).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recondet3d.models.da3.layers import Block, Mlp
from recondet3d.utils.geometry import affine_inverse
from recondet3d.utils.transforms import extri_intri_to_pose_encoding

__all__ = ["CameraEnc", "CameraDec"]


class CameraEnc(nn.Module):
    dim_out: int = 1024
    dim_in: int = 9
    trunk_depth: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 0.01

    @nn.compact
    def __call__(self, ext, ixt, image_size_hw: Tuple[int, int]):
        """ext: (B, S, 3or4, 4) w2c; ixt: (B, S, 3, 3) -> tokens (B, S, C)."""
        c2ws = affine_inverse(ext.astype(jnp.float32))
        enc = extri_intri_to_pose_encoding(c2ws, ixt.astype(jnp.float32), image_size_hw)
        tok = Mlp(self.dim_out // 2, out_features=self.dim_out, name="pose_branch")(enc)
        tok = nn.LayerNorm(epsilon=1e-5, name="token_norm")(tok)
        for i in range(self.trunk_depth):
            # trunk blocks use default LayerNorm eps (1e-5) in the reference
            tok = Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                init_values=self.init_values,
                ln_eps=1e-5,
                name=f"trunk_{i}",
            )(tok)
        return nn.LayerNorm(epsilon=1e-5, name="trunk_norm")(tok)


class CameraDec(nn.Module):
    dim_in: int = 1536

    @nn.compact
    def __call__(self, feat):
        """feat: (B, S, C) camera tokens -> (B, S, 9) pose encoding."""
        B, S = feat.shape[:2]
        x = feat.reshape(B * S, -1).astype(jnp.float32)
        x = nn.Dense(self.dim_in, name="backbone_0")(x)
        x = jax.nn.relu(x)
        x = nn.Dense(self.dim_in, name="backbone_2")(x)
        x = jax.nn.relu(x)
        t = nn.Dense(3, name="fc_t")(x).reshape(B, S, 3)
        qvec = nn.Dense(4, name="fc_qvec")(x).reshape(B, S, 4)
        fov = jax.nn.relu(nn.Dense(2, name="fc_fov_0")(x)).reshape(B, S, 2)
        return jnp.concatenate([t, qvec, fov], axis=-1)
