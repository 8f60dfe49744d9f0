"""SECOND-style sparse middle encoder on the TPU sparse-conv ops.

Re-implementation of the reference SparseEncoder
(reference: mmdetection3d/mmdet3d/models/middle_encoders/
sparse_encoder.py:11-205 with the ResDet3D config — basicblock stages
(16,16,32)(32,32,64)(64,64,128)(128,128), sparse_shape [41,1440,1440],
conv_out (3,1,1)/(2,1,1) collapsing depth into BEV channels).

TPU design: each stage's submanifold convs share ONE neighbor map (the
reference reuses spconv 'indice keys' identically); strided convs derive
the next active set with a static cap. Batch norm uses masked statistics
so padding rows never pollute them — under pjit the batch mean IS the
global mean, which subsumes the reference's NaiveSyncBatchNorm allreduce
(mmdet3d/ops/norm.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recondet3d.ops.sparse_conv import (
    SparseTensor,
    build_neighbor_map,
    sort_by_column,
    sparse_conv_downsample,
    sparse_tensor_from_voxels,
    subm_conv_apply,
    to_dense_bev,
)

__all__ = ["SparseEncoder", "MaskedBatchNorm"]


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over (N, C) rows with a validity mask."""

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        if train:
            m = mask.astype(jnp.float32)[:, None]
            n = jnp.clip(jnp.sum(m), 1.0, None)
            mean = jnp.sum(x.astype(jnp.float32) * m, axis=0) / n
            var = jnp.sum(((x.astype(jnp.float32) - mean) ** 2) * m, axis=0) / n
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class _SubmConv(nn.Module):
    out_channels: int
    kernel: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, features, nbr_map):
        cin = features.shape[-1]
        K = nbr_map.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (K, cin, self.out_channels),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32) \
            if self.use_bias else None
        return subm_conv_apply(features, nbr_map, w, b)


class _SparseBasicBlock(nn.Module):
    """conv-bn-relu-conv-bn + residual + relu (reference sparse_block.py:68)."""

    channels: int

    @nn.compact
    def __call__(self, features, nbr_map, mask, train: bool):
        identity = features
        out = _SubmConv(self.channels, name="conv1")(features, nbr_map)
        out = MaskedBatchNorm(name="norm1")(out, mask, train)
        out = jax.nn.relu(out)
        out = _SubmConv(self.channels, name="conv2")(out, nbr_map)
        out = MaskedBatchNorm(name="norm2")(out, mask, train)
        out = jax.nn.relu(out + identity)
        return out


class _DownConv(nn.Module):
    """Strided SparseConv3d + BN + ReLU (make_sparse_convmodule)."""

    out_channels: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (2, 2, 2)
    padding: Tuple[int, int, int] = (1, 1, 1)
    max_out: int = 65536
    # the encoder keeps its active sets (b, y, x, z)-sorted, so the
    # column-parallel output ranking applies (sparse_conv.py)
    order: str = "col"

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool) -> SparseTensor:
        import numpy as np

        K = int(np.prod(self.kernel))
        cin = st.features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (K, cin, self.out_channels),
            jnp.float32,
        )
        out = sparse_conv_downsample(
            st, w, None, kernel=self.kernel, stride=self.stride,
            padding=self.padding, max_out=self.max_out, order=self.order,
        )
        feats = MaskedBatchNorm(name="norm")(out.features, out.valid, train)
        feats = jax.nn.relu(feats)
        feats = jnp.where(out.valid[:, None], feats, 0)
        return SparseTensor(feats, out.coords, out.grid, out.batch_size)


class SparseEncoder(nn.Module):
    in_channels: int = 3
    sparse_shape: Tuple[int, int, int] = (41, 1440, 1440)  # (Z, Y, X)
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = ((16, 16, 32), (32, 32, 64),
                                                 (64, 64, 128), (128, 128))
    encoder_paddings: Sequence = ((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0))
    block_type: str = "basicblock"
    # static active-voxel caps per resolution level (full, /2, /4, /8)
    stage_caps: Sequence[int] = (65536, 49152, 32768, 16384)

    @nn.compact
    def __call__(self, voxel_features, coors, batch_size: int, train: bool = False):
        """voxel_features (N, C), coors (N, 4) [b,z,y,x] (-1 pads) ->
        BEV features (B, Y/8, X/8, output_channels * Z_out)."""
        st = sparse_tensor_from_voxels(
            voxel_features, coors, tuple(self.sparse_shape), batch_size
        )
        # one (b,y,x,z) sort of the appearance-ordered voxelize output
        # unlocks the bit-packed column lookup for every map build below
        # (downsample outputs are ranked column-sorted by construction)
        st = sort_by_column(st)
        nbr = build_neighbor_map(st, 3, order="col")
        mask = st.valid

        # conv_input (subm conv + BN + ReLU)
        x = _SubmConv(self.base_channels, name="conv_input")(st.features, nbr)
        x = MaskedBatchNorm(name="conv_input_norm")(x, mask, train)
        x = jax.nn.relu(x)
        x = jnp.where(mask[:, None], x, 0)
        st = SparseTensor(x, st.coords, st.grid, st.batch_size)

        n_stages = len(self.encoder_channels)
        for i, blocks in enumerate(self.encoder_channels):
            blocks = tuple(blocks)
            for j, out_ch in enumerate(blocks):
                last = j == len(blocks) - 1
                if self.block_type == "basicblock" and last and i != n_stages - 1:
                    pad = self.encoder_paddings[i][j]
                    pad = tuple(pad) if isinstance(pad, (tuple, list)) else (pad,) * 3
                    st = _DownConv(
                        out_ch, kernel=(3, 3, 3), stride=(2, 2, 2), padding=pad,
                        max_out=self.stage_caps[min(i + 1, len(self.stage_caps) - 1)],
                        name=f"encoder_layer{i+1}_down",
                    )(st, train)
                    nbr = build_neighbor_map(st, 3, order="col")
                    mask = st.valid
                else:
                    feats = _SparseBasicBlock(
                        out_ch, name=f"encoder_layer{i+1}_block{j}"
                    )(st.features, nbr, mask, train)
                    feats = jnp.where(mask[:, None], feats, 0)
                    st = SparseTensor(feats, st.coords, st.grid, st.batch_size)

        # conv_out: (3,1,1)/(2,1,1) depth-collapsing conv + BN + ReLU
        st = _DownConv(
            self.output_channels, kernel=(3, 1, 1), stride=(2, 1, 1),
            padding=(0, 0, 0), max_out=self.stage_caps[-1], name="conv_out",
        )(st, train)
        return to_dense_bev(st)
