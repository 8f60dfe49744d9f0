"""Sparse U-Net middle encoder (encoder-decoder over sparse voxels).

Re-implementation of the reference SparseUNet
(reference: mmdetection3d/mmdet3d/models/middle_encoders/sparse_unet.py —
SECOND-style encoder + a decoder whose stages run a lateral
SparseBasicBlock, concat-merge with the upsampled bottom features,
channel-reduction residual (:150-190), and an inverse conv back to the
finer active set). Returns per-point ("seg") features on the full-res
active set plus the BEV map from conv_out, like the reference.

TPU notes: the decoder's inverse conv reuses the encoder's saved active
sets — children rows come from one merged-sort lookup (no hash tables),
and the conv itself is the scatter-form GEMM (coarse voxels scatter into
their fine children).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recondet3d.models.refine.sparse_encoder import MaskedBatchNorm, _DownConv, _SparseBasicBlock, _SubmConv
from recondet3d.ops.sparse_conv import (
    SparseTensor,
    _kernel_offsets,
    _linear_ids,
    _lookup_rows,
    build_neighbor_map,
    sparse_tensor_from_voxels,
    to_dense_bev,
)

__all__ = ["SparseUNet"]


def _children_map(coarse: SparseTensor, fine: SparseTensor, kernel=3, stride=2,
                  padding=1):
    """(M_coarse, K) rows into the FINE active set: child(m, δ) = m*s+δ-pad."""
    kernel = (kernel,) * 3 if isinstance(kernel, int) else kernel
    stride = (stride,) * 3 if isinstance(stride, int) else stride
    padding = (padding,) * 3 if isinstance(padding, int) else padding
    Z, Y, X = fine.grid
    offsets = jnp.asarray(_kernel_offsets(kernel), jnp.int32)
    s = jnp.asarray(stride, jnp.int32)
    p = jnp.asarray(padding, jnp.int32)
    child_zyx = coarse.coords[:, None, 1:4] * s + offsets[None] - p
    ok = jnp.all(
        (child_zyx >= 0) & (child_zyx < jnp.asarray([Z, Y, X], jnp.int32)), axis=-1
    ) & coarse.valid[:, None]
    b = coarse.coords[:, 0:1]
    cand = (
        ((b * Z + child_zyx[..., 0]) * Y + child_zyx[..., 1]) * X + child_zyx[..., 2]
    ).astype(jnp.int32)
    sentinel = jnp.int32(fine.batch_size * Z * Y * X)
    cand = jnp.where(ok, cand, sentinel)
    fine_ids = _linear_ids(fine.coords, fine.grid, fine.batch_size)
    n_cells = fine.batch_size * Z * Y * X
    from recondet3d.ops.sparse_conv import (
        _DENSE_LOOKUP_MAX_CELLS,
        _dense_lookup_rows,
    )

    if n_cells <= _DENSE_LOOKUP_MAX_CELLS:
        rows = _dense_lookup_rows(fine_ids, cand.reshape(-1), sentinel, n_cells)
    else:
        rows = _lookup_rows(fine_ids, cand.reshape(-1), sentinel)
    return rows.reshape(coarse.coords.shape[0], -1)


class _InverseConv(nn.Module):
    """Coarse -> fine sparse 'deconv' (scatter form)."""

    out_channels: int

    @nn.compact
    def __call__(self, coarse_feats, children_rows, n_fine: int, train: bool,
                 fine_valid=None):
        M, K = children_rows.shape
        Cin = coarse_feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (K, Cin, self.out_channels), jnp.float32,
        )
        contrib = jax.lax.dot_general(
            coarse_feats, w.astype(coarse_feats.dtype).transpose(1, 0, 2).reshape(Cin, K * self.out_channels),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(coarse_feats.dtype).reshape(M, K, self.out_channels)
        out = jnp.zeros((n_fine + 1, self.out_channels), coarse_feats.dtype)
        out = out.at[children_rows.reshape(-1)].add(
            contrib.reshape(M * K, -1), mode="drop"
        )[:n_fine]
        out = MaskedBatchNorm(name="norm")(out,
                                           fine_valid if fine_valid is not None
                                           else jnp.ones(n_fine, bool), train)
        return jax.nn.relu(out)


class SparseUNet(nn.Module):
    in_channels: int = 4
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = ((16,), (32, 32, 32),
                                                 (64, 64, 64), (64, 64, 64))
    decoder_channels: Sequence[Sequence[int]] = ((64, 64, 64), (64, 64, 32),
                                                 (32, 32, 16), (16, 16, 16))
    stage_caps: Sequence[int] = (32768, 24576, 16384, 8192)

    @nn.compact
    def __call__(self, voxel_features, coors, batch_size: int, train: bool = False):
        """Returns (seg_features (N, C_dec) on the full-res active set,
        spatial BEV features (B, Y', X', C*Z'))."""
        st = sparse_tensor_from_voxels(
            voxel_features, coors, tuple(self.sparse_shape), batch_size
        )
        nbr = build_neighbor_map(st, 3)
        x = _SubmConv(self.base_channels, name="conv_input")(st.features, nbr)
        x = MaskedBatchNorm(name="conv_input_norm")(x, st.valid, train)
        x = jax.nn.relu(x)
        st = SparseTensor(jnp.where(st.valid[:, None], x, 0), st.coords, st.grid,
                          st.batch_size)

        # encoder: each stage = subm blocks then stride-2 down (except first)
        skips = []
        nbrs = [nbr]
        for i, blocks in enumerate(self.encoder_channels):
            if i > 0:
                skips.append(st)
                st = _DownConv(
                    tuple(blocks)[0], max_out=self.stage_caps[min(i, len(self.stage_caps) - 1)],
                    name=f"enc{i}_down",
                )(st, train)
                nbr = build_neighbor_map(st, 3)
                nbrs.append(nbr)
            for j, c in enumerate(tuple(blocks)):
                f = _SparseBasicBlock(c, name=f"enc{i}_block{j}")(
                    st.features, nbr, st.valid, train
                )
                st = SparseTensor(jnp.where(st.valid[:, None], f, 0), st.coords,
                                  st.grid, st.batch_size)

        bev = None
        # conv_out on the deepest level -> BEV (reference conv_out (3,1,1)/(2,1,1))
        deep = _DownConv(self.output_channels, kernel=(3, 1, 1), stride=(2, 1, 1),
                         padding=(0, 0, 0), max_out=self.stage_caps[-1],
                         name="conv_out")(st, train)
        bev = to_dense_bev(deep)

        # decoder: lateral block on the skip, inverse-conv the bottom up,
        # concat-merge + residual (reference decoder_layer_forward)
        for di, blocks in enumerate(self.decoder_channels[:-1]):
            skip = skips[-(di + 1)]
            skip_nbr = nbrs[-(di + 2)]
            c_out = tuple(self.decoder_channels[di + 1])[0] if di + 1 < len(
                self.decoder_channels) else tuple(blocks)[-1]
            c_mid = tuple(blocks)[0]
            lateral = _SparseBasicBlock(skip.features.shape[-1],
                                        name=f"dec{di}_lateral")(
                skip.features, skip_nbr, skip.valid, train
            )
            children = _children_map(st, skip)
            up = _InverseConv(c_mid, name=f"dec{di}_up")(
                st.features, children, skip.features.shape[0], train, skip.valid
            )
            merged = jnp.concatenate([up, lateral], axis=-1)
            merged = _SubmConv(c_mid, name=f"dec{di}_merge")(merged, skip_nbr)
            merged = MaskedBatchNorm(name=f"dec{di}_merge_norm")(merged, skip.valid, train)
            merged = jax.nn.relu(merged) + up
            merged = jnp.where(skip.valid[:, None], merged, 0)
            st = SparseTensor(merged, skip.coords, skip.grid, skip.batch_size)
        return st.features, bev
