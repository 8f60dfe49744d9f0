"""BEV height-occupancy U-Net.

Re-implementation of the reference BEVHeightOccupancy
(reference: projects/mmdet3d_plugin/models/backbone/
sparse_refinement.py:25-258): input projection -> deep encoder
256->512->1024->2048 (stride-2 after the first stage) with channel
attention + optional residuals -> decoder with bilinear upsampling + skip
concat -> gradual 1x1 channel compression to the 32 height levels.
Outputs logits (B, H, W, 32) channels-last.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from recondet3d.utils.interpolation import resize_2d

__all__ = ["BEVHeightOccupancy"]


class _ChannelAttention(nn.Module):
    """GlobalAvgPool -> 1x1 conv -> ReLU -> 1x1 conv -> sigmoid."""

    channels: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = x.mean(axis=(1, 2), keepdims=True)
        g = nn.Conv(self.channels // 4, (1, 1), dtype=self.dtype, name="fc1")(g)
        g = jax.nn.relu(g)
        g = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(g)
        return jax.nn.sigmoid(g)


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=jnp.float32,
        )(x)


class BEVHeightOccupancy(nn.Module):
    in_channels: int = 256
    unet_channels: Sequence[int] = (256, 512, 1024, 2048)
    occ_feature_shape: Sequence[int] = (180, 180, 32)  # (X, Y, C)
    use_residual: bool = True
    use_attention: bool = True
    # The reference's channel-compression loop reaches the target channel
    # count inside a conv+BN+ReLU block, so its "logits" are ReLU'd (>= 0)
    # and BCE-with-logits can never push empty voxels below p=0.5 — training
    # provably collapses to p=0.5 with zero gradient (measured: loss pins at
    # 10*ln2, grad_norm -> 0). Default here: the last compression step is a
    # bare 1x1 conv producing unbounded logits; set True to reproduce the
    # reference quirk bit-for-bit (reference: sparse_refinement.py:155-176).
    bug_compatible_relu_logits: bool = False
    # computation dtype (params stay f32; BN statistics stay f32; the
    # final logits are emitted in f32)
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, in_channels) -> logits (B, H, W, occ_channels)."""
        conv = functools.partial(nn.Conv, dtype=self.dtype)
        ch = list(self.unet_channels)
        x = conv(ch[0], (1, 1), name="input_proj")(x.astype(self.dtype))

        enc_feats = [x]
        for i in range(len(ch) - 1):
            in_ch, out_ch = ch[i], ch[i + 1]
            h = enc_feats[-1]
            if i == 0:
                h = conv(in_ch, (3, 3), padding=1, name=f"enc{i}_conv1")(h)
                h = _BN(name=f"enc{i}_bn1")(h, train)
                h = jax.nn.relu(h)
                h = conv(out_ch, (3, 3), padding=1, name=f"enc{i}_conv2")(h)
            else:
                h = conv(out_ch, (3, 3), strides=2, padding=1, name=f"enc{i}_conv1")(h)
                h = _BN(name=f"enc{i}_bn1")(h, train)
                h = jax.nn.relu(h)
                h = conv(out_ch, (3, 3), padding=1, name=f"enc{i}_conv2")(h)
            h = _BN(name=f"enc{i}_bn2")(h, train)
            h = jax.nn.relu(h)
            if self.use_attention:
                h = h * _ChannelAttention(out_ch, dtype=self.dtype, name=f"attn{i}")(h)
            if self.use_residual and i != 0 and in_ch == out_ch:
                h = h + enc_feats[-1]
            enc_feats.append(h)

        # decoder (reference: sparse_refinement.py:184-252)
        h = enc_feats[-1]
        n_dec = len(ch) - 1
        for i in range(n_dec):
            if i == 0:
                out_ch = ch[-2]
            else:
                skip = enc_feats[len(enc_feats) - (i + 1)]
                h = resize_2d(h, skip.shape[1:3], mode="bilinear", align_corners=False)
                h = jnp.concatenate([h, skip], axis=-1)
                out_ch = ch[-(i + 2)]
            h = conv(out_ch, (3, 3), padding=1, name=f"dec{i}_conv1")(h)
            h = _BN(name=f"dec{i}_bn1")(h, train)
            h = jax.nn.relu(h)
            h = conv(out_ch, (3, 3), padding=1, name=f"dec{i}_conv2")(h)
            h = _BN(name=f"dec{i}_bn2")(h, train)
            h = jax.nn.relu(h)

        # gradual compression to the height channels
        target = self.occ_feature_shape[2]
        cur = ch[0]
        k = 0
        if self.bug_compatible_relu_logits:
            # reference-faithful: halve with conv+BN+ReLU until target is
            # reached INSIDE a ReLU block (logits >= 0 — see class docnote)
            while cur > target:
                nxt = max(cur // 2, target)
                h = conv(nxt, (1, 1), name=f"occ_head{k}_conv")(h)
                h = _BN(name=f"occ_head{k}_bn")(h, train)
                h = jax.nn.relu(h)
                cur = nxt
                k += 1
            if cur != target:
                h = nn.Conv(target, (1, 1), dtype=jnp.float32,
                            name="occ_head_final")(h)
            return h.astype(jnp.float32)
        # fixed: conv+BN+ReLU only while still ABOVE the target, then a bare
        # 1x1 conv emits unbounded logits
        while max(cur // 2, target) > target:
            nxt = max(cur // 2, target)
            h = conv(nxt, (1, 1), name=f"occ_head{k}_conv")(h)
            h = _BN(name=f"occ_head{k}_bn")(h, train)
            h = jax.nn.relu(h)
            cur = nxt
            k += 1
        return nn.Conv(target, (1, 1), dtype=jnp.float32,
                       name="occ_head_final")(h).astype(jnp.float32)
