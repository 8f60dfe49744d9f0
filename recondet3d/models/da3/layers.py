"""DINOv2 ViT building blocks in flax.linen, TPU dtype-policy aware.

Re-implementation (not a port) of the reference layer set
(reference: depth_anything_3/model/dinov2/layers/{block,attention,mlp,
swiglu_ffn,layer_scale,patch_embed,rope}.py). Differences by design:

- channels-last (NHWC) everywhere; patch embed is a 14x14/14 conv the MXU
  tiles directly.
- attention runs through the Pallas flash kernel
  (recondet3d/ops/attention.py) instead of SDPA/xformers.
- matmuls run in a configurable ``compute_dtype`` (bf16 on TPU — the
  reference wraps the backbone in torch.autocast(bf16), api.py:116-148);
  layernorms/softmax stay fp32 like autocast does.
- 2D RoPE is computed closed-form from integer positions (the reference
  caches sin/cos tables and gathers; same values).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from recondet3d.ops.attention import flash_attention

__all__ = [
    "Mlp",
    "SwiGLUFFNFused",
    "LayerScale",
    "PatchEmbed",
    "Attention",
    "Block",
    "rope_2d",
    "LayerNormFp32",
]


class LayerNormFp32(nn.Module):
    """LayerNorm computed in fp32 (autocast semantics), cast back to input dtype."""

    epsilon: float = 1e-6
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon,
            use_bias=self.use_bias,
            use_scale=self.use_scale,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(dtype)


def _gelu_exact(x):
    # torch nn.GELU default is the exact erf form (jax defaults to tanh approx)
    return jax.nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = _gelu_exact
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        return x


class SwiGLUFFNFused(nn.Module):
    """SwiGLU FFN with the xformers-compatible fused w12 layout and the
    2/3-rounded-to-8 hidden size rule (reference: swiglu_ffn.py:36-60)."""

    hidden_features: int  # pre-adjustment value (dim * mlp_ratio)
    out_features: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = self.out_features or x.shape[-1]
        hidden = (int(self.hidden_features * 2 / 3) + 7) // 8 * 8
        x12 = nn.Dense(2 * hidden, dtype=self.dtype, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(out, dtype=self.dtype, name="w3")(nn.silu(x1) * x2)


class LayerScale(nn.Module):
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (x.shape[-1],), jnp.float32
        )
        return x * gamma.astype(x.dtype)


class PatchEmbed(nn.Module):
    """(B, H, W, 3) -> (B, N, C) via patch-size conv (reference patch_embed.py)."""

    patch_size: int = 14
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        return x.reshape(B, (H // p) * (W // p), self.embed_dim)


def rope_2d(tokens: jnp.ndarray, positions: jnp.ndarray, base_frequency: float = 100.0):
    """2D rotary embedding on (B, H, N, D) given integer positions (B, N, 2).

    Head dim split in half for (y, x); each half rotated 1D-RoPE style
    (reference: model/dinov2/layers/rope.py:63-200 — same math, computed
    closed-form instead of via cached embedding tables).
    """
    D = tokens.shape[-1]
    d = D // 2  # per spatial axis
    exponents = jnp.arange(0, d, 2, dtype=jnp.float32) / d
    inv_freq = 1.0 / (base_frequency ** exponents)  # (d/2,)

    def rot_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    def apply_axis(tok, pos_1d):
        # tok: (B, H, N, d); pos_1d: (B, N)
        ang = pos_1d[..., None].astype(jnp.float32) * inv_freq  # (B, N, d/2)
        ang = jnp.concatenate([ang, ang], axis=-1)  # (B, N, d)
        cos = jnp.cos(ang)[:, None].astype(tok.dtype)
        sin = jnp.sin(ang)[:, None].astype(tok.dtype)
        return tok * cos + rot_half(tok) * sin

    ty, tx = jnp.split(tokens, 2, axis=-1)
    return jnp.concatenate(
        [apply_axis(ty, positions[..., 0]), apply_axis(tx, positions[..., 1])], axis=-1
    )


def rope_tables(positions: jnp.ndarray, D: int, base_frequency: float = 100.0):
    """Precompute the 2D-RoPE (cos, sin) tables for ``rope_2d``-identical
    rotation: positions (..., N, 2) -> two f32 tables (..., N, D).

    In a ViT where every rope block shares one position grid (the DA3
    backbone: one local grid, one all-ones global grid), computing the
    tables once and applying them per block measured ~0.4 ms/block
    cheaper than the closed-form ``rope_2d`` at nested-giant global
    shapes (scripts/bench_qk_prep.py) — the transcendentals and their
    awkward (…, D=64)-minor layouts leave the per-block path."""
    d = D // 2
    exponents = jnp.arange(0, d, 2, dtype=jnp.float32) / d
    inv_freq = 1.0 / (base_frequency ** exponents)  # (D/4,)
    ang_y = positions[..., 0:1].astype(jnp.float32) * inv_freq
    ang_x = positions[..., 1:2].astype(jnp.float32) * inv_freq
    ang = jnp.concatenate([ang_y, ang_y, ang_x, ang_x], axis=-1)  # (..., D)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_tables(tokens: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Apply precomputed ``rope_tables`` to (B, H, N, D) tokens; exact
    match of ``rope_2d`` (asserted on-chip in scripts/bench_qk_prep.py
    and in test_attention.py)."""
    shape = tokens.shape
    D = shape[-1]
    t = tokens.reshape(*shape[:-1], 2, 2, D // 4)
    rot = jnp.stack([-t[..., 1, :], t[..., 0, :]], axis=-2).reshape(shape)
    cos = cos.astype(tokens.dtype)
    sin = sin.astype(tokens.dtype)
    return tokens * cos + rot * sin


class Attention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    qk_norm: bool = False
    use_rope: bool = False
    rope_freq: float = 100.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, pos=None, kv_len=None, rope_tabs=None):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, D)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]  # (B, H, N, D)
        if self.qk_norm:
            # reference: norm_layer(head_dim) with default eps 1e-5
            q = LayerNormFp32(epsilon=1e-5, name="q_norm")(q)
            k = LayerNormFp32(epsilon=1e-5, name="k_norm")(k)
        if self.use_rope and rope_tabs is not None:
            # precomputed shared tables (rope_2d-identical, cheaper per
            # block — see rope_tables)
            cos, sin = rope_tabs
            q = apply_rope_tables(q, cos, sin)
            k = apply_rope_tables(k, cos, sin)
        elif self.use_rope and pos is not None:
            q = rope_2d(q, pos, self.rope_freq)
            k = rope_2d(k, pos, self.rope_freq)
        o = flash_attention(q, k, v, kv_len=kv_len, impl=self.attn_impl)
        o = jnp.moveaxis(o, 1, 2).reshape(B, N, C)
        return nn.Dense(C, use_bias=self.proj_bias, dtype=self.dtype, name="proj")(o)


class Block(nn.Module):
    """Pre-norm transformer block with LayerScale (reference block.py:26)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    init_values: Optional[float] = 1.0
    qk_norm: bool = False
    use_rope: bool = False
    rope_freq: float = 100.0
    ffn_layer: str = "mlp"  # 'mlp' | 'swiglufused'
    ln_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # rematerialize only the attention sub-path (QKV projections + flash
    # forward recomputed on the backward; FFN activations stay saved) —
    # the 'attn' remat policy of DinoViT
    remat_attn: bool = False

    @nn.compact
    def __call__(self, x, pos=None, kv_len=None, rope_tabs=None):
        C = x.shape[-1]
        attn_cls = (
            nn.remat(Attention, prevent_cse=True) if self.remat_attn
            else Attention
        )
        h = attn_cls(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            proj_bias=self.proj_bias,
            qk_norm=self.qk_norm,
            use_rope=self.use_rope,
            rope_freq=self.rope_freq,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )(LayerNormFp32(epsilon=self.ln_eps, name="norm1")(x), pos=pos,
          kv_len=kv_len, rope_tabs=rope_tabs)
        if self.init_values is not None:
            h = LayerScale(self.init_values, name="ls1")(h)
        x = x + h

        h2 = LayerNormFp32(epsilon=self.ln_eps, name="norm2")(x)
        if self.ffn_layer == "swiglufused":
            h2 = SwiGLUFFNFused(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(h2)
        else:
            h2 = Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(h2)
        if self.init_values is not None:
            h2 = LayerScale(self.init_values, name="ls2")(h2)
        return x + h2
