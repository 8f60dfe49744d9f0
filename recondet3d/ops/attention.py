"""Flash attention as a Pallas TPU kernel.

This is the kernel behind every ViT block in the DA3 backbone — the
reference uses ``F.scaled_dot_product_attention`` / xformers
(reference: depth_anything_3/model/utils/attention.py:57 and
model/dinov2/layers/attention.py:59-60). On TPU the same role is played
by an online-softmax flash attention written in Pallas: one pass over KV
blocks per query block, logits in fp32 on the MXU, no (N, N) score matrix
ever materialized in HBM.

Supports right-padding via ``kv_len``/``q_len`` so callers can pad token
counts (e.g. 1297 -> 1408) to hardware-aligned sizes with exact masking.

The backward pass is provided through ``jax.custom_vjp`` with an XLA
recompute implementation (the DA3 backbone is frozen in the ResDet3D
training path, so forward speed dominates).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "attention_xla", "multi_head_attention"]

_NEG_INF = -1e30


def attention_xla(q, k, v, kv_len=None, scale=None):
    """Reference XLA attention: softmax(q k^T * scale) v, fp32 logits.

    q,k,v: (B, H, N, D) / (B, H, M, D). kv_len: optional (B,) int32 —
    keys at index >= kv_len are masked out.
    """
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    logits = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits * scale
    if kv_len is not None:
        m = jnp.arange(k.shape[2])[None, None, None, :] < kv_len[:, None, None, None]
        logits = jnp.where(m, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", weights, v.astype(jnp.float32)).astype(q.dtype)


def _flash_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, *, scale, block_k, kv_blocks):
    """One (batch*head, q_block) program: online softmax over KV blocks."""
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, D)
    bq, d = q.shape
    kv_len = kvlen_ref[pl.program_id(0)]

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)

    def body(kb, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc, m, l = jax.lax.fori_loop(0, kv_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_attention_fwd_impl(q, k, v, kv_len, scale, block_q, block_k, interpret):
    B, H, N, D = q.shape
    M = k.shape[2]
    n_pad = (-N) % block_q
    m_pad = (-M) % block_k
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, m_pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, m_pad), (0, 0)))
    Np, Mp = N + n_pad, M + m_pad

    qp = qp.reshape(B * H, Np, D)
    kp = kp.reshape(B * H, Mp, D)
    vp = vp.reshape(B * H, Mp, D)

    if kv_len is None:
        kv_len_arr = jnp.full((B,), M, jnp.int32)
    else:
        kv_len_arr = kv_len.astype(jnp.int32)
    kv_len_bh = jnp.repeat(kv_len_arr, H)  # (B*H,)

    kv_blocks = Mp // block_k
    grid = (B * H, Np // block_q)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, kv_blocks=kv_blocks
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, Mp, D), lambda bh, iq, *_: (bh, 0, 0)),
                pl.BlockSpec((1, Mp, D), lambda bh, iq, *_: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda bh, iq, *_: (bh, iq, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
        interpret=interpret,
    )(kv_len_bh, qp, kp, vp)

    return out.reshape(B, H, Np, D)[:, :, :N, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, kv_len, scale, block_q, block_k, interpret):
    return _flash_attention_fwd_impl(q, k, v, kv_len, scale, block_q, block_k, interpret)


def _fwd(q, k, v, kv_len, scale, block_q, block_k, interpret):
    out = _flash_attention_fwd_impl(q, k, v, kv_len, scale, block_q, block_k, interpret)
    return out, (q, k, v, kv_len)


def _bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, kv_len = res

    def f(q_, k_, v_):
        return attention_xla(q_, k_, v_, kv_len=kv_len, scale=scale)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    impl: str = "auto",
) -> jnp.ndarray:
    """Flash attention over (B, H, N, D) tensors.

    impl: 'pallas' | 'xla' | 'auto' (pallas on TPU, xla elsewhere).
    """
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return attention_xla(q, k, v, kv_len=kv_len, scale=scale)
    interpret = impl == "interpret" or jax.default_backend() != "tpu"
    bq = min(block_q, max(128, 1 << (q.shape[2] - 1).bit_length())) if q.shape[2] < block_q else block_q
    bk = min(block_k, max(128, 1 << (k.shape[2] - 1).bit_length())) if k.shape[2] < block_k else block_k
    return _flash_attention(q, k, v, kv_len, scale, bq, bk, interpret)


def multi_head_attention(x, qkv_w, qkv_b, proj_w, proj_b, num_heads, **kwargs):
    """Fused qkv projection + flash attention + output projection for
    (B, N, C) token tensors (the DA3 attention layer's compute path)."""
    B, N, C = x.shape
    qkv = x @ qkv_w + qkv_b  # (B, N, 3C)
    qkv = qkv.reshape(B, N, 3, num_heads, C // num_heads)
    q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
    o = flash_attention(q, k, v, **kwargs)
    o = jnp.moveaxis(o, 1, 2).reshape(B, N, C)
    return o @ proj_w + proj_b
