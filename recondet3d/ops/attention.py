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

The backward pass is a pair of Pallas kernels (the standard two-pass
flash scheme): the forward additionally emits the per-row logsumexp, the
VJP precomputes ``delta = rowsum(dO * O)`` and then one kernel produces
dQ (loop over KV blocks) and one produces dK/dV (loop over Q blocks) —
no (N, N) matrix in HBM in either direction. This unlocks DA3
fine-tuning; the frozen ResDet3D path never calls it.
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


def _flash_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale,
                  block_k, kv_blocks, n_pad):
    """One (batch*head, q_block) program: online softmax over KV blocks.
    Also emits the per-row logsumexp (softmax stats for the backward).

    The QK^T and PV dots keep their operands in the INPUT dtype (bf16 in
    production) with fp32 accumulation: the v5e MXU runs bf16 x bf16 ->
    f32 at full rate but decomposes f32 x f32 into multiple passes, so
    casting the operands up costs ~4x MXU throughput. Softmax stats
    (m, l, lse) and the accumulator stay fp32.

    ``n_pad >= 0`` is the padding-only fast path (no per-batch kv_len):
    the per-element column mask is a leading VPU cost at the production
    shapes (iota+cmp+select over BQ x KV f32 — comparable to the dots'
    MXU floor at D=64). With a STATIC pad boundary it collapses to one
    (1, KV) -inf bias row built once per program and broadcast-added to
    s (1 op/element instead of 3), exact in all cases. ``n_pad < 0``
    keeps the per-element masked path (per-batch kv_len).

    The logit scale is likewise folded into q once per q-block (BQ x D
    elements) instead of into s (BQ x KV) — exact when scale is a power
    of two (all production head dims: D=64 -> 0.125); otherwise one
    extra input-dtype rounding, below the dots' own bf16 noise."""
    q = q_ref[0]  # (BQ, D), input dtype
    bq, d = q.shape
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    kv_real = kv_blocks * block_k - max(n_pad, 0)
    if n_pad < 0:
        kv_len = kvlen_ref[pl.program_id(0)]

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)

    def body(kb, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            qs, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK) fp32, pre-scaled
        if n_pad < 0:
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1
            )
            s = jnp.where(col < kv_len, s, _NEG_INF)
        elif n_pad > 0:
            # (1, BK) -inf bias row, broadcast-added: 3 ops over BK
            # elements + 1 op/element, vs the masked path's 3 ops/element
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            s = s + jnp.where(col < kv_real, 0.0, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc, m, l = jax.lax.fori_loop(0, kv_blocks, body, (acc0, m0, l0))
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # lane-broadcast to the stat width (a block whose last dim equals the
    # array's is legal at any width); readers slice a column
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (bq, _STAT_LANES))


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
        n_pad_mode = m_pad  # pad-correction fast path (>= 0)
    else:
        kv_len_arr = kv_len.astype(jnp.int32)
        n_pad_mode = -1  # per-batch kv_len -> masked path
    kv_len_bh = jnp.repeat(kv_len_arr, H)  # (B*H,)

    kv_blocks = Mp // block_k
    grid = (B * H, Np // block_q)

    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, kv_blocks=kv_blocks,
            n_pad=n_pad_mode,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, Mp, D), lambda bh, iq, *_: (bh, 0, 0)),
                pl.BlockSpec((1, Mp, D), lambda bh, iq, *_: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda bh, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, block_q, _STAT_LANES),
                             lambda bh, iq, *_: (bh, iq, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Np, _STAT_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(kv_len_bh, qp, kp, vp)

    return out.reshape(B, H, Np, D)[:, :, :N, :], lse[:, :, 0].reshape(B, H, Np)


_STAT_LANES = 8  # lse/delta are broadcast to 8 lanes so kernels read
                 # (block, 8) tiles and slice a column — no relayouts, and
                 # 16x less VMEM than a 128-lane broadcast


def _flash_bwd_dq_kernel(kvlen_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, *, scale, block_k, kv_blocks,
                         masked):
    """One (batch*head, q_block) program: dQ = (P * (dO V^T - delta)) K.

    Dots keep operands in the input dtype (full-rate bf16 MXU, see the
    forward kernel); softmax/delta algebra stays fp32.

    ``masked=False`` (no per-batch kv_len) drops the per-element column
    mask exactly: a ZERO-padded column's unmasked p = exp(-lse) is finite
    and its dq contribution is ds[:, j] * k[j, :] = ds[:, j] * 0 = 0.
    The logit scale is folded into q (BQ x D) instead of s (BQ x KV);
    the trailing chain-rule ``acc * scale`` is unrelated and stays."""
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]      # (BQ, 1)
    delta = delta_ref[0][:, :1]  # (BQ, 1)
    if masked:
        kv_len = kvlen_ref[pl.program_id(0)]
    bq, d = q.shape
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)

    def body(kb, acc):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            qs, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if masked:
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1
            )
            p = jnp.where(col < kv_len, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(k_blk.dtype)
        return acc + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, kv_blocks, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(kvlen_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, *, scale, block_q,
                          q_blocks, masked):
    """One (batch*head, kv_block) program: dV = P^T dO, dK = dS^T Q.

    Dots keep operands in the input dtype (full-rate bf16 MXU, see the
    forward kernel); softmax/delta algebra stays fp32.

    ``masked=False`` (no per-batch kv_len) drops the per-element column
    mask exactly: unmasked padded COLUMNS only pollute the padded dk/dv
    ROWS, which the caller slices away ([:M]); padded q rows contribute
    exact zeros as before (do rows are zero)."""
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]
    if masked:
        kv_len = kvlen_ref[pl.program_id(0)]
    bk, d = k.shape
    base = pl.program_id(1) * bk

    def body(qb, carry):
        dk_acc, dv_acc = carry
        sl = pl.ds(qb * block_q, block_q)
        q_blk = q_ref[0, sl, :]
        do_blk = do_ref[0, sl, :]
        lse_blk = lse_ref[0, sl, :1]
        delta_blk = delta_ref[0, sl, :1]
        qs = (q_blk.astype(jnp.float32) * scale).astype(q_blk.dtype)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK), pre-scaled
        if masked:
            col = base + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bk), 1
            )
            p = jnp.where(col < kv_len, jnp.exp(s - lse_blk), 0.0)
        else:
            p = jnp.exp(s - lse_blk)
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta_blk)).astype(q_blk.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_acc, dv_acc

    zero = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, q_blocks, body, (zero, zero))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_attention_bwd_impl(q, k, v, kv_len, out, lse, g, scale, block_q,
                              block_k, interpret):
    B, H, N, D = q.shape
    M = k.shape[2]
    n_pad = (-N) % block_q
    m_pad = (-M) % block_k
    Np, Mp = N + n_pad, M + m_pad

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad), (0, 0))).reshape(B * H, Np, D)
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, n_pad), (0, 0))).reshape(B * H, Np, D)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, m_pad), (0, 0))).reshape(B * H, Mp, D)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, m_pad), (0, 0))).reshape(B * H, Mp, D)

    # delta_i = sum_d dO_id * O_id (fp32), padded rows are zero
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, n_pad))).reshape(B * H, Np)
    # lse arrives at the FORWARD's padded length (its block_q choice, not
    # ours) — slice to the real rows and re-pad to THIS kernel's multiple.
    # Zero-padding is safe: the extra rows' q and dO are zero, so p=exp(-0)
    # rows meet dp=delta=0 and contribute exact zeros to dK/dV.
    lse_p = jnp.pad(
        lse[:, :, :N], ((0, 0), (0, 0), (0, n_pad))
    ).reshape(B * H, Np)
    lse_b = jnp.broadcast_to(lse_p[..., None], (B * H, Np, _STAT_LANES))
    delta_b = jnp.broadcast_to(delta[..., None], (B * H, Np, _STAT_LANES))

    if kv_len is None:
        kv_len_arr = jnp.full((B,), M, jnp.int32)
    else:
        kv_len_arr = kv_len.astype(jnp.int32)
    kv_len_bh = jnp.repeat(kv_len_arr, H)

    full_kv = pl.BlockSpec((1, Mp, D), lambda bh, i, *_: (bh, 0, 0))
    full_q = pl.BlockSpec((1, Np, D), lambda bh, i, *_: (bh, 0, 0))
    blk_q = pl.BlockSpec((1, block_q, D), lambda bh, i, *_: (bh, i, 0))
    blk_kv = pl.BlockSpec((1, block_k, D), lambda bh, i, *_: (bh, i, 0))
    blk_stat = pl.BlockSpec((1, block_q, _STAT_LANES),
                            lambda bh, i, *_: (bh, i, 0))
    full_stat = pl.BlockSpec((1, Np, _STAT_LANES), lambda bh, i, *_: (bh, 0, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, block_k=block_k,
                          kv_blocks=Mp // block_k, masked=kv_len is not None),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, Np // block_q),
            in_specs=[blk_q, full_kv, full_kv, blk_q, blk_stat, blk_stat],
            out_specs=blk_q,
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_len_bh, qp, kp, vp, gp, lse_b, delta_b)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, block_q=block_q,
                          q_blocks=Np // block_q, masked=kv_len is not None),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, Mp // block_k),
            in_specs=[full_q, blk_kv, blk_kv, full_q, full_stat, full_stat],
            out_specs=[blk_kv, blk_kv],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Mp, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Mp, D), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_len_bh, qp, kp, vp, gp, lse_b, delta_b)

    dq = dq.reshape(B, H, Np, D)[:, :, :N, :]
    dk = dk.reshape(B, H, Mp, D)[:, :, :M, :]
    dv = dv.reshape(B, H, Mp, D)[:, :, :M, :]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_attention(q, k, v, kv_len, scale, block_q, block_k, interpret,
                     block_q_bwd, block_k_bwd):
    out, _ = _flash_attention_fwd_impl(q, k, v, kv_len, scale, block_q, block_k, interpret)
    return out


def _fwd(q, k, v, kv_len, scale, block_q, block_k, interpret,
         block_q_bwd, block_k_bwd):
    out, lse = _flash_attention_fwd_impl(q, k, v, kv_len, scale, block_q, block_k, interpret)
    return out, (q, k, v, kv_len, out, lse)


def _bwd(scale, block_q, block_k, interpret, block_q_bwd, block_k_bwd, res, g):
    q, k, v, kv_len, out, lse = res
    dq, dk, dv = _flash_attention_bwd_impl(
        q, k, v, kv_len, out, lse, g, scale, block_q_bwd, block_k_bwd,
        interpret
    )
    return dq, dk, dv, None


_flash_attention.defvjp(_fwd, _bwd)


# single-KV-iteration VMEM ceiling: the fp32 (block_q, Mp) logits tile at
# bq=256, Mp=8192 is 8 MB — beyond that fall back to a looped block_k
_FULL_KV_MAX = 8192


def _auto_blocks(n_q: int, n_kv: int):
    """Shape-adaptive (block_q, block_k), measured on v5e at the DA3
    production shapes (scripts/bench_flash_blocks.py): bq=256 minimizes
    the query padding tax (721 -> 768 instead of the 512-default's 1024,
    i.e. 1.13x instead of 2x attention work), and a single KV iteration
    (block_k = the whole padded KV) removes the online-softmax loop
    bookkeeping — together 1.4-1.7x over the old 512/512 default at both
    the local (N=721) and global (N=4326) nested-giant shapes."""
    bq = 256
    mp = max(128, -(-n_kv // 128) * 128)
    bk = mp if mp <= _FULL_KV_MAX else 1024
    return bq, bk


def _auto_blocks_bwd(n_q: int, n_kv: int):
    """Measured backward defaults (scripts/bench_flash_blocks.py --bwd,
    v5e, vitl fine-tune shapes): bq_bwd=256 (the 512 default's 721->1024
    re-pad is pure waste), and a single-KV-block dK/dV grid wins where
    the fp32 logits tile fits (global N=4326: 4.43 ms vs 6.83 at bk=512,
    30.8% of bf16 peak fwd+bwd)."""
    bq = 256
    mp = max(128, -(-n_kv // 128) * 128)
    bk = mp if mp <= _FULL_KV_MAX else 512
    return bq, bk


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    impl: str = "auto",
    block_q_bwd: Optional[int] = None,
    block_k_bwd: Optional[int] = None,
) -> jnp.ndarray:
    """Flash attention over (B, H, N, D) tensors.

    impl: 'pallas' | 'xla' | 'auto' (pallas on TPU, xla elsewhere).
    block_q/block_k default to the measured shape-adaptive choice
    (``_auto_blocks``); block_q_bwd/block_k_bwd control the backward
    kernels separately (default ``_auto_blocks_bwd`` — measured bq=256 +
    single-KV-block dK/dV where the logits tile fits).
    """
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return attention_xla(q, k, v, kv_len=kv_len, scale=scale)
    interpret = impl == "interpret" or jax.default_backend() != "tpu"
    auto_q, auto_k = _auto_blocks(q.shape[2], k.shape[2])
    block_q = auto_q if block_q is None else block_q
    block_k = auto_k if block_k is None else block_k
    bq = min(block_q, max(128, 1 << (q.shape[2] - 1).bit_length())) if q.shape[2] < block_q else block_q
    bk = min(block_k, max(128, 1 << (k.shape[2] - 1).bit_length())) if k.shape[2] < block_k else block_k
    auto_qb, auto_kb = _auto_blocks_bwd(q.shape[2], k.shape[2])
    bq_b = auto_qb if block_q_bwd is None else block_q_bwd
    bk_b = auto_kb if block_k_bwd is None else block_k_bwd
    bq_b = min(bq_b, max(128, 1 << (q.shape[2] - 1).bit_length())) if q.shape[2] < bq_b else bq_b
    bk_b = min(bk_b, max(128, 1 << (k.shape[2] - 1).bit_length())) if k.shape[2] < bk_b else bk_b
    return _flash_attention(q, k, v, kv_len, scale, bq, bk, interpret,
                            bq_b, bk_b)


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
