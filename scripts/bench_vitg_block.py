#!/usr/bin/env python
"""Microbench of ONE ViT-giant block at nested-giant production shapes
(6 views x 721 tokens = 280x504/14^2 + cls, d=1536, 24 heads,
swiglufused) to locate the gap between the measured vitg backbone
(~147 ms / ~42% MXU) and the vitl path's 71%.

Variants toggle the non-GEMM pieces (qk-norm, RoPE, LayerNorm/LayerScale)
and isolate the raw GEMM stack, the flash attention call, and the
local/global layouts. All timings use the in-jit lax.scan amortization
(every piece here is cheaper than the ~24 ms tunnel round trip).
Usage: python scripts/bench_vitg_block.py [iters] [repeats]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import _timing  # noqa: E402
from recondet3d.models.da3.layers import Block, rope_tables  # noqa: E402

S, N_LOCAL, C, H = 6, 721, 1536, 24
D = C // H
N_GLOBAL = S * N_LOCAL


def timeit(name, fn, *args, iters=5, repeats=16, flops=None):
    dt = _timing.timeit_scan(None, fn, *args, repeats=repeats, iters=iters)
    tail = ""
    if flops and dt > 0:
        tail = (f"  {flops/1e12:6.2f} TFLOP"
                f"  {flops/(dt*1e-3)/_timing.V5E_BF16_PEAK*100:5.1f}% peak")
    print(f"{name:42s} {dt:8.3f} ms{tail}", flush=True)
    return dt


def block_flops(N, attn=True):
    lin = 2 * N * C * (3 * C + C + 2 * 4096 + 4096)  # qkv+proj+w12+w3
    att = 2 * 2 * N * N * D * H if attn else 0
    return lin + att


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = jax.random.PRNGKey(0)

    def block(qk_norm, use_rope, name):
        return Block(
            num_heads=H, mlp_ratio=4.0, qk_norm=qk_norm, use_rope=use_rope,
            ffn_layer="swiglufused", dtype=jnp.bfloat16, attn_impl="auto",
            name=name,
        )

    x_local = jax.random.normal(rng, (S, N_LOCAL, C), jnp.bfloat16)
    x_global = jax.random.normal(rng, (1, N_GLOBAL, C), jnp.bfloat16)
    # production rope tables: local grid (ph=20, pw=36) + 1 special token
    yy, xx = jnp.meshgrid(jnp.arange(20), jnp.arange(36), indexing="ij")
    ppos = jnp.stack([yy.reshape(-1), xx.reshape(-1)], -1)
    l_pos = jnp.concatenate([jnp.zeros((1, 2), jnp.int32), ppos + 1], 0)
    g_pos = jnp.concatenate([jnp.zeros((1, 2), jnp.int32),
                             jnp.ones_like(ppos)], 0)
    l_tabs = tuple(t[None, None] for t in rope_tables(l_pos, D, 100.0))
    g1 = tuple(rope_tables(g_pos, D, 100.0))
    g_tabs = tuple(jnp.tile(t[None], (S, 1, 1)).reshape(1, 1, N_GLOBAL, D)
                   for t in g1)

    for qk, rope, tag in [(False, False, "plain"), (True, True, "qknorm+rope")]:
        blk = block(qk, rope, f"b_{tag}")
        v_l = blk.init(rng, x_local, rope_tabs=l_tabs if rope else None)
        f_l = jax.jit(lambda x, v, t=None, b=blk: b.apply(v, x, rope_tabs=t))
        timeit(f"local block ({tag})", f_l, x_local, v_l,
               l_tabs if rope else None, iters=iters, repeats=repeats,
               flops=S * block_flops(N_LOCAL))
        v_g = blk.init(rng, x_global, rope_tabs=g_tabs if rope else None)
        timeit(f"global block ({tag})", f_l, x_global, v_g,
               g_tabs if rope else None, iters=iters, repeats=repeats,
               flops=block_flops(N_GLOBAL))

    # raw GEMM stack of one block (qkv + proj + w12 + w3), no attention
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    Wqkv = jax.random.normal(k1, (C, 3 * C), jnp.bfloat16) * 0.02
    Wp = jax.random.normal(k2, (C, C), jnp.bfloat16) * 0.02
    W12 = jax.random.normal(k3, (C, 8192), jnp.bfloat16) * 0.02
    W3 = jax.random.normal(k4, (4096, C), jnp.bfloat16) * 0.02

    def gemms(x, a, b, c, d):
        q = x @ a
        o = q[..., :C] @ b
        h12 = o @ c
        h1, h2 = jnp.split(h12, 2, axis=-1)
        return (nn.silu(h1) * h2) @ d

    gf = block_flops(N_GLOBAL, attn=False)
    timeit("raw GEMM stack (local layout)", jax.jit(gemms),
           x_local, Wqkv, Wp, W12, W3, iters=iters, repeats=repeats, flops=gf)
    timeit("raw GEMM stack (global layout)", jax.jit(gemms),
           x_global, Wqkv, Wp, W12, W3, iters=iters, repeats=repeats, flops=gf)

    # f32 weights (the production param dtype) vs bf16 weights
    Wqkv32, Wp32, W12_32, W3_32 = (w.astype(jnp.float32) for w in (Wqkv, Wp, W12, W3))

    def gemms_f32w(x, a, b, c, d):
        return gemms(x, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                     c.astype(jnp.bfloat16), d.astype(jnp.bfloat16))

    timeit("raw GEMMs, f32 weights cast in", jax.jit(gemms_f32w),
           x_global, Wqkv32, Wp32, W12_32, W3_32, iters=iters,
           repeats=repeats, flops=gf)

    # flash attention alone at both layouts (block shapes per
    # bench_flash_blocks sweep: local (256, 768), global (256, full))
    from recondet3d.ops.attention import flash_attention

    def attn(x, Wqkv, bq, bk):
        qkv = x @ Wqkv
        B, N, _ = x.shape
        qkv = qkv.reshape(B, N, 3, H, C // H)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        return flash_attention(q, k, v, impl="auto", block_q=bq, block_k=bk)

    af_l = 2 * N_LOCAL * C * 3 * C * S + 2 * 2 * N_LOCAL * N_LOCAL * D * H * S
    af_g = 2 * N_GLOBAL * C * 3 * C + 2 * 2 * N_GLOBAL * N_GLOBAL * D * H
    timeit("qkv+flash (local, default blocks)",
           jax.jit(lambda x, w: attn(x, w, 512, 512)), x_local, Wqkv,
           iters=iters, repeats=repeats, flops=af_l)
    timeit("qkv+flash (local, swept blocks)",
           jax.jit(lambda x, w: attn(x, w, 256, 768)), x_local, Wqkv,
           iters=iters, repeats=repeats, flops=af_l)
    timeit("qkv+flash (global, default blocks)",
           jax.jit(lambda x, w: attn(x, w, 512, 512)), x_global, Wqkv,
           iters=iters, repeats=repeats, flops=af_g)
    timeit("qkv+flash (global, swept blocks)",
           jax.jit(lambda x, w: attn(x, w, 256, 4352)), x_global, Wqkv,
           iters=iters, repeats=repeats, flops=af_g)

    # layout overhead: the 3 moveaxis copies + output moveaxis
    def transposes(x, Wqkv):
        qkv = x @ Wqkv
        B, N, _ = x.shape
        qkv = qkv.reshape(B, N, 3, H, C // H)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        return q + 1.0, k + 1.0, v + 1.0

    timeit("qkv+head-split transposes (global)", jax.jit(transposes),
           x_global, Wqkv, iters=iters, repeats=repeats,
           flops=2 * N_GLOBAL * C * 3 * C)


if __name__ == "__main__":
    main()
