#!/usr/bin/env python
"""Microbench of ONE ViT-giant block at nested-giant production shapes
(6 views x 727 tokens, d=1536, 24 heads, swiglufused) to locate the gap
between the measured vitg backbone (~147 ms / ~42% MXU) and the vitl
path's 71%.

Variants toggle the non-GEMM pieces (qk-norm, RoPE, LayerNorm/LayerScale)
and isolate the raw GEMM stack, the flash attention call, and the
local/global layouts. Usage: python scripts/bench_vitg_block.py [iters]
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
from recondet3d.models.da3.layers import Block  # noqa: E402

S, N_LOCAL, C, H = 6, 727, 1536, 24
N_GLOBAL = S * N_LOCAL


def timeit(name, fn, *args, iters=5):
    out, _ = _timing.timeit(name, fn, *args, iters=iters, width=40, mfu=True)
    return out


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = jax.random.PRNGKey(0)

    def block(qk_norm, use_rope, name):
        return Block(
            num_heads=H, mlp_ratio=4.0, qk_norm=qk_norm, use_rope=use_rope,
            ffn_layer="swiglufused", dtype=jnp.bfloat16, attn_impl="auto",
            name=name,
        )

    x_local = jax.random.normal(rng, (S, N_LOCAL, C), jnp.bfloat16)
    x_global = jax.random.normal(rng, (1, N_GLOBAL, C), jnp.bfloat16)
    pos_local = jnp.tile(
        jnp.stack(jnp.meshgrid(jnp.arange(27.0), jnp.arange(27.0),
                               indexing="ij"), -1).reshape(1, -1, 2)[:, :N_LOCAL],
        (S, 1, 1),
    )
    pos_global = pos_local.reshape(1, N_GLOBAL, 2)

    for qk, rope, tag in [(False, False, "plain"), (True, True, "qknorm+rope")]:
        blk = block(qk, rope, f"b_{tag}")
        v_l = blk.init(rng, x_local, pos=pos_local if rope else None)
        f_l = jax.jit(lambda v, x, p=None, b=blk: b.apply(v, x, pos=p))
        timeit(f"local block ({tag})", f_l, v_l, x_local,
               pos_local if rope else None, iters=iters)
        v_g = blk.init(rng, x_global, pos=pos_global if rope else None)
        timeit(f"global block ({tag})", f_l, v_g, x_global,
               pos_global if rope else None, iters=iters)

    # raw GEMM stack of one block (qkv + proj + w12 + w3), no attention
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    Wqkv = jax.random.normal(k1, (C, 3 * C), jnp.bfloat16)
    Wp = jax.random.normal(k2, (C, C), jnp.bfloat16)
    W12 = jax.random.normal(k3, (C, 8192), jnp.bfloat16)
    W3 = jax.random.normal(k4, (4096, C), jnp.bfloat16)

    def gemms(x, a, b, c, d):
        q = x @ a
        o = q[..., :C] @ b
        h12 = o @ c
        h1, h2 = jnp.split(h12, 2, axis=-1)
        return (nn.silu(h1) * h2) @ d

    timeit("raw GEMM stack (local layout)", jax.jit(gemms),
           x_local, Wqkv, Wp, W12, W3, iters=iters)
    timeit("raw GEMM stack (global layout)", jax.jit(gemms),
           x_global, Wqkv, Wp, W12, W3, iters=iters)

    # f32 weights (the production param dtype) vs bf16 weights
    Wqkv32, Wp32, W12_32, W3_32 = (w.astype(jnp.float32) for w in (Wqkv, Wp, W12, W3))

    def gemms_f32w(x, a, b, c, d):
        return gemms(x, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                     c.astype(jnp.bfloat16), d.astype(jnp.bfloat16))

    timeit("raw GEMMs, f32 weights cast in", jax.jit(gemms_f32w),
           x_global, Wqkv32, Wp32, W12_32, W3_32, iters=iters)

    # flash attention alone at both layouts
    from recondet3d.ops.attention import flash_attention

    def attn(x):
        qkv = x @ Wqkv
        B, N, _ = x.shape
        qkv = qkv.reshape(B, N, 3, H, C // H)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        return flash_attention(q, k, v, impl="auto")

    timeit("qkv+flash (local)", jax.jit(attn), x_local, iters=iters)
    timeit("qkv+flash (global)", jax.jit(attn), x_global, iters=iters)


if __name__ == "__main__":
    main()
