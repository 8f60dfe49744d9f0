#!/usr/bin/env python
"""Per-op dissection of one vitg trunk block at the nested-giant shapes.

profile_da3.py puts the anyview vitg backbone at 117.7 ms / ~47% of
bf16 peak (flash FLOPs counted); its GEMMs alone would run ~62 ms at
80% and the flash calls ~35 ms, leaving ~20 ms of glue (layernorms,
QK-norm, RoPE, transposes, residual/LayerScale). This times each piece
separately at BOTH the local (B=6, N=721) and global (B=1, N=4326)
shapes x the block counts (26 local / 14 global at depth 40,
alt_start 13) so the glue ranking is measured, not guessed.

Usage: python scripts/bench_vitg_block.py [iters] [repeats]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp  # noqa: E402

import _timing  # noqa: E402
from recondet3d.models.da3.layers import (  # noqa: E402
    Attention,
    Block,
    LayerNormFp32,
    SwiGLUFFNFused,
    apply_rope_tables,
    rope_tables,
)
from recondet3d.ops.attention import flash_attention  # noqa: E402

C, H = 1536, 24
D = C // H
MLP_RATIO = 4


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = int(args[0]) if args else 5
    repeats = int(args[1]) if len(args) > 1 else 8
    rng = jax.random.PRNGKey(0)

    for tag, B, N, nblk in [("local", 6, 721, 26), ("global", 1, 4326, 14)]:
        x = jax.random.normal(rng, (B, N, C), jnp.bfloat16)
        pos = jnp.stack(
            jnp.meshgrid(jnp.arange(66), jnp.arange(66), indexing="ij"),
            axis=-1,
        ).reshape(1, -1, 2)[:, :N].astype(jnp.float32)
        pos = jnp.broadcast_to(pos, (B, N, 2))
        cos, sin = rope_tables(pos[:, None], D)
        q = jax.random.normal(rng, (B, H, N, D), jnp.bfloat16)

        blk = Block(num_heads=H, mlp_ratio=MLP_RATIO, qk_norm=True,
                    use_rope=True, ffn_layer="swiglufused",
                    dtype=jnp.bfloat16, attn_impl="pallas")
        bvars = jax.jit(blk.init)(rng, x, pos, None, (cos, sin))

        attn = Attention(num_heads=H, qk_norm=True, use_rope=True,
                         dtype=jnp.bfloat16, attn_impl="pallas")
        avars = jax.jit(attn.init)(rng, x, pos, None, (cos, sin))

        ffn = SwiGLUFFNFused(hidden_features=C * MLP_RATIO, dtype=jnp.bfloat16)
        fvars = jax.jit(ffn.init)(rng, x)

        ln = LayerNormFp32()
        lvars = jax.jit(ln.init)(rng, x)

        qn = LayerNormFp32(epsilon=1e-5)
        qvars = jax.jit(qn.init)(rng, q)

        w_qkv = jax.random.normal(rng, (C, 3 * C), jnp.bfloat16) * 0.02

        print(f"--- {tag}: B={B} N={N} x{nblk} blocks ---", flush=True)

        def t(name, fn, *a):
            dt = _timing.timeit_scan(None, fn, *a, repeats=repeats,
                                     iters=iters)
            print(f"{name:26s} {dt:7.3f} ms  x{nblk} = {dt * nblk:6.1f} ms",
                  flush=True)
            return dt

        t("full block", lambda x: blk.apply(bvars, x, pos, None, (cos, sin)), x)
        t("attention (all-in)", lambda x: attn.apply(avars, x, pos, None, (cos, sin)), x)
        t("ffn swiglu", lambda x: ffn.apply(fvars, x), x)
        t("layernorm (x2/block)", lambda x: ln.apply(lvars, x), x)
        t("qkv gemm only", lambda x: x @ w_qkv, x)
        t("qkv gemm+split+T", lambda x: jnp.moveaxis(
            (x @ w_qkv).reshape(B, N, 3, H, D)[:, :, 0], 1, 2), x)
        t("qk-norm (x2/block)", lambda q: qn.apply(qvars, q), q)
        t("rope apply (x2/block)", lambda q: apply_rope_tables(q, cos, sin), q)
        t("flash fwd", lambda q: flash_attention(q, q, q, impl="pallas"), q)


if __name__ == "__main__":
    main()
