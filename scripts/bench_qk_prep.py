#!/usr/bin/env python
"""Locate and cut the per-block overhead of qk-norm + 2D-RoPE in the ViT
attention path at nested-giant production shapes.

bench_vitg_block.py showed one vitg block at 2.05 ms plain vs 3.00 ms
with qknorm+rope — ~1 ms/block of non-GEMM overhead, ~40 ms across the
40-block vitg backbone. This sweep times the attention sub-path
(qkv GEMM -> head split -> [variants] -> flash -> merge -> proj GEMM)
with timeit_scan (amortized in-jit repeats — these ops are far below the
~24 ms tunnel dispatch floor) under layout/fusion variants to find which
formulation XLA compiles best.

Usage: python scripts/bench_qk_prep.py [iters] [repeats]
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
from recondet3d.models.da3.layers import rope_2d  # noqa: E402
from recondet3d.ops.attention import attention_xla, flash_attention  # noqa: E402

S, N_LOCAL, C, H = 6, 727, 1536, 24
D = C // H
N_GLOBAL = S * N_LOCAL


def _ln(x, g, b, eps=1e-5):
    """LayerNorm over the last dim in f32 (autocast semantics)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * g + b).astype(x.dtype)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)

    Wqkv = jax.random.normal(k1, (C, 3 * C), jnp.bfloat16) * 0.02
    Wp = jax.random.normal(k2, (C, C), jnp.bfloat16) * 0.02
    g = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)

    def run(tag, B, N):
        x = jax.random.normal(k3, (B, N, C), jnp.bfloat16)
        grid2 = jnp.stack(
            jnp.meshgrid(jnp.arange(37.0), jnp.arange(37.0), indexing="ij"),
            -1,
        ).reshape(-1, 2)[:N_LOCAL]  # (727, 2) per-view positions
        pos = jnp.tile(grid2[None], (S, 1, 1))  # (S, 727, 2)
        if B == 1:  # global layout: views concatenated on the token axis
            pos = pos.reshape(1, S * N_LOCAL, 2)
        assert pos.shape == (B, N, 2)
        # precomputed rope tables (f32), the 'shared across blocks' form
        dd = D // 2
        expo = jnp.arange(0, dd, 2, dtype=jnp.float32) / dd
        inv_freq = 1.0 / (100.0 ** expo)
        ang_y = pos[..., 0:1] * inv_freq[None, None]
        ang_x = pos[..., 1:2] * inv_freq[None, None]
        ang = jnp.concatenate([ang_y, ang_y, ang_x, ang_x], -1)  # (B, N, D)
        cosb, sinb = jnp.cos(ang), jnp.sin(ang)

        def heads(qkv):
            qkv = qkv.reshape(B, N, 3, H, D)
            return [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]

        def v_plain(x):
            q, k, v = heads(x @ Wqkv)
            o = flash_attention(q, k, v, impl="pallas")
            return jnp.moveaxis(o, 1, 2).reshape(B, N, C) @ Wp

        def v_current(x):
            q, k, v = heads(x @ Wqkv)
            q, k = _ln(q, g, b), _ln(k, g, b)
            q, k = rope_2d(q, pos, 100.0), rope_2d(k, pos, 100.0)
            o = flash_attention(q, k, v, impl="pallas")
            return jnp.moveaxis(o, 1, 2).reshape(B, N, C) @ Wp

        def _rot_half_cat(t):
            # rope via precomputed (B, 1, N, D) tables; rotate within each
            # D/2 half: (-x2, x1) per half
            t1 = t.reshape(B, H, N, 2, 2, D // 4)
            tr = jnp.stack([-t1[..., 1, :], t1[..., 0, :]], -2)
            return tr.reshape(B, H, N, D)

        def v_pretab(x):
            q, k, v = heads(x @ Wqkv)
            q, k = _ln(q, g, b), _ln(k, g, b)
            cos, sin = cosb[:, None].astype(q.dtype), sinb[:, None].astype(q.dtype)
            q = q * cos + _rot_half_cat(q) * sin
            k = k * cos + _rot_half_cat(k) * sin
            o = flash_attention(q, k, v, impl="pallas")
            return jnp.moveaxis(o, 1, 2).reshape(B, N, C) @ Wp

        def v_bnhd(x):
            # LN + rope in (B, N, H, D) before the head transpose
            qkv = (x @ Wqkv).reshape(B, N, 3, H, D)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q, k = _ln(q, g, b), _ln(k, g, b)
            cos = cosb[:, :, None].astype(q.dtype)  # (B, N, 1, D)
            sin = sinb[:, :, None].astype(q.dtype)

            def rot(t):
                t1 = t.reshape(B, N, H, 2, 2, D // 4)
                tr = jnp.stack([-t1[..., 1, :], t1[..., 0, :]], -2)
                return tr.reshape(B, N, H, D)

            q = q * cos + rot(q) * sin
            k = k * cos + rot(k) * sin
            q, k, v = (jnp.moveaxis(t, 1, 2) for t in (q, k, v))
            o = flash_attention(q, k, v, impl="pallas")
            return jnp.moveaxis(o, 1, 2).reshape(B, N, C) @ Wp

        def v_xla_attn(x):
            q, k, v = heads(x @ Wqkv)
            q, k = _ln(q, g, b), _ln(k, g, b)
            q, k = rope_2d(q, pos, 100.0), rope_2d(k, pos, 100.0)
            o = attention_xla(q, k, v)
            return jnp.moveaxis(o, 1, 2).reshape(B, N, C) @ Wp

        def v_small_blocks(x):
            q, k, v = heads(x @ Wqkv)
            q, k = _ln(q, g, b), _ln(k, g, b)
            q, k = rope_2d(q, pos, 100.0), rope_2d(k, pos, 100.0)
            o = flash_attention(q, k, v, impl="pallas", block_q=256, block_k=256)
            return jnp.moveaxis(o, 1, 2).reshape(B, N, C) @ Wp

        def v_plain_small(x):
            q, k, v = heads(x @ Wqkv)
            o = flash_attention(q, k, v, impl="pallas", block_q=256, block_k=256)
            return jnp.moveaxis(o, 1, 2).reshape(B, N, C) @ Wp

        # exactness: every variant must equal the current formulation
        ref = jax.jit(v_current)(x)
        for nm, fn in [("pretab", v_pretab), ("bnhd", v_bnhd)]:
            got = jax.jit(fn)(x)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            assert err < 0.02, (tag, nm, err)

        print(f"--- {tag}: B={B} N={N} ---", flush=True)
        for name, fn in [
            ("plain (no qknorm/rope)", v_plain),
            ("plain, 256-blocks flash", v_plain_small),
            ("current (closed-form rope)", v_current),
            ("precomputed rope tables", v_pretab),
            ("LN+rope in (B,N,H,D)", v_bnhd),
            ("256-blocks flash", v_small_blocks),
            ("XLA attention", v_xla_attn),
        ]:
            _timing.timeit_scan(name, jax.jit(fn), x,
                                repeats=repeats, iters=iters, width=30)

    run("local", S, N_LOCAL)
    run("global", 1, N_GLOBAL)


if __name__ == "__main__":
    main()
