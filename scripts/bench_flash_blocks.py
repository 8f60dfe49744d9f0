#!/usr/bin/env python
"""Sweep flash-attention (block_q, block_k) at the nested-giant global
and local attention shapes.

bench_qk_prep.py put the global flash call at ~2.4 ms/block (~25-50% of
the D=64 attention roofline); this isolates the kernel and sweeps block
shapes, including the single-KV-iteration degenerate (block_k = padded
KV) that removes the online-softmax loop bookkeeping entirely.
Result (v5e, 2026-08): bq=256 + single-KV-iteration wins at both shapes
(local 0.64 -> 0.37 ms, global 2.36 -> 1.83 ms) — now the
``_auto_blocks`` default in ops/attention.py.

--bwd sweeps the BACKWARD kernels instead (block_q_bwd, block_k_bwd at
the da3-large fine-tune shapes, H=16): times one fwd+vjp pair per combo.

Usage: python scripts/bench_flash_blocks.py [iters] [repeats] [--bwd]
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
from recondet3d.ops.attention import flash_attention  # noqa: E402

S, N_LOCAL, C, H = 6, 721, 1536, 24
D = C // H
N_GLOBAL = S * N_LOCAL


def bwd_sweep(iters, repeats):
    """Backward block sweep at the da3-large (vitl) fine-tune shapes."""
    Hh = 16
    rng = jax.random.PRNGKey(0)
    for tag, B, N in [("local", S, N_LOCAL), ("global", 1, N_GLOBAL)]:
        q = jax.random.normal(rng, (B, Hh, N, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, Hh, N, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, Hh, N, D), jnp.bfloat16)
        # fwd+bwd FLOPs: fwd 2 dots + bwd 5 dots, each 2*N*N*D per head
        flops = 7 * 2 * N * N * D * Hh * B
        full_k = (N + 127) // 128 * 128
        print(f"--- bwd {tag}: B={B} H={Hh} N={N} ({flops/1e9:.1f} GFLOP "
              f"fwd+bwd) ---", flush=True)
        combos = [(512, 512), (256, 256), (128, 128), (256, 512), (512, 256),
                  (1024, 1024), (256, full_k), (512, full_k),
                  (min(1024, full_k), 256)]
        ref = None
        for bq, bk in combos:
            def fwd_bwd(q, k, v, bq=bq, bk=bk):
                def loss(q, k, v):
                    o = flash_attention(q, k, v, impl="pallas",
                                        block_q_bwd=bq, block_k_bwd=bk)
                    return jnp.sum(o.astype(jnp.float32) ** 2)
                return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

            f = jax.jit(fwd_bwd)
            try:
                dt = _timing.timeit_scan(None, f, q, k, v,
                                         repeats=repeats, iters=iters)
            except Exception as e:
                print(f"bq_bwd={bq:5d} bk_bwd={bk:5d}  FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            out = np.asarray(f(q, k, v)[0], np.float32)
            if ref is None:
                ref = out
            err = float(np.max(np.abs(out - ref)))
            eff = flops / (dt * 1e-3) / 197e12 * 100 if dt > 0 else float("inf")
            print(f"bq_bwd={bq:5d} bk_bwd={bk:5d}  {dt:7.3f} ms  "
                  f"{eff:5.1f}% peak  dq maxerr={err:.2e}", flush=True)


def main():
    iters_args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = int(iters_args[0]) if iters_args else 5
    repeats = int(iters_args[1]) if len(iters_args) > 1 else 16
    if "--bwd" in sys.argv[1:]:
        bwd_sweep(iters, repeats)
        return
    rng = jax.random.PRNGKey(0)

    for tag, B, N in [("local", S, N_LOCAL), ("global", 1, N_GLOBAL)]:
        q = jax.random.normal(rng, (B, H, N, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, H, N, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, H, N, D), jnp.bfloat16)
        flops = 2 * 2 * N * N * D * H * B
        print(f"--- {tag}: B={B} N={N} ({flops/1e9:.1f} GFLOP) ---", flush=True)
        combos = [(128, 128), (256, 256), (512, 512), (512, 1024),
                  (1024, 512), (1024, 1024), (256, 512), (512, 256)]
        # single-KV-iteration: block_k = padded N (multiple of 128)
        full_k = (N + 127) // 128 * 128
        combos += [(256, full_k), (512, full_k)]
        ref = None
        for bq, bk in combos:
            f = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, impl="pallas", block_q=bq, block_k=bk))
            try:
                dt = _timing.timeit_scan(None, f, q, k, v,
                                         repeats=repeats, iters=iters)
            except Exception as e:
                print(f"bq={bq:5d} bk={bk:5d}  FAILED {type(e).__name__}",
                      flush=True)
                continue
            out = np.asarray(f(q, k, v), np.float32)
            if ref is None:
                ref = out
            err = float(np.max(np.abs(out - ref)))
            eff = flops / (dt * 1e-3) / 197e12 * 100 if dt > 0 else float("inf")
            print(f"bq={bq:5d} bk={bk:5d}  {dt:7.3f} ms  {eff:5.1f}% peak  "
                  f"maxerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
