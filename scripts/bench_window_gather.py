#!/usr/bin/env python
"""Microbench: where does a subm conv's time actually go on v5e?

First round showed 27-row gathers into the (N, C) feature table are
~free (sub-ms at every encoder stage shape) while the fused
gather+GEMM subm conv measures ~3.3 ms at C16 — so the cost is in the
GEMM / layout, not the gather (the flat windowed-gather idea measured
a catastrophic 170-290 ms and is recorded dead).

This bench splits the op: gather-only, GEMM-only (pre-gathered
operand), fused gather+GEMM (production form), einsum form (no
(M, K*Cin) reshape), and a wider-Cout control.

Usage: python scripts/bench_window_gather.py [iters]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp

from _timing import timeit_scan  # noqa: E402


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    rng = np.random.default_rng(0)
    K = 27
    for N, C in [(40960, 16), (32768, 32), (24576, 64), (16384, 128)]:
        feats = jnp.asarray(
            rng.normal(size=(N, C)).astype(np.float32), jnp.bfloat16
        )
        nbr = jnp.asarray(
            rng.integers(0, N + 1, size=(N, K)).astype(np.int32)
        )
        w = jnp.asarray(
            rng.normal(size=(K, C, C)).astype(np.float32) * 0.1, jnp.bfloat16
        )
        pre = jnp.asarray(
            rng.normal(size=(N, K * C)).astype(np.float32), jnp.bfloat16
        )

        @jax.jit
        def gather_only(f, r):
            p = jnp.concatenate([f, jnp.zeros((1, C), f.dtype)], axis=0)
            return p[r].sum(axis=(1, 2))

        @jax.jit
        def gemm_only(g, wt):
            return jax.lax.dot_general(
                g, wt.reshape(K * C, C), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(g.dtype)

        @jax.jit
        def fused(f, r, wt):
            p = jnp.concatenate([f, jnp.zeros((1, C), f.dtype)], axis=0)
            g = p[r].reshape(N, K * C)
            return jax.lax.dot_general(
                g, wt.reshape(K * C, C), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(f.dtype)

        @jax.jit
        def fused_einsum(f, r, wt):
            p = jnp.concatenate([f, jnp.zeros((1, C), f.dtype)], axis=0)
            g = p[r]  # (N, K, C)
            return jnp.einsum(
                "nkc,kcd->nd", g, wt,
                preferred_element_type=jnp.float32,
            ).astype(f.dtype)


        @jax.jit
        def fused_barrier(f, r, wt):
            p = jnp.concatenate([f, jnp.zeros((1, C), f.dtype)], axis=0)
            g = p[r].reshape(N, K * C)
            g = jax.lax.optimization_barrier(g)
            return jax.lax.dot_general(
                g, wt.reshape(K * C, C), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(f.dtype)

        @jax.jit
        def fused_barrier_einsum(f, r, wt):
            p = jnp.concatenate([f, jnp.zeros((1, C), f.dtype)], axis=0)
            g = jax.lax.optimization_barrier(p[r])
            return jnp.einsum(
                "nkc,kcd->nd", g, wt,
                preferred_element_type=jnp.float32,
            ).astype(f.dtype)

        timeit_scan(f"N={N} C={C:3d} gather only", gather_only, feats, nbr,
               iters=iters, width=34)
        timeit_scan(f"N={N} C={C:3d} GEMM only", gemm_only, pre, w,
               iters=iters, width=34)
        timeit_scan(f"N={N} C={C:3d} fused (prod)", fused, feats, nbr, w,
               iters=iters, width=34)
        timeit_scan(f"N={N} C={C:3d} fused einsum", fused_einsum, feats, nbr, w,
               iters=iters, width=34)
        timeit_scan(f"N={N} C={C:3d} barrier+GEMM", fused_barrier, feats, nbr, w,
               iters=iters, width=34)
        timeit_scan(f"N={N} C={C:3d} barrier+einsum", fused_barrier_einsum,
               feats, nbr, w, iters=iters, width=34)


if __name__ == "__main__":
    main()
