#!/usr/bin/env python
"""Dissect to_dense_bev + conv_out cost (bench_encoder_stages.py found
57 + 30 ms — half the encoder's 110 ms budget).

Hypothesis: the (B, Y, X, C, Z) scatter writes a C-row at fixed z =
stride-Z element writes -> scalar scatter. Variant scatters into
(B, Y, X, Z, C) (contiguous rows) and transposes.

Usage: python scripts/bench_densify.py [iters]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp

from _timing import timeit  # noqa: E402

from recondet3d.ops.sparse_conv import (  # noqa: E402
    SparseTensor,
    sparse_conv_downsample,
    to_dense_bev,
    _downsample_gather_map,
)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = jax.random.PRNGKey(0)
    N, C = 16384, 128
    Z, Y, X = 5, 180, 180
    B = 1

    # realistic active set: unique cells on the (5,180,180) grid
    r = np.random.default_rng(0)
    lin = np.unique(r.integers(0, Z * Y * X, 2 * N))[:N]
    n = len(lin)
    coords = np.full((N, 4), -1, np.int32)
    coords[:n, 0] = 0
    coords[:n, 1] = lin[:n] // (Y * X)
    coords[:n, 2] = (lin[:n] % (Y * X)) // X
    coords[:n, 3] = lin[:n] % X
    coords = jnp.asarray(coords)
    feats = jax.random.normal(rng, (N, C), jnp.bfloat16)

    grid = (Z, Y, X)

    bev_cur = jax.jit(lambda f, c: to_dense_bev(SparseTensor(f, c, grid, B)))
    timeit("to_dense_bev current (C,Z scatter)", bev_cur, feats, coords,
           iters=iters, width=44)

    def bev_contig(f, c):
        st = SparseTensor(f, c, grid, B)
        valid = st.valid
        ff = jnp.where(valid[:, None], st.features, 0)
        dense = jnp.zeros((B, Y, X, Z, C), st.features.dtype)
        b, z, y, x = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
        b = jnp.where(valid, b, B)
        dense = dense.at[b, y, x, z].set(ff, mode="drop")
        return dense.transpose(0, 1, 2, 4, 3).reshape(B, Y, X, C * Z)

    bev_v = jax.jit(bev_contig)
    timeit("to_dense_bev contiguous + transpose", bev_v, feats, coords,
           iters=iters, width=44)

    a = bev_cur(feats, coords)
    bm = bev_v(feats, coords)
    print("variant matches:", bool(jnp.all(a == bm)))

    # flat-linear-id scatter variant: one 1D row scatter, reshape after
    def bev_flat(f, c):
        st = SparseTensor(f, c, grid, B)
        valid = st.valid
        ff = jnp.where(valid[:, None], st.features, 0)
        b, z, y, x = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
        cell = ((b * Y + y) * X + x) * Z + z
        cell = jnp.where(valid, cell, B * Y * X * Z)
        dense = jnp.zeros((B * Y * X * Z + 1, C), st.features.dtype)
        dense = dense.at[cell].set(ff, mode="drop")
        return (dense[:-1].reshape(B, Y, X, Z, C)
                .transpose(0, 1, 2, 4, 3).reshape(B, Y, X, C * Z))

    bev_f = jax.jit(bev_flat)
    timeit("to_dense_bev flat-id row scatter", bev_f, feats, coords,
           iters=iters, width=44)
    print("flat matches:", bool(jnp.all(a == bev_f(feats, coords))))

    # conv_out dissection: map build vs conv apply
    w = jax.random.normal(rng, (3, C, C), jnp.bfloat16) * 0.05
    map_fn = jax.jit(lambda c: _downsample_gather_map(
        c, grid=grid, batch_size=B, kernel=(3, 1, 1), stride=(2, 1, 1),
        padding=(0, 0, 0), max_out=N))
    timeit("conv_out map build only", map_fn, coords, iters=iters, width=44)

    conv_fn = jax.jit(lambda f, c, wt: sparse_conv_downsample(
        SparseTensor(f, c, grid, B), wt, None, kernel=(3, 1, 1),
        stride=(2, 1, 1), padding=(0, 0, 0), max_out=N).features)
    timeit("conv_out full", conv_fn, feats, coords, w, iters=iters, width=44)


if __name__ == "__main__":
    main()
