#!/usr/bin/env python
"""Scan-amortized dissection of the SparseEncoder's COORDINATE path.

timeit_scan hoisting hazard (measured): when the coords operand is
loop-invariant inside the timing scan, XLA hoists the whole coordinate
machinery out of the loop — the encoder measured 48.5 ms with fixed
coords vs 78.1 ms with per-iteration varying coords (/tmp hoist probe,
2026-08). Every fn here therefore takes a FLOAT first arg and derives
an always-zero int from it into the coords so nothing hoists.

Components at production stage shapes: sort_by_column, the 4 col-order
neighbor-map builds, the 3 strided downsample maps + conv_out map.

Usage: python scripts/bench_coord_path.py [iters]
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
from bench_encoder_stages import CAPS, make_stage0  # noqa: E402
from recondet3d.ops.sparse_conv import (  # noqa: E402
    SparseTensor,
    _downsample_gather_map,
    build_neighbor_map,
    sort_by_column,
    sparse_conv_downsample,
)


def _vary(f):
    """Always-zero int32 derived from the perturbed float arg."""
    return jnp.where(f[0] > 1e30, 1, 0).astype(jnp.int32)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = np.random.default_rng(0)
    f0 = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    coords, grid = make_stage0()
    st = SparseTensor(jnp.zeros((CAPS[0], 1), jnp.bfloat16),
                      jnp.asarray(coords), grid, 1)
    st = SparseTensor(st.features, sort_by_column(st).coords, grid, 1)

    def t_sort(f, c):
        s = sort_by_column(SparseTensor(
            jnp.zeros((c.shape[0], 1), jnp.bfloat16), c + _vary(f), grid, 1))
        return s.coords.astype(jnp.float32).sum() + f.sum()

    timeit_scan("sort_by_column (s0)", jax.jit(t_sort), f0, st.coords,
                iters=iters, width=38)

    # per-stage coords from successive downsamples (weights irrelevant)
    stages = [st]
    cur = st
    for i in range(3):
        pad = (0, 1, 1) if i == 2 else (1, 1, 1)
        w = jnp.zeros((27, 1, 1), jnp.bfloat16)
        cur = jax.jit(
            lambda f, c, g=cur.grid, p=pad, m=CAPS[i + 1]:
            sparse_conv_downsample(
                SparseTensor(f, c, g, 1), jnp.zeros((27, f.shape[1], 1),
                                                    jnp.bfloat16), None,
                kernel=3, stride=2, padding=p, max_out=m)
        )(cur.features, cur.coords)
        cur = SparseTensor(cur.features, cur.coords,
                           tuple(int(g) for g in cur.grid), 1)
        stages.append(cur)

    total = 0.0
    for i, s in enumerate(stages):
        def t_nbr(f, c, g=s.grid):
            nb = build_neighbor_map(SparseTensor(
                jnp.zeros((c.shape[0], 1), jnp.bfloat16), c + _vary(f),
                g, 1), 3, order="col")
            return nb.astype(jnp.float32).sum() + f.sum()

        dt = timeit_scan(f"s{i} nbr_map col (N={s.coords.shape[0]})",
                         jax.jit(t_nbr), f0, s.coords, iters=iters, width=38)
        total += dt

    for i in range(3):
        s = stages[i]
        pad = (0, 1, 1) if i == 2 else (1, 1, 1)

        def t_dmap(f, c, g=s.grid, p=pad, m=CAPS[i + 1], o="any"):
            oc, rows, bwd, n = _downsample_gather_map(
                c + _vary(f), grid=g, batch_size=1, kernel=(3, 3, 3),
                stride=(2, 2, 2), padding=p, max_out=m, order=o)
            return (oc.astype(jnp.float32).sum() + rows.sum() + bwd.sum()
                    + f.sum())

        timeit_scan(f"s{i} downsample map any", jax.jit(t_dmap), f0,
                    s.coords, iters=iters, width=38)
        dt = timeit_scan(
            f"s{i} downsample map col",
            jax.jit(lambda f, c, g=s.grid, p=pad, m=CAPS[i + 1]:
                    t_dmap(f, c, g, p, m, "col")),
            f0, s.coords, iters=iters, width=38)
        total += dt

    s = stages[3]

    def t_omap(f, c, g=s.grid):
        oc, rows, bwd, n = _downsample_gather_map(
            c + _vary(f), grid=g, batch_size=1, kernel=(3, 1, 1),
            stride=(2, 1, 1), padding=(0, 0, 0), max_out=CAPS[-1],
            order="col")
        return oc.astype(jnp.float32).sum() + rows.sum() + bwd.sum() + f.sum()

    dt = timeit_scan("conv_out map", jax.jit(t_omap), f0, s.coords,
                     iters=iters, width=38)
    total += dt
    print(f"{'SUM (maps, ex-sort)':38s} {total:8.3f} ms")


if __name__ == "__main__":
    main()
