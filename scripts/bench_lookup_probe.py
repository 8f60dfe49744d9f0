#!/usr/bin/env python
"""Primitive-cost probes behind the sparse-encoder map builds.

Measures, at stage-0 production sizes (85M-cell grid, 40960 actives,
532k subm queries; 10.9M-cell output grid, 328k downsample candidates):

  a) 532k random gathers into a 340MB int32 table (current nbr lookup)
  b) same gathers into a ~25MB packed column table (proposed)
  c) jnp.cumsum over 10.9M int8->int32 (current downsample ranking)
  d) cumsum over 2M int32 + z-axis int8 cumsum (proposed ranking)
  e) the 340MB table build (full + scatter) alone

Usage: python scripts/bench_lookup_probe.py [iters]
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


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    rng = np.random.default_rng(0)

    N_CELLS = 41 * 1440 * 1440  # 85M
    N_COLS = 1440 * 1440  # 2.07M
    N_ACT = 40960
    Q = 532_000
    O_CELLS = 21 * 720 * 720  # 10.9M z-major
    O_COLS = 720 * 720
    OZ = 21
    NC = 328_000

    act = jnp.asarray(np.sort(rng.choice(N_CELLS, N_ACT, replace=False))
                      .astype(np.int32))
    q = jnp.asarray(rng.integers(0, N_CELLS, Q).astype(np.int32))
    qcol = jnp.asarray(rng.integers(0, N_COLS, Q).astype(np.int32))

    @jax.jit
    def build_dense(a):
        t = jnp.full((N_CELLS + 1,), N_ACT, jnp.int32)
        return t.at[a].set(jnp.arange(N_ACT, dtype=jnp.int32), mode="drop")

    tab, _ = timeit("build 340MB dense table", build_dense, act,
                    iters=iters, width=44)

    timeit("532k gathers into 340MB", jax.jit(lambda t, qq: t[qq].sum()),
           tab, q, iters=iters, width=44)

    packed = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                      (N_COLS, 3)).astype(np.int32))
    timeit("532k row-gathers into 25MB (cols,3)",
           jax.jit(lambda t, qq: t[qq].sum()), packed, qcol,
           iters=iters, width=44)

    p0 = packed[:, 0]
    timeit("532k 1D gathers into 8MB", jax.jit(lambda t, qq: t[qq].sum()),
           p0, qcol, iters=iters, width=44)

    occ = jnp.zeros((O_CELLS + 1,), jnp.int8).at[
        jnp.asarray(rng.integers(0, O_CELLS, NC).astype(np.int32))
    ].set(1, mode="drop")

    timeit("cumsum 10.9M int8->int32",
           jax.jit(lambda o: jnp.cumsum(o, dtype=jnp.int32)[-1]), occ,
           iters=iters, width=44)

    assert O_COLS * OZ == O_CELLS
    occ2 = occ[:-1].reshape(O_COLS, OZ)

    @jax.jit
    def ranked(o2):
        within = jnp.cumsum(o2, axis=-1, dtype=jnp.int8) - o2
        cnt = (within[:, -1] + o2[:, -1]).astype(jnp.int32)
        colp = jnp.cumsum(cnt) - cnt
        return colp[-1] + within[:, -1].astype(jnp.int32).sum()

    timeit("z-axis int8 cumsum + 518k col cumsum", ranked, occ2,
           iters=iters, width=44)

    cand = jnp.asarray(rng.integers(0, O_CELLS, NC).astype(np.int32))
    big_prefix = jnp.cumsum(occ, dtype=jnp.int32)
    timeit("328k gathers into 43MB", jax.jit(lambda t, c: t[c].sum()),
           big_prefix, cand, iters=iters, width=44)

    # scatter probe: 328k int8 set into 10.9M
    timeit("328k scatter-set into 10.9M int8",
           jax.jit(lambda c: jnp.zeros((O_CELLS + 1,), jnp.int8)
                   .at[c].set(1, mode="drop").astype(jnp.int32).sum()),
           cand, iters=iters, width=44)


if __name__ == "__main__":
    main()
