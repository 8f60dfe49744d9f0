#!/usr/bin/env python
"""Per-phase dissection of the SparseEncoder's 110 ms at production load.

bench_refinement.py shows the encoder dominates refinement (110 of
121 ms); this script times each phase separately at the EXACT stage
shapes the pipeline produces (caps 40960/32768/24576/16384, grids
41x1440x1440 -> 21x720x720 -> 11x360x360, channels 16/32/64/128), using
the corrected _timing helper: neighbor-map build, one basic block
(2 subm convs), and the downsample conv, per stage, plus conv_out and
the BEV densify.

Usage: python scripts/bench_encoder_stages.py [iters]
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
    build_neighbor_map,
    sort_by_column,
    sparse_conv_downsample,
    subm_conv_apply,
    to_dense_bev,
)

CAPS = (40960, 32768, 24576, 16384)
CHANNELS = (16, 32, 64, 128)


def make_stage0(n_cap=CAPS[0]):
    ref = np.load(os.path.join(REPO, "assets", "bench_sample",
                               "reference_points.npz"))["points"]
    rng = np.random.default_rng(0)
    pts = ref[rng.integers(0, len(ref), n_cap)] + rng.normal(0, 0.05, (n_cap, 3))
    vs = np.array([0.075, 0.075, 0.2])
    lo = np.array([-54.0, -54.0, -5.0])
    zyx = np.floor((pts - lo) / vs).astype(np.int64)[:, ::-1]  # z,y,x
    grid = (41, 1440, 1440)
    ok = ((zyx >= 0) & (zyx < np.array(grid))).all(1)
    zyx = zyx[ok]
    lin = (zyx[:, 0] * grid[1] + zyx[:, 1]) * grid[2] + zyx[:, 2]
    _, first = np.unique(lin, return_index=True)
    zyx = zyx[np.sort(first)][:n_cap]
    n = len(zyx)
    coords = np.full((n_cap, 4), -1, np.int32)
    coords[:n, 0] = 0
    coords[:n, 1:] = zyx
    print(f"stage0 active: {n}/{n_cap}")
    return jnp.asarray(coords), grid


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = jax.random.PRNGKey(0)

    coords, grid = make_stage0()
    feats = jax.random.normal(rng, (CAPS[0], CHANNELS[0]), jnp.bfloat16)
    st = SparseTensor(feats, coords, grid, 1)
    # production precondition for order="col": stage0 sorted once, the
    # downsample outputs below are ranked column-sorted by construction
    # (jit over (f, c) only — jitting the NamedTuple itself would trace
    # the static grid/batch_size fields into device arrays)
    sort_fn = jax.jit(lambda f, c, g=grid: sort_by_column(
        SparseTensor(f, c, g, 1))[:2])
    sf, sc = sort_fn(st.features, st.coords)
    st = SparseTensor(sf, sc, grid, 1)

    total = 0.0
    for i in range(4):
        C = CHANNELS[i]
        grid_i = st.grid
        nbr_fn = jax.jit(lambda f, c, g=grid_i: build_neighbor_map(
            SparseTensor(f, c, g, 1), 3))
        _, dt_any = timeit(f"s{i} nbr_map any (N={st.features.shape[0]}, "
                           f"grid={st.grid})", nbr_fn, st.features, st.coords,
                           iters=iters, width=46)
        col_fn = jax.jit(lambda f, c, g=grid_i: build_neighbor_map(
            SparseTensor(f, c, g, 1), 3, order="col"))
        nbr, dt = timeit(f"s{i} nbr_map col", col_fn, st.features, st.coords,
                         iters=iters, width=46)
        total += dt

        w = jax.random.normal(rng, (27, C, C), jnp.bfloat16) * 0.05

        @jax.jit
        def block(f, nb, wt):
            out = subm_conv_apply(f, nb, wt)
            out = jax.nn.relu(out)
            out = subm_conv_apply(out, nb, wt)
            return jax.nn.relu(out + f)

        f = st.features
        if f.shape[-1] != C:
            f = jnp.tile(f, (1, C // f.shape[-1]))
        _, dt = timeit(f"s{i} basic block x1 (C={C})", block, f, nbr, w,
                       iters=iters, width=46)
        n_blocks = 2
        total += dt * n_blocks
        st = SparseTensor(block(f, nbr, w), st.coords, grid_i, 1)

        if i < 3:
            Cn = CHANNELS[i + 1]
            wd = jax.random.normal(rng, (27, C, Cn), jnp.bfloat16) * 0.05
            pad = (0, 1, 1) if i == 2 else (1, 1, 1)
            down_fn = jax.jit(
                lambda f, c, wt, g=grid_i, p=pad, m=CAPS[i + 1]:
                sparse_conv_downsample(SparseTensor(f, c, g, 1), wt, None,
                                       kernel=3, stride=2, padding=p,
                                       max_out=m))
            st, dt = timeit(f"s{i} downsample -> cap {CAPS[i+1]}", down_fn,
                            st.features, st.coords, wd, iters=iters, width=46)
            st = SparseTensor(st.features, st.coords,
                              tuple(int(g) for g in st.grid), 1)
            total += dt

    # conv_out: (3,1,1)/(2,1,1)
    grid_f = tuple(int(g) for g in st.grid)
    wo = jax.random.normal(rng, (3, 128, 128), jnp.bfloat16) * 0.05
    out_fn = jax.jit(lambda f, c, wt, g=grid_f: sparse_conv_downsample(
        SparseTensor(f, c, g, 1), wt, None, kernel=(3, 1, 1),
        stride=(2, 1, 1), padding=(0, 0, 0), max_out=CAPS[-1]))
    st_out, dt = timeit("conv_out (3,1,1)", out_fn, st.features, st.coords,
                        wo, iters=iters, width=46)
    total += dt

    grid_o = tuple(int(g) for g in st_out.grid)
    bev_fn = jax.jit(lambda f, c, g=grid_o: to_dense_bev(
        SparseTensor(f, c, g, 1)))
    _, dt = timeit("to_dense_bev", bev_fn, st_out.features, st_out.coords,
                   iters=iters, width=46)
    total += dt
    print(f"{'SUM (blocks x2 per stage)':46s} {total:8.2f} ms")


if __name__ == "__main__":
    main()
