#!/usr/bin/env python
"""Microbenchmark: compacted-present-pair subm conv vs the full 27-gather.

Motivation (measured, real reference-distribution active sets): the subm
neighborhood of pseudo-lidar voxels is extremely sparse — present
off-center neighbors per voxel are ~0.55 / 1.1 / 4.2 / 7.5 across the
four encoder stages — so the full (N, 27) row gather mostly fetches the
zero row. The compact form gathers ONLY present pairs (static cap),
scatters them into the (N, 27, C) im2col buffer (row scatters are cheap
on TPU), and runs the same one-GEMM contraction.

Also times the two id->row map builds (dense table vs merged sort) per
stage grid.

RESULT (v5e, 2026-08, production stage shapes): compact-pair LOSES.
The full 27-gather conv is already cheap — 4.3 / 3.2 / 2.6 / ~0 ms at
C16/32/64/128 — while the compact conv costs 11.9 / 12.4 / 6.4 / 3.3 ms
(the (N*(K-1))-row im2col scatter is bigger than the dense gather it
replaces) and build_pairs alone costs 52-64 ms/stage (the (26N)-element
cumsum + three scatters dwarf everything). Present-pair sparsity does
not pay on TPU at these sizes; keep form="full". Map builds: the dense
table (15.7 / 4.5 / 3.4 / 6.4 ms) beats merged-sort lookups
(28.8 / 22.6 / 18.2 / 10.9 ms) at every stage.

Usage: python scripts/bench_compact_conv.py [iters]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp

from recondet3d.ops.sparse_conv import (
    SparseTensor,
    _lookup_rows,
    _linear_ids,
    build_neighbor_map,
    subm_conv_apply,
)

_DISPATCH_MS = 24.0


def timeit(name, fn, *args, iters=5):
    def sync(o):
        jax.tree_util.tree_map(
            lambda x: float(np.asarray(jax.device_get(jnp.sum(x.astype(jnp.float32))))), o
        )
    for _ in range(2):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        sync(fn(*args))
    dt = max(0.0, (time.time() - t0) / iters * 1000 - _DISPATCH_MS)
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return fn(*args)


def stage_active_sets():
    """Real reference-distribution active voxels at the 4 encoder grids."""
    ref = np.load(os.path.join(REPO, "assets", "bench_sample",
                               "reference_points.npz"))["points"]
    rng = np.random.default_rng(0)
    pts = ref[rng.integers(0, len(ref), 40960)] + rng.normal(0, 0.05, (40960, 3))
    vs = np.array([0.075, 0.075, 0.2])
    lo = np.array([-54.0, -54.0, -5.0])
    c = np.floor((pts - lo) / vs).astype(np.int64)
    grid = np.array([1440, 1440, 41])  # x, y, z
    ok = ((c >= 0) & (c < grid)).all(1)
    xyz = np.unique(c[ok], axis=0)
    stages = []
    caps = (40960, 32768, 24576, 16384)
    grids = ((41, 1440, 1440), (21, 720, 720), (11, 360, 360), (6, 180, 180))
    chans = (16, 32, 64, 128)
    cur = xyz
    for si in range(4):
        g = grids[si]
        n = min(len(cur), caps[si])
        coords = np.full((caps[si], 4), -1, np.int32)
        coords[:n, 0] = 0
        # sorted by linear id (the production order out of voxelize)
        ids = (cur[:, 2] * g[1] + cur[:, 1]) * g[2] + cur[:, 0]
        o = np.argsort(ids[:n] if n < len(ids) else ids)[:n]
        sel = cur[o]
        coords[:n, 1] = sel[:, 2]
        coords[:n, 2] = sel[:, 1]
        coords[:n, 3] = sel[:, 0]
        stages.append((coords, g, chans[si], n))
        cur = np.unique(cur // 2, axis=0)
    return stages


def build_pairs(nbr_map, pair_cap):
    """Compact (src, n, k) triples for present off-center pairs."""
    N, K = nbr_map.shape
    H = K // 2
    offk = jnp.concatenate([jnp.arange(H), jnp.arange(H + 1, K)])
    m = nbr_map[:, offk]  # (N, K-1)
    kk = jnp.broadcast_to(offk[None, :], (N, K - 1))
    nn = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, K - 1))
    present = (m < N).reshape(-1)
    pos = jnp.cumsum(present) - 1
    tgt = jnp.where(present, pos, pair_cap)
    src = jnp.full((pair_cap,), N, jnp.int32).at[tgt].set(
        m.reshape(-1), mode="drop")
    pn = jnp.full((pair_cap,), N, jnp.int32).at[tgt].set(
        nn.reshape(-1), mode="drop")
    pk = jnp.zeros((pair_cap,), jnp.int32).at[tgt].set(
        kk.reshape(-1).astype(jnp.int32), mode="drop")
    return src, pn, pk


def compact_subm_conv(features, pairs, center_valid, weight):
    """out[n] = sum_present_pairs F[src] @ W[k] + valid(n) * F[n] @ W[H]."""
    N, Cin = features.shape
    K = weight.shape[0]
    H = K // 2
    Cout = weight.shape[-1]
    src, pn, pk = pairs
    w = weight.astype(features.dtype)
    padded = jnp.concatenate([features, jnp.zeros((1, Cin), features.dtype)])
    g = padded[src]  # (P, Cin) gather — the only per-conv gather
    slot = jnp.where(src < N, pn * (K - 1) + jnp.where(pk > H, pk - 1, pk),
                     N * (K - 1))
    buf = jnp.zeros((N * (K - 1) + 1, Cin), features.dtype).at[slot].set(
        g, mode="drop")
    gathered = buf[: N * (K - 1)].reshape(N, (K - 1) * Cin)
    w_off = jnp.concatenate([w[:H], w[H + 1:]], axis=0)  # (K-1, Cin, Cout)
    out = jax.lax.dot_general(
        gathered, w_off.reshape((K - 1) * Cin, Cout),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    ctr = jax.lax.dot_general(
        features, w[H], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + jnp.where(center_valid[:, None], ctr, 0.0)
    return out.astype(features.dtype)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = jax.random.PRNGKey(0)
    pair_mult = (4, 6, 12, 16)

    for si, (coords, g, C, n) in enumerate(stage_active_sets()):
        coords = jnp.asarray(coords)
        Ncap = coords.shape[0]
        print(f"--- stage{si+1}: grid {g}, cap {Ncap}, active {n}, C{C}",
              flush=True)

        f_map = jax.jit(lambda c: build_neighbor_map(
            SparseTensor(jnp.zeros((c.shape[0], 1)), c, g, 1), 3))
        nbr = timeit("build_neighbor_map (auto)", f_map, coords, iters=iters)

        # merged-sort lookup forced (same queries as the dense path)
        def map_merge(c):
            st = SparseTensor(jnp.zeros((c.shape[0], 1)), c, g, 1)
            ids = _linear_ids(st.coords, st.grid, st.batch_size)
            offs = []
            Z, Y, X = g
            for dz in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        offs.append((dz * Y + dy) * X + dx)
            offs = jnp.asarray(offs[:13], jnp.int32)
            cand = ids[:, None] + offs[None]
            sentinel = jnp.int32(Z * Y * X)
            cand = jnp.where(
                (st.valid[:, None]) & (cand >= 0) & (cand < sentinel),
                cand, sentinel)
            return _lookup_rows(ids, cand.reshape(-1), sentinel)

        timeit("half-map lookups (merged sort)", jax.jit(map_merge), coords,
               iters=iters)

        feats = jax.random.normal(rng, (Ncap, C), jnp.bfloat16)
        w = jax.random.normal(rng, (27, C, C), jnp.float32)

        f_full = jax.jit(lambda f, m, w: subm_conv_apply(f, m, w, form="full"))
        o1 = timeit(f"subm full 27-gather  C{C}", f_full, feats, nbr, w,
                    iters=iters)

        cap = pair_mult[si] * Ncap
        f_pairs = jax.jit(lambda m: build_pairs(m, cap))
        pairs = timeit(f"build_pairs (cap {pair_mult[si]}N)", f_pairs, nbr,
                       iters=iters)
        n_present = int(np.asarray(jax.device_get((pairs[0] < Ncap).sum())))
        print(f"  present pairs: {n_present} (cap {cap})", flush=True)

        cv = nbr[:, 13] < Ncap
        f_comp = jax.jit(lambda f, p0, p1, p2, c, w: compact_subm_conv(
            f, (p0, p1, p2), c, w))
        o2 = timeit(f"subm compact-pair    C{C}", f_comp, feats, *pairs, cv, w,
                    iters=iters)
        err = float(jnp.max(jnp.abs(
            o1.astype(jnp.float32) - o2.astype(jnp.float32))))
        mx = float(jnp.max(jnp.abs(o1.astype(jnp.float32))))
        print(f"  max abs diff {err:.3e} (max |full| {mx:.3e})", flush=True)


if __name__ == "__main__":
    main()
