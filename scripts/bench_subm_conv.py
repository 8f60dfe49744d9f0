#!/usr/bin/env python
"""Microbenchmark: submanifold conv formulations at production shapes.

The sparse encoder is gather-bound at production load (the 27-tap row
gather per subm conv is HBM-latency-bound). The subm neighbor relation is
symmetric, so an exact alternative gathers only the 13 negative-half taps
+ center and delivers each pair's mirror contribution with a scatter-add
of GEMM outputs (scatter-adds measured ~25x cheaper than gathers on v5e).
This script times both forms on a realistic active set (reference point
distribution voxelized at the production 0.075 m grid).

Usage: python scripts/bench_subm_conv.py [iters]
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
    build_neighbor_map,
    subm_conv_apply,
)

_DISPATCH_MS = 24.0


def timeit(name, fn, *args, iters=5):
    for _ in range(2):
        out = fn(*args)
        float(np.asarray(jax.device_get(jnp.sum(out.astype(jnp.float32)))))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        float(np.asarray(jax.device_get(jnp.sum(out.astype(jnp.float32)))))
    dt = max(0.0, (time.time() - t0) / iters * 1000 - _DISPATCH_MS)
    print(f"{name:42s} {dt:8.2f} ms", flush=True)
    return out


def make_active_set(n_cap=40960):
    """Voxelize the reference-distribution cloud at the production grid."""
    ref = np.load(os.path.join(REPO, "assets", "bench_sample",
                               "reference_points.npz"))["points"]
    rng = np.random.default_rng(0)
    # resample up to ~40k FPS output scale with jitter
    pts = ref[rng.integers(0, len(ref), n_cap)] + rng.normal(0, 0.05, (n_cap, 3))
    vs = np.array([0.075, 0.075, 0.2])
    lo = np.array([-54.0, -54.0, -5.0])
    c = np.floor((pts - lo) / vs).astype(np.int32)
    grid = (41, 1440, 1440)  # (Z, Y, X)
    zyx = np.stack([c[:, 2], c[:, 1], c[:, 0]], 1)
    ok = ((zyx >= 0) & (zyx < np.array(grid))).all(1)
    zyx = zyx[ok]
    ids = (zyx[:, 0] * grid[1] + zyx[:, 1]) * grid[2] + zyx[:, 2]
    _, first = np.unique(ids, return_index=True)
    zyx = zyx[np.sort(first)][:n_cap]
    n = len(zyx)
    coords = np.full((n_cap, 4), -1, np.int32)
    coords[:n, 0] = 0
    coords[:n, 1:] = zyx
    print(f"active voxels: {n} / cap {n_cap}", flush=True)
    return coords


def pair_subm_conv(features, nbr_map, weight):
    """Exact subm conv from half-gather + mirror scatter-add."""
    N, Cin = features.shape
    K = nbr_map.shape[1]
    H = K // 2
    Cout = weight.shape[-1]
    w = weight.astype(features.dtype)
    padded = jnp.concatenate([features, jnp.zeros((1, Cin), features.dtype)])
    gath = padded[nbr_map[:, : H + 1]]  # (N, H+1, Cin): negative half + center
    out = jax.lax.dot_general(
        gath.reshape(N, (H + 1) * Cin), w[: H + 1].reshape((H + 1) * Cin, Cout),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    # mirror: pair (n, k<H) with m = nbr[n,k] contributes F[n] @ W[K-1-k]
    # to out[m]; compute all H GEMMs in one dot, then one scatter-add
    w_rev = jnp.flip(w[H + 1:], 0)  # w_rev[k] = W[K-1-k] for k in 0..H-1
    t = jax.lax.dot_general(
        features, w_rev.transpose(1, 0, 2).reshape(Cin, H * Cout),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(N, H, Cout)
    rows = nbr_map[:, :H]
    out_pad = jnp.zeros((N + 1, Cout), out.dtype).at[rows.reshape(-1)].add(
        t.reshape(N * H, Cout), mode="drop"
    )
    return (out + out_pad[:N]).astype(features.dtype)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    coords = jnp.asarray(make_active_set())
    st = SparseTensor(jnp.zeros((coords.shape[0], 1)), coords, (41, 1440, 1440), 1)

    f_map = jax.jit(lambda c: build_neighbor_map(
        SparseTensor(jnp.zeros((c.shape[0], 1)), c, (41, 1440, 1440), 1), 3))
    nbr = timeit("build_neighbor_map", f_map, coords, iters=iters)

    rng = jax.random.PRNGKey(0)
    for cin, cout, dt in [(16, 16, jnp.bfloat16), (16, 16, jnp.float32),
                          (64, 64, jnp.bfloat16)]:
        feats = jax.random.normal(rng, (coords.shape[0], cin), dt)
        w = jax.random.normal(rng, (27, cin, cout), jnp.float32)
        f_full = jax.jit(lambda f, m, w: subm_conv_apply(f, m, w, form="full"))
        f_pair = jax.jit(pair_subm_conv)
        tag = f"C{cin}->{cout} {dt.__name__}"
        o1 = timeit(f"subm full 27-gather   {tag}", f_full, feats, nbr, w,
                    iters=iters)
        o2 = timeit(f"subm pair 14-gather   {tag}", f_pair, feats, nbr, w,
                    iters=iters)
        err = float(jnp.max(jnp.abs(
            o1.astype(jnp.float32) - o2.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(o1.astype(jnp.float32))))
        print(f"  max abs diff {err:.3e} (max |full| {ref:.3e})", flush=True)


if __name__ == "__main__":
    main()
