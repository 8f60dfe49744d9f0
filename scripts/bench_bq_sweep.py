#!/usr/bin/env python
"""Sweep ball_query implementation knobs at the production pipeline shape.

Isolates the ball-query op itself (the BQ-downsample stage minus its FPS
anchor selection) on the real reference depth distribution
(assets/bench_sample/reference_points.npz resampled to pipeline scale,
voxel-pre-reduced exactly like the e2e bench), and sweeps
(grid_dim, chunk, block) of the grid-pruned exact implementation.

The selected neighbor sets are implementation-parameter-invariant
(smallest-nsample-original-indices-in-radius), so every configuration is
checked for bit-identical output against the default.

Usage: python scripts/bench_bq_sweep.py [iters]
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

from _timing import timeit as _timeit  # noqa: E402


def timeit(fn, *args, iters=5):
    return _timeit(None, fn, *args, iters=iters)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from recondet3d.data.pipelines.point_pipeline import voxel_pre_reduce
    from recondet3d.ops.ball_query import _ball_query_grid
    from recondet3d.ops.sampling import furthest_point_sample

    n_in = 6 * 364 * 644
    rng = np.random.default_rng(0)
    ref = np.load(os.path.join(REPO, "assets", "bench_sample",
                               "reference_points.npz"))["points"].astype(np.float32)
    idx = rng.integers(0, len(ref), n_in)
    pts = ref[idx] + rng.normal(0, 0.05, (n_in, 3)).astype(np.float32)
    msk = np.ones(n_in, bool)

    pcr = (-54.0, -54.0, -5.0, 54.0, 54.0, 6.0)
    f_vpr = jax.jit(lambda p, m: voxel_pre_reduce(
        p, m, voxel_size=0.1, point_cloud_range=pcr,
        max_out=min(393216, len(p))))
    p0, m0 = f_vpr(jnp.asarray(pts), jnp.asarray(msk))
    n_act = int(np.asarray(m0).sum())
    print(f"pre-reduced cloud: {p0.shape[0]} buffer, {n_act} active", flush=True)

    xyz = p0[:, :3]
    f_fps = jax.jit(lambda p, m: furthest_point_sample(p, 25000, m))
    anchor_idx = f_fps(xyz, m0)
    anchors = xyz[anchor_idx]
    jax.block_until_ready(anchors)

    ref_out = None
    results = []
    import itertools
    combos = list(itertools.product((64, 128), (256, 512), (2048, 8192)))
    combos += [(96, 256, 4096), (128, 256, 4096), (128, 512, 4096),
               (160, 512, 2048), (64, 128, 8192), (128, 128, 2048),
               (96, 128, 4096)]
    for grid_dim, chunk, block in combos:
            if True:
                f = jax.jit(lambda p, a, m, g=grid_dim, c=chunk, b=block:
                            _ball_query_grid(0.0, 0.5, 16, p, a, m,
                                             chunk=c, block=b, grid_dim=g))
                try:
                    out, dt = timeit(f, xyz, anchors, m0, iters=iters)
                except Exception as e:
                    print(f"g={grid_dim:4d} chunk={chunk:4d} block={block:5d}  "
                          f"FAILED {type(e).__name__}", flush=True)
                    continue
                out_np = np.asarray(out)
                if ref_out is None:
                    ref_out = out_np
                same = bool((out_np == ref_out).all())
                print(f"g={grid_dim:4d} chunk={chunk:4d} block={block:5d}  "
                      f"{dt:7.1f} ms  identical={same}", flush=True)
                results.append(((grid_dim, chunk, block), dt, same))

    best = min(results, key=lambda r: r[1])
    print(f"\nbest: grid_dim={best[0][0]} chunk={best[0][1]} "
          f"block={best[0][2]} at {best[1]:.1f} ms (identical={best[2]})",
          flush=True)

    # selection='first' (exact CUDA tie-break) vs 'any' (smallest sorted
    # position, unlocks exact early termination of the band scans) at the
    # default production config — the VERDICT-r3 ask: one number each.
    print("\n--- selection modes (default config g=64 chunk=128 block=8192) ---",
          flush=True)
    for sel in ("first", "any"):
        f = jax.jit(lambda p, a, m, s=sel: _ball_query_grid(
            0.0, 0.5, 16, p, a, m, chunk=128, block=8192, grid_dim=64,
            selection=s))
        out, dt = timeit(f, xyz, anchors, m0, iters=iters)
        # downstream semantics: the union MASK (which points are selected)
        u = np.zeros(p0.shape[0], bool)
        u[np.asarray(out).reshape(-1)] = True
        n_union = int(u.sum())
        print(f"selection={sel:5s}  {dt:7.1f} ms  union size {n_union}",
              flush=True)

    # shared-cell-sort upper bound (VERDICT-r3 ask): the pipeline builds
    # three independent sorted structures (FPS 16x16 bucket sort, BQ 64x64
    # point sort, compaction argsort) over the same pre-reduced cloud. The
    # most a shared structure can save is ~the cost of the sorts it
    # removes; measure ONE cell-sort (argsort + xyz/valid/index gathers)
    # at the production shape to bound the win.
    from _timing import timeit_scan

    def one_sort(p, m):
        G = 64
        lo = jnp.min(jnp.where(m[:, None], p[:, :2], jnp.inf), axis=0)
        hi = jnp.max(jnp.where(m[:, None], p[:, :2], -jnp.inf), axis=0)
        cell = jnp.maximum((hi - lo) / G, 0.5)
        rc = jnp.clip(jnp.floor((p[:, :2] - lo) / cell).astype(jnp.int32),
                      0, G - 1)
        pcell = jnp.where(m, rc[:, 0] * G + rc[:, 1], G * G)
        order = jnp.argsort(pcell, stable=True).astype(jnp.int32)
        return p[order], m[order], order, pcell[order]

    dt = timeit_scan(None, jax.jit(one_sort), xyz, m0, repeats=8, iters=iters)
    print(f"\none cell-sort (argsort + 4 gathers) at {p0.shape[0]} pts: "
          f"{dt:.2f} ms -> shared-structure ceiling ~2x this "
          f"(it could remove at most 2 of the 3 sorts)", flush=True)


if __name__ == "__main__":
    main()
