#!/usr/bin/env python
"""Point-pipeline benchmark on a REAL depth distribution.

The e2e bench's point-pipeline cost depends on the depth distribution of
the (random-weight) DA3 output. This script anchors that cost to reality:
it resamples the reference pipeline's own output point cloud
(assets/bench_sample/reference_points.npz, distilled from the reference
artifact output/sample_0_points.pcd — 40k real pseudo-lidar points) up to
the true pipeline input count (6 cams x 504-res depth maps ~ 1.77M points)
with small jitter, then times voxel-pre-reduce -> ball-query -> FPS ->
SparseRefinement on the chip with the production (da3-large e2e) caps.

Usage: python scripts/bench_point_pipeline.py [iters]
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

_DISPATCH_MS = 24.0  # tunnel dispatch+sync round trip (CLAUDE.md)


def sync(o):
    jax.tree_util.tree_map(
        lambda x: float(np.asarray(jax.device_get(x)).ravel()[0]), o
    )


def timeit(name, fn, *args, iters=5):
    for _ in range(2):
        out = fn(*args)
        sync(jax.tree_util.tree_map(lambda x: x.sum(), out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        sync(jax.tree_util.tree_map(lambda x: x.sum(), out))
    dt = max(0.0, (time.time() - t0) / iters * 1000 - _DISPATCH_MS)
    print(f"{name:30s} {dt:8.1f} ms", flush=True)
    return out, dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    # same production stage config as bench.build_pipeline (da3-large e2e)
    from recondet3d.data.pipelines.point_pipeline import (
        ball_query_downsample,
        fps_downsample,
        voxel_pre_reduce,
    )
    from recondet3d.models.refine import SparseRefinement

    # 6 cams x 364x644 depth at process_res 504 on 900x1600 inputs
    n_in = 6 * 364 * 644
    rng = np.random.default_rng(0)
    ref = np.load(os.path.join(REPO, "assets", "bench_sample",
                               "reference_points.npz"))["points"].astype(np.float32)
    idx = rng.integers(0, len(ref), n_in)
    pts = ref[idx] + rng.normal(0, 0.05, (n_in, 3)).astype(np.float32)
    msk = np.ones(n_in, bool)
    print(f"input: {n_in} points resampled from {len(ref)} reference points",
          flush=True)

    pcr = (-54.0, -54.0, -5.0, 54.0, 54.0, 6.0)
    pts_j, msk_j = jnp.asarray(pts), jnp.asarray(msk)

    f_vpr = jax.jit(lambda p, m: voxel_pre_reduce(
        p, m, voxel_size=0.1, point_cloud_range=pcr, max_out=min(393216, len(p))))
    (p0, m0), t_vpr = timeit("voxel_pre_reduce(0.1)", f_vpr, pts_j, msk_j,
                             iters=iters)
    print(f"  active after pre-reduce: {int(np.asarray(m0).sum())}", flush=True)

    f_bq = jax.jit(lambda p, m: ball_query_downsample(
        p, m, anchor_points=25000, max_radius=0.5, sample_num=16, compact=True))
    (p1, m1), t_bq = timeit("ball_query(25k anchors)", f_bq, p0, m0, iters=iters)

    f_fps = jax.jit(lambda p, m: fps_downsample(p, m, num_points=40000))
    (p2, m2), t_fps = timeit("fps(40k)", f_fps, p1, m1, iters=iters)

    refinement = SparseRefinement(
        max_voxels=40960, occ_max_voxels=65536,
        stage_caps=(40960, 32768, 24576, 16384), dtype=jnp.bfloat16,
    )
    variables = jax.jit(
        lambda r: refinement.init(r, p2[None], m2[None])
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    def f_ref(v, p, m):
        _, _, aux = refinement.apply(v, p[None], m[None])
        return aux["occupancy_logits"]

    _, t_ref = timeit("refinement", jax.jit(f_ref), variables, p2, m2,
                      iters=iters)

    total = t_vpr + t_bq + t_fps + t_ref
    print(f"{'TOTAL point pipeline':30s} {total:8.1f} ms "
          f"({6 / (total / 1000):.1f} cam-frames/s equivalent)", flush=True)


if __name__ == "__main__":
    main()
