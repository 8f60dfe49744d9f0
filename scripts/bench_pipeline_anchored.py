#!/usr/bin/env python
"""Sweep the point-pipeline kernels on the ANCHORED distribution — the
bench headline's actual data (z-buffered reference depth -> ~98k valid
clustered points in the static 393k buffer).

Round-4 finding this script exists to fix: the FPS kernel's
(block_rows, group) were tuned on fully-dense 393k-active buffers
(bench_fps_tuning.py), but the anchored/production regime compacts ~90k
valid points into the buffer's front — at 256-row blocks that is ~3
active blocks, so the per-block AABB pruning has nothing to prune and
anchored FPS measured 26.6 ms vs 13.2 raw (profile_stages). Finer blocks
trade scalar-sweep cost for pruning that actually bites at this density.

Stages swept here, each at the exact anchored shapes:
  1. FPS 25k anchors from the pre-reduced cloud  (block_rows x group)
  2. ball query (grid_dim, chunk, block) + selection first|any
  3. FPS 40k from the BQ-compacted union          (block_rows x group)

Usage: python scripts/bench_pipeline_anchored.py [iters]
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
import bench  # noqa: E402


def anchored_cloud():
    """(points (P,3), valid (P,)) exactly as the bench's anchored pipeline
    sees them after unprojection (nominal intrinsics, the same ones the
    z-buffer used) + voxel pre-reduce."""
    from recondet3d.data.pipelines.point_pipeline import voxel_pre_reduce

    rng = np.random.default_rng(0)
    img, c2l = bench.make_inputs(rng)
    ph, pw = 280, 504
    depth = bench.make_anchor_depth(c2l, ph, pw)[0]  # (N, ph, pw)
    fx = 1266.0 * pw / bench.IMG_W
    fy = 1266.0 * ph / bench.IMG_H
    cx, cy = pw / 2.0, ph / 2.0
    uu, vv = np.meshgrid(np.arange(pw), np.arange(ph))
    pts_all = []
    val_all = []
    for n in range(bench.N_CAMS):
        z = depth[n]
        x = (uu - cx) / fx * z
        y = (vv - cy) / fy * z
        p_cam = np.stack([x, y, z], -1).reshape(-1, 3)
        R = c2l[0, n, :3, :3]
        t = c2l[0, n, 3, :3]
        pts_all.append(p_cam @ R.T + t)
        val_all.append((z > 0).reshape(-1))
    pts = np.concatenate(pts_all).astype(np.float32)
    val = np.concatenate(val_all)
    pcr = (-54.0, -54.0, -5.0, 54.0, 54.0, 6.0)
    f = jax.jit(lambda p, m: voxel_pre_reduce(
        p, m, voxel_size=0.1, point_cloud_range=pcr,
        max_out=min(393216, len(p))))
    p0, m0 = f(jnp.asarray(pts), jnp.asarray(val))
    print(f"anchored cloud: {p0.shape[0]} buffer, "
          f"{int(np.asarray(m0).sum())} active", flush=True)
    return p0, m0


def sweep_fps(tag, pts, msk, k, iters):
    from recondet3d.ops.fps_pallas import furthest_point_sample_pallas

    print(f"--- FPS {tag}: {k} from {pts.shape[0]} buffer ---", flush=True)
    best = None
    for block_rows, group in [(256, 4), (128, 4), (128, 8), (64, 8),
                              (64, 16), (32, 16)]:
        f = jax.jit(lambda p, m, br=block_rows, g=group:
                    furthest_point_sample_pallas(
                        p[:, :3], k, m, block_rows=br, group=g))
        try:
            dt = _timing.timeit_scan(None, f, pts, msk, repeats=4,
                                     iters=iters)
        except Exception as e:
            print(f"br={block_rows:4d} g={group:3d}  FAILED "
                  f"{type(e).__name__}: {e}", flush=True)
            continue
        print(f"br={block_rows:4d} g={group:3d}  {dt:7.2f} ms", flush=True)
        if best is None or dt < best[0]:
            best = (dt, block_rows, group)
    print(f"best {tag}: block_rows={best[1]} group={best[2]} "
          f"at {best[0]:.2f} ms", flush=True)
    return best


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    p0, m0 = anchored_cloud()

    sweep_fps("25k-anchors", p0, m0, 25000, iters)

    # ball query at the anchored density
    from recondet3d.data.pipelines.point_pipeline import (
        ball_query_downsample,
    )
    from recondet3d.ops.ball_query import _ball_query_grid
    from recondet3d.ops.sampling import furthest_point_sample

    xyz = p0[:, :3]
    anchors = xyz[jax.jit(lambda p, m: furthest_point_sample(p, 25000, m))(
        xyz, m0)]
    jax.block_until_ready(anchors)
    print("--- ball query (anchored density) ---", flush=True)
    for sel in ("first", "any"):
        for grid_dim, chunk, block in [(64, 128, 8192), (96, 128, 4096),
                                       (128, 128, 2048), (128, 256, 2048)]:
            f = jax.jit(lambda p, a, m, s=sel, g=grid_dim, c=chunk, b=block:
                        _ball_query_grid(0.0, 0.5, 16, p, a, m, chunk=c,
                                         block=b, grid_dim=g, selection=s))
            try:
                dt = _timing.timeit_scan(None, f, xyz, anchors, m0,
                                         repeats=4, iters=iters)
            except Exception as e:
                print(f"sel={sel:5s} g={grid_dim:4d} chunk={chunk:4d} "
                      f"block={block:5d}  FAILED {type(e).__name__}",
                      flush=True)
                continue
            print(f"sel={sel:5s} g={grid_dim:4d} chunk={chunk:4d} "
                  f"block={block:5d}  {dt:7.2f} ms", flush=True)

    # FPS-40k on the BQ-compacted union (the second FPS call site)
    f_bq = jax.jit(lambda p, m: ball_query_downsample(
        p, m, anchor_points=25000, max_radius=0.5, sample_num=16,
        compact=True))
    p1, m1 = f_bq(p0, m0)
    print(f"bq output: {p1.shape[0]} buffer, "
          f"{int(np.asarray(m1).sum())} active", flush=True)
    sweep_fps("40k-final", p1, m1, 40000, iters)


if __name__ == "__main__":
    main()
