#!/usr/bin/env python
"""In-context stage costs of the fused e2e program, by prefix differencing.

scripts/profile_stages.py jits each stage separately; on this pipeline the
stage costs are strongly DATA-dependent (scatter conflict rates, AABB
pruning efficiency), and separately-jitted stages also lose cross-stage
fusion — their sum can disagree with the fused bench number by several x.
This script instead runs PREFIXES of the real forward (each ending in a
fold-proof scalar), times each, and reports first differences: the cost of
every stage as it actually runs inside the fused program.

Each prefix is its own ``jax.jit`` with a STATIC ``upto`` (a previous
revision gated stages with ``lax.cond`` on a runtime scalar so one
compile served all prefixes, but that program was too large for the
remote-compile service — it ground for ~50 min and died with a broken
pipe). Static prefixes compile in minutes each, print incrementally,
and land in the on-disk compile cache; untaken stages are simply absent
from the program instead of zero-filled cond branches.

Modes (PROFILE_PREFIX_MODE, comma list; default "anchored"):
  anchored — EXACTLY the bench headline composition: DA3 runs live, the
             point stages consume the z-buffered anchor depth through the
             same gated denormal coupling bench.py uses. Prefix deltas
             here ARE the in-context costs of the 377 ms headline.
  raw      — the point stages consume DA3's own (random-weight) depth.
  inject   — legacy: swaps the unprojected cloud for a resample of
             reference_points.npz AFTER unprojection (847k all-valid
             points — a denser load than the anchored z-buffer).

Usage: python scripts/profile_prefix.py [iters]
"""

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp

import bench

_DISPATCH_MS = 24.0  # fixed tunnel dispatch+sync round trip (CLAUDE.md)


def timeit(fn, *args, iters):
    for _ in range(2):
        out = fn(*args)
        float(np.asarray(jax.device_get(out)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        float(np.asarray(jax.device_get(out)))
    return max(0.0, (time.time() - t0) / iters * 1000 - _DISPATCH_MS)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    model = bench.build_pipeline(jnp.bfloat16)
    rng = np.random.default_rng(0)
    img, c2l = bench.make_inputs(rng)
    img_j, c2l_j = jnp.asarray(img), jnp.asarray(c2l)
    variables = jax.jit(lambda r: model.init(r, img_j, c2l_j))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(variables)

    if os.environ.get("RECONDET3D_BENCH_BF16_PARAMS", "1") != "0":
        # bench.py's serving-time storage cast (result-identical)
        from recondet3d.api.weights import cast_trunk_params_bf16

        variables = jax.jit(
            lambda v: dict(v, params=cast_trunk_params_bf16(v["params"]))
        )(variables)
        jax.block_until_ready(variables)

    ref_pts = jnp.asarray(
        np.load(os.path.join(REPO, "assets", "bench_sample",
                             "reference_points.npz"))["points"]
        .astype(np.float32)
    )

    from recondet3d.data.input_processor import process_tensor_batch
    from recondet3d.data.pipelines.point_pipeline import (
        ball_query_downsample,
        filter_point_by_range,
        fps_downsample,
        voxel_pre_reduce,
    )
    from recondet3d.utils.geometry import depth_to_points_cam

    da3_vars = {
        col: variables[col]["reconstruction_backbone"]["da3"]
        for col in variables
        if "da3" in variables[col].get("reconstruction_backbone", {})
    }
    ref_vars = {
        col: variables[col]["reconstruction_backbone"]["refinement"]
        for col in variables
        if "refinement" in variables[col].get("reconstruction_backbone", {})
    }
    bk = model.reconstruction_backbone
    refinement = bk.refinement

    # anchor depth at the model's processed resolution (host-side, untimed)
    from recondet3d.data.input_processor import compute_process_shape

    _, _, rh, rw = compute_process_shape(bench.IMG_H, bench.IMG_W,
                                         bk.process_res)
    anchor_np = bench.make_anchor_depth(c2l, rh, rw)
    anchor_j = None if anchor_np is None else jnp.asarray(anchor_np)

    def program(dv, rv, img_, c2l_, ref_pts, anchor_d, *, upto, mode):
        # dv/rv (the DA3 / refinement variable trees) MUST be jit ARGUMENTS:
        # closed-over they lower as 6.1 GB of captured constants at the
        # nested-giant preset, which the remote-compile service rejects
        inject = mode == "inject"
        def gated(k, fn):
            if upto >= k:
                return fn()
            return jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), jax.eval_shape(fn)
            )

        acc = jnp.float32(0)
        x, _ = process_tensor_batch(img_, process_res=bk.process_res)
        acc += jnp.sum(x[0, 0, :2, :2].astype(jnp.float32))

        def run_da3():
            out = bk.da3.apply(
                dv, x, use_ray_pose=bk.use_ray_pose,
                ref_view_strategy=bk.ref_view_strategy,
            )
            return (out["depth"].astype(jnp.float32),
                    out["intrinsics"].astype(jnp.float32))

        depth, intr = gated(1, run_da3)
        acc += depth[0, 0, 0, 0] + intr[0, 0, 0, 0]
        if mode == "anchored":
            # the bench's gated denormal coupling: DA3 stays load-bearing,
            # anchor holes (0 = invalid) stay exactly zero
            depth = anchor_d + jnp.where(
                anchor_d > 0, depth * jnp.float32(1e-38), 0.0
            )

        def run_unproj():
            pts_cam = depth_to_points_cam(depth, intr)
            valid = (depth > 0) & jnp.isfinite(depth) & (depth <= bk.max_depth)
            R = c2l_[..., :3, :3].astype(jnp.float32)
            t = c2l_[..., 3, :3].astype(jnp.float32)
            pts = jnp.einsum("bnhwc,bndc->bnhwd", pts_cam, R) + t[:, :, None, None]
            B = pts.shape[0]
            P = pts.shape[1] * pts.shape[2] * pts.shape[3]
            p, m = pts.reshape(B, P, 3)[0], valid.reshape(B, P)[0]

            def injected():
                # production point load; data dependency kept alive by a
                # term that is always 0 at runtime but not foldable
                keep = jnp.where(p[:, :1] > 2.0**30, 1.0, 0.0)
                idx = jnp.arange(P, dtype=jnp.int32) % ref_pts.shape[0]
                jit_r = jax.random.uniform(
                    jax.random.PRNGKey(1), (P, 3), minval=-0.05, maxval=0.05
                )
                return ref_pts[idx] + jit_r + keep * p, keep[:, 0] <= 0.5

            return injected() if inject else (p, m)

        p, m = gated(2, run_unproj)
        acc += jnp.sum(p[:128, 0]) + jnp.sum(m[:128])

        def run_prereduce():
            if bk.voxel_pre_reduce > 0.0:
                return voxel_pre_reduce(
                    p, m, voxel_size=bk.voxel_pre_reduce,
                    point_cloud_range=tuple(bk.filter_range),
                    max_out=min(bk.pre_reduce_cap, p.shape[0]),
                )
            return filter_point_by_range(p, m, tuple(bk.filter_range))

        p1, m1 = gated(3, run_prereduce)
        acc += jnp.sum(p1[:128, 0]) + jnp.sum(m1)

        def run_bq():
            return ball_query_downsample(
                p1, m1, anchor_points=bk.bq_anchor_points,
                max_radius=bk.bq_max_radius, sample_num=bk.bq_sample_num,
                compact=True, selection=bk.bq_selection,
                grid_dim=bk.bq_grid_dim, grid_block=bk.bq_grid_block,
                share_sort=bk.bq_share_sort,
            )

        p2, m2 = gated(4, run_bq)
        acc += jnp.sum(p2[:128, 0]) + jnp.sum(m2)

        def run_fps():
            return fps_downsample(
                p2, m2, num_points=bk.num_points,
                input_spatially_sorted=bk.bq_share_sort,
            )

        p3, m3 = gated(5, run_fps)
        acc += jnp.sum(p3[:128, 0]) + jnp.sum(m3)

        def run_refine():
            _, _, aux = refinement.apply(rv, p3[None], m3[None])
            return aux["occupancy_logits"].astype(jnp.float32)

        logits = gated(6, run_refine)
        return acc + jnp.sum(logits)

    names = [
        "input_processor", "da3_forward", "unproject(+inject)",
        "prereduce/rangefilter", "ball_query", "fps", "refinement",
    ]
    legacy = os.environ.get("PROFILE_PREFIX_INJECT")  # legacy "1"/"0"
    if legacy is not None:
        modes = ["inject" if int(legacy) else "raw"]
    else:
        modes = os.environ.get("PROFILE_PREFIX_MODE", "anchored").split(",")
    for mode in modes:
        if mode == "anchored" and anchor_j is None:
            print("anchor assets unavailable -> raw", flush=True)
            mode = "raw"
        print(f"mode: {mode}", flush=True)
        prev = 0.0
        for k, name in enumerate(names):
            fn = jax.jit(functools.partial(program, upto=k, mode=mode))
            t = timeit(fn, da3_vars, ref_vars, img_j, c2l_j, ref_pts,
                       anchor_j, iters=iters)
            print(f"prefix<={name:22s} {t:8.1f} ms   (+{t - prev:7.1f} ms)",
                  flush=True)
            prev = t


if __name__ == "__main__":
    main()
