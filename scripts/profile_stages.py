#!/usr/bin/env python
"""Per-stage timing of the e2e ResDet3D inference pipeline on the real chip.

Each stage is jitted separately (fusion across stage boundaries is lost, so
the sum slightly over-counts vs the fused bench number, but the ranking is
what matters).

Composition follows bench.py (RECONDET3D_BENCH_COMPOSITION, default
anchored): under 'anchored' the point stages consume the depth field
z-buffered from the reference's own output points — the realistic
production distribution, and the same data bench.py's headline times —
while 'raw' feeds DA3's own (random-weight) depth through. The two can
differ materially in the BQ/FPS/refinement stages (point density), so
every record is labeled.

Usage: python scripts/profile_stages.py [iters]
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

import bench


import _timing  # noqa: E402
from _timing import DISPATCH_MS as _DISPATCH_MS  # noqa: E402
from _timing import sync  # noqa: E402


def timeit(name, fn, *args, iters=5):
    out, _ = _timing.timeit(name, fn, *args, iters=iters, width=30)
    return out


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
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

    bk = model.reconstruction_backbone

    from recondet3d.data.input_processor import process_tensor_batch
    from recondet3d.data.pipelines.point_pipeline import (
        ball_query_downsample,
        filter_point_by_range,
        fps_downsample,
        voxel_pre_reduce,
    )
    from recondet3d.utils.geometry import depth_to_points_cam

    # stage 1: input processing
    f_inp = jax.jit(lambda im: process_tensor_batch(im, process_res=504)[0])
    x = timeit("input_processor", f_inp, img_j, iters=iters)

    # stage 2: DA3 forward
    da3_params = {"params": variables["params"]["reconstruction_backbone"]["da3"]}

    def f_da3(v, xx):
        out = bk.da3.apply(
            v, xx, use_ray_pose=bk.use_ray_pose,
            ref_view_strategy=bk.ref_view_strategy,
        )
        return {"depth": out["depth"], "intrinsics": out["intrinsics"]}

    f_da3 = jax.jit(f_da3)
    da3_out = timeit("da3_forward", f_da3, da3_params, x, iters=iters)

    # anchored composition: point stages consume the reference-derived
    # depth field (gated denormal coupling, exactly like bench.py)
    composition = os.environ.get("RECONDET3D_BENCH_COMPOSITION", "anchored")
    anchor = None
    if composition == "anchored":
        h, w = int(da3_out["depth"].shape[2]), int(da3_out["depth"].shape[3])
        anchor_np = bench.make_anchor_depth(c2l, h, w)
        if anchor_np is None:
            composition = "raw"
        else:
            anchor = jnp.asarray(anchor_np)
    print(f"[profile_stages] composition: {composition}", file=sys.stderr)

    # stage 3: unproject + range filter
    def f_unproj(do, c2l_):
        depth = do["depth"].astype(jnp.float32)
        if anchor is not None:
            depth = anchor + jnp.where(anchor > 0, depth * jnp.float32(1e-38), 0.0)
        intr = do["intrinsics"].astype(jnp.float32)
        pts_cam = depth_to_points_cam(depth, intr)
        valid = (depth > 0) & jnp.isfinite(depth) & (depth <= bk.max_depth)
        R = c2l_[..., :3, :3].astype(jnp.float32)
        t = c2l_[..., 3, :3].astype(jnp.float32)
        pts = jnp.einsum("bnhwc,bndc->bnhwd", pts_cam, R) + t[:, :, None, None]
        B = pts.shape[0]
        P = pts.shape[1] * pts.shape[2] * pts.shape[3]
        pts = pts.reshape(B, P, 3)
        msk = valid.reshape(B, P)
        if bk.voxel_pre_reduce > 0.0:
            return voxel_pre_reduce(
                pts[0], msk[0],
                voxel_size=bk.voxel_pre_reduce,
                point_cloud_range=tuple(bk.filter_range),
                max_out=min(bk.pre_reduce_cap, P),
            )
        return filter_point_by_range(pts[0], msk[0], tuple(bk.filter_range))

    f_unproj = jax.jit(f_unproj)
    stage3 = "unproject+prereduce" if bk.voxel_pre_reduce > 0 else "unproject+rangefilter"
    p0, m0 = timeit(stage3, f_unproj, da3_out, c2l_j, iters=iters)

    # stage 4: ball query
    f_bq = jax.jit(
        lambda p, m: ball_query_downsample(
            p, m, anchor_points=bk.bq_anchor_points,
            max_radius=bk.bq_max_radius, sample_num=bk.bq_sample_num,
            compact=True, selection=bk.bq_selection,
            grid_dim=bk.bq_grid_dim, grid_block=bk.bq_grid_block,
            share_sort=bk.bq_share_sort,
        )
    )
    p1, m1 = timeit("ball_query", f_bq, p0, m0, iters=iters)

    # stage 5: FPS
    f_fps = jax.jit(
        lambda p, m: fps_downsample(
            p, m, num_points=bk.num_points,
            input_spatially_sorted=bk.bq_share_sort,
        )
    )
    p2, m2 = timeit("fps", f_fps, p1, m1, iters=iters)

    # stage 6: refinement (voxelize + sparse encoder + BEV U-Net)
    ref_params = {
        col: variables[col]["reconstruction_backbone"]["refinement"]
        for col in variables
        if "refinement" in variables[col].get("reconstruction_backbone", {})
    }

    def f_ref(v, p, m):
        _, _, aux = bk.refinement.apply(v, p[None], m[None])
        return aux["occupancy_logits"]

    f_ref = jax.jit(f_ref)
    timeit("refinement", f_ref, ref_params, p2, m2, iters=iters)

    # whole fused pipeline for comparison (same depth_override anchoring
    # as bench.py when composition == anchored)
    def _run(v, i, c):
        out = model.apply(v, i, c, depth_override=anchor)
        return (
            out["pseudo_points"].sum(),
            out["aux"]["occupancy_logits"].sum(),
        )

    fwd = jax.jit(_run)
    for _ in range(2):
        out = fwd(variables, img_j, c2l_j)
        sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fwd(variables, img_j, c2l_j)
        sync(out)
    dt = max(1e-3, (time.time() - t0) / iters * 1000 - 2 * _DISPATCH_MS)
    print(f"{'TOTAL fused e2e':30s} {dt:8.1f} ms   "
          f"({bench.N_CAMS / (dt / 1000):.2f} frames/s, {composition})")


if __name__ == "__main__":
    main()
