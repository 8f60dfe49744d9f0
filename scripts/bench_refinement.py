#!/usr/bin/env python
"""Dissect SparseRefinement's forward cost on the chip.

profile_stages.py times refinement as one block (~122 ms isolated); this
script splits it into voxelize+VFE / SparseEncoder / BEV U-Net, each
separately jitted on the production shapes (40k reference-distribution
points, 41x1440x1440 sparse grid, 180x180 BEV), so the next optimization
targets the real sub-stage.

Measured (v5e, 2026-08): voxelize+VFE 28 ms / SparseEncoder 110 ms /
BEV U-Net 8 ms; fused forward ~122 ms. Within the encoder (see
bench_compact_conv.py): 4 neighbor-map builds ~30 ms, 17 subm convs
~45 ms, the rest is downsample convs + BN/ReLU passes.

Usage: python scripts/bench_refinement.py [iters]
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


def timeit(name, fn, *args, iters=5):
    out, _ = _timeit(name, fn, *args, iters=iters)
    return out


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from recondet3d.models.refine import SparseRefinement
    from recondet3d.models.refine.refinement import batch_voxelize
    from recondet3d.models.refine.vfe import hard_simple_vfe

    rng = np.random.default_rng(0)
    ref = np.load(os.path.join(REPO, "assets", "bench_sample",
                               "reference_points.npz"))["points"].astype(np.float32)
    idx = rng.integers(0, len(ref), 40000)
    pts = jnp.asarray(ref[idx] + rng.normal(0, 0.02, (40000, 3)).astype(np.float32))
    msk = jnp.ones((40000,), bool)

    refinement = SparseRefinement(
        max_voxels=40960, occ_max_voxels=65536,
        stage_caps=(40960, 32768, 24576, 16384), dtype=jnp.bfloat16,
    )
    variables = jax.jit(
        lambda r: refinement.init(r, pts[None], msk[None])
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    pcr = refinement.point_cloud_range
    vs = refinement.voxel_size

    @jax.jit
    def f_vox(p, m):
        voxels, coors, nums = batch_voxelize(
            p[None], m[None], point_cloud_range=pcr, voxel_size=vs,
            max_points=refinement.max_num_points,
            max_voxels=refinement.max_voxels,
        )
        feats = hard_simple_vfe(voxels, nums, num_features=3)
        feats = jnp.where((coors[:, 0] >= 0)[:, None], feats, 0)
        return feats.astype(jnp.bfloat16), coors

    feats, coors = timeit("voxelize+VFE", f_vox, pts, msk, iters=iters)

    @jax.jit
    def f_enc(v, f, c):
        return refinement.apply(
            v, f, c, method=lambda m, ff, cc: m.middle_encoder(ff, cc, 1)
        )

    bev = timeit("SparseEncoder", f_enc, variables, feats, coors, iters=iters)

    @jax.jit
    def f_unet(v, x):
        return refinement.apply(
            v, x, method=lambda m, xx: m.bev_height_occupancy(xx)
        )

    timeit("BEV U-Net", f_unet, variables, bev, iters=iters)

    @jax.jit
    def f_all(v, p, m):
        _, _, aux = refinement.apply(v, p[None], m[None])
        return aux["occupancy_logits"]

    timeit("refinement (fused)", f_all, variables, pts, msk, iters=iters)

    # scan-amortized versions (single-dispatch mins above still carry
    # tunnel noise; these amortize one dispatch over 8 in-jit calls)
    from _timing import timeit_scan  # noqa: E402
    timeit_scan("SparseEncoder (scan)", lambda f, v, c: f_enc(v, f, c),
                feats, variables, coors, repeats=8, iters=iters)
    timeit_scan("refinement fused (scan)", lambda p, v, m: f_all(v, p, m),
                pts, variables, msk, repeats=8, iters=iters)


if __name__ == "__main__":
    main()
