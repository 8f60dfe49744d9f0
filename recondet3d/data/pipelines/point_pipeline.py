"""Pseudo-LiDAR point post-processing pipeline (jittable, static shapes).

Re-implementation of the reference respoint pipeline
(reference: projects/mmdet3d_plugin/datasets/pipelines/
respoint_post_processing.py — FilterPointByRange:171, BallQueryDownsample
:102 (FPS anchors + ball-query union), FPSDownsample:209, VoxelDownsample
:19, PointPadding:253, DepthAnything3Filter:290).

TPU design: every stage is (points (N, 3), valid (N,)) -> same, with
selection expressed as masks and compaction as one stable sort — no
dynamic shapes anywhere. The reference's "skip if already small enough"
branches become branchless ``where`` selects.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from recondet3d.core.registry import PIPELINES
from recondet3d.ops.ball_query import ball_query
from recondet3d.ops.cell_sort import cell_sort
from recondet3d.ops.sampling import furthest_point_sample
from recondet3d.ops.scatter import dynamic_scatter
from recondet3d.ops.voxelize import compute_grid_size, dynamic_voxelize

__all__ = [
    "filter_point_by_range",
    "ball_query_downsample",
    "fps_downsample",
    "voxel_downsample",
    "voxel_pre_reduce",
    "compact_points",
    "PointPipeline",
]


def filter_point_by_range(points, valid, point_cloud_range):
    """Mask points outside [xmin..zmax] (reference: FilterPointByRange:171)."""
    x0, y0, z0, x1, y1, z1 = point_cloud_range
    m = (
        (points[:, 0] >= x0) & (points[:, 0] <= x1)
        & (points[:, 1] >= y0) & (points[:, 1] <= y1)
        & (points[:, 2] >= z0) & (points[:, 2] <= z1)
    )
    return points, valid & m


def compact_points(points, valid, out_size: int):
    """Stable-compact valid rows to the front, truncated/padded to out_size."""
    order = jnp.argsort(~valid, stable=True)[:out_size]
    return points[order], valid[order]


def ball_query_downsample(
    points,
    valid,
    *,
    anchor_points: int,
    min_radius: float = 0.0,
    max_radius: float = 0.5,
    sample_num: int = 16,
    compact: bool = False,
    selection: str = "first",
    grid_dim: int = 64,
    grid_block: int = 8192,
    share_sort: bool = False,
):
    """Density-aware downsample: FPS anchors + union of ball-query neighbors,
    expressed as a mask over the input (reference: BallQueryDownsample:102).
    When n_valid <= anchor_points the input passes through unchanged.

    With ``compact=True`` the output buffer shrinks to the static bound
    anchor_points * (sample_num + 1) (exact — the union cannot exceed it),
    which roughly halves the cost of a following FPS at nuScenes scales.

    With ``share_sort=True`` ONE cell-sorted structure (ops/cell_sort.py,
    grid_dim^2 cells) serves the FPS anchor selection, the ball query,
    AND the compaction: the compacted output comes out in SPATIAL order,
    so a following FPS can skip its own sort too (fps_downsample's
    ``input_spatially_sorted``). Selected SETS are identical either way
    (the mask semantics are order-free); only FPS's exact-distance
    tie-breaks and the compacted row order differ — the reference keeps
    its (dynamic-shape) clouds in input order, so spatial order is an
    implementation-detail deviation at the same fidelity as the
    compaction itself.

    ``points`` may carry extra channels (e.g. xyzrgb); geometry uses the
    first 3 and the extras ride along through every selection."""
    N = points.shape[0]
    xyz = points[:, :3]
    structure = None
    if share_sort:
        structure = cell_sort(xyz, valid, grid_dim=grid_dim,
                              min_cell=max_radius)
    anchor_idx = furthest_point_sample(xyz, anchor_points, valid,
                                       presorted=structure)
    anchors = xyz[anchor_idx]
    nbr = ball_query(
        min_radius, max_radius, sample_num, xyz, anchors, points_valid=valid,
        selection=selection, grid_dim=grid_dim, grid_block=grid_block,
        structure=structure,
    )  # (A, S)
    sel = jnp.zeros((N,), bool)
    sel = sel.at[nbr.reshape(-1)].set(True)
    sel = sel.at[anchor_idx].set(True)
    sel = sel & valid
    passthrough = jnp.sum(valid) <= anchor_points
    out_valid = jnp.where(passthrough, valid, sel)
    if compact:
        cap = min(N, anchor_points * (sample_num + 1))
        # round up to a lane multiple for downstream kernels
        cap = ((cap + 127) // 128) * 128
        if share_sort:
            # compact in SPATIAL order via the shared structure: gather
            # the union mask into sorted space, stable-partition there,
            # and map back through sorig — one small sort over bools
            # instead of none saved here, but the OUTPUT is spatially
            # sorted, so the following FPS skips its ~10 ms sort. The
            # ORIGINAL-order-first selected point is hoisted to row 0
            # (key -1) so a following FPS seeds exactly where the
            # reference-order path would — the selected FPS SET is then
            # identical, not just statistically equivalent.
            sel_sorted = out_valid[structure.sorig]
            first_orig = jnp.argmax(out_valid).astype(jnp.int32)
            key = jnp.where(
                sel_sorted & (structure.sorig == first_orig),
                jnp.int8(-1), jnp.where(sel_sorted, jnp.int8(0), jnp.int8(1)),
            )
            perm = jnp.argsort(key, stable=True)[:cap]
            take = structure.sorig[perm]
            return points[take], sel_sorted[perm]
        return compact_points(points, out_valid, cap)
    return points, out_valid


def fps_downsample(points, valid, *, num_points: int,
                   input_spatially_sorted: bool = False):
    """FPS cap to num_points (reference: FPSDownsample:209). Returns
    (num_points, C) + mask; passthrough-compaction when already small.

    ``input_spatially_sorted``: the caller guarantees the buffer is
    already in spatially-coherent order (e.g. ball_query_downsample with
    ``share_sort=True``), so the Pallas kernel's own pre-sort is skipped
    — its per-block AABB pruning works on any coherent order."""
    presorted = None
    if input_spatially_sorted:
        presorted = (
            points[:, :3].astype(jnp.float32), valid,
            jnp.arange(points.shape[0], dtype=jnp.int32),
        )
    idx = furthest_point_sample(points[:, :3], num_points, valid,
                                presorted=presorted)
    fps_pts = points[idx]
    comp_pts, comp_valid = compact_points(points, valid, num_points)
    big = jnp.sum(valid) > num_points
    out = jnp.where(big, fps_pts, comp_pts)
    out_valid = jnp.where(big, jnp.ones((num_points,), bool), comp_valid)
    return out, out_valid


def voxel_downsample(
    points,
    valid,
    *,
    voxel_size,
    point_cloud_range,
    max_voxels: int,
):
    """Replace points by voxel centroids (reference: VoxelDownsample:19 —
    which computes per-voxel means in a python loop; here one scatter)."""
    coors = dynamic_voxelize(
        points, point_cloud_range=tuple(point_cloud_range), voxel_size=tuple(voxel_size)
    )
    coors = jnp.where(valid[:, None], coors, -1)
    grid = compute_grid_size(point_cloud_range, voxel_size)
    centroids, vcoors, _, _ = dynamic_scatter(
        points, coors, grid=grid, max_voxels=max_voxels, reduce="mean"
    )
    return centroids, vcoors[:, 0] >= 0


def voxel_pre_reduce(
    points,
    valid,
    *,
    voxel_size,
    point_cloud_range,
    max_out: int,
):
    """Voxel-grid pre-reduction: keep the FIRST valid point (input order)
    of each occupied voxel, compacted to a static (max_out, C) buffer.

    This is the reference's ``VoxelDownsample`` (respoint_post_processing
    .py:19) re-purposed as the pipeline's N-shrinking front stage (the
    reference config sketches exactly this: a voxel_size=0.1
    VoxelDownsample ahead of BallQuery/FPS,
    ResDet3D_nuscenes_mini_config.py:134-139), with representative-point
    semantics instead of centroids. Rationale, measured on v5e at
    N=2.7M: every centroid formulation needs a row-scatter/segment-sum
    (~220-245 ms regardless of index order), while this formulation is
    two int32 pair-sorts + small gathers (~15 ms):

      1. voxel id per point (elementwise; out-of-range/invalid -> sentinel)
      2. ``lax.sort`` (id, iota) -> sorted ids + permutation  (~5 ms)
      3. leader mask: first row of each id run                 (elementwise)
      4. ``lax.sort`` (~leader, perm') partition               (~5 ms)
      5. gather the first max_out leader rows                  (~5 ms)

    The representative point lies within a voxel diagonal (~0.17 m at
    0.1 m voxels) of the centroid — far below the downstream FPS-to-40k
    spacing over the 108 m x 108 m x 11 m range, and the exact-centroid
    ``voxel_downsample`` stays available where reference parity matters.

    Also subsumes ``filter_point_by_range`` when the grid range equals the
    filter range (out-of-grid points get the sentinel id). Leaders beyond
    max_out (id order) are dropped; size the cap generously.
    """
    N = points.shape[0]
    xyz = points[:, :3]
    vs = jnp.asarray(voxel_size, jnp.float32)
    if vs.ndim == 0:
        vs = jnp.broadcast_to(vs, (3,))
    lo = jnp.asarray(point_cloud_range[:3], jnp.float32)
    hi = jnp.asarray(point_cloud_range[3:], jnp.float32)
    grid = jnp.floor((hi - lo) / vs + 1e-4).astype(jnp.int32)  # (gx, gy, gz)
    c = jnp.floor((xyz - lo) / vs).astype(jnp.int32)
    ok = valid & jnp.all((c >= 0) & (c < grid), axis=1)
    ncell = grid[0] * grid[1] * grid[2]
    ids = jnp.where(ok, (c[:, 2] * grid[1] + c[:, 1]) * grid[0] + c[:, 0], ncell)
    iota = jnp.arange(N, dtype=jnp.int32)
    sid, perm = jax.lax.sort((ids, iota), num_keys=1)
    lead = jnp.concatenate(
        [sid[:1] < ncell, (sid[1:] != sid[:-1]) & (sid[1:] < ncell)]
    )
    # stable partition: leaders (key 0) to the front, id order preserved
    _, perm2 = jax.lax.sort(((~lead).astype(jnp.int32), perm), num_keys=1)
    sel = perm2[:max_out]
    out = points[sel]
    # partition puts all leaders first -> validity is just a count compare
    out_valid = jnp.arange(max_out) < jnp.sum(lead)
    return out, out_valid


class PointPipeline:
    """Config-driven composition (the DepthAnything3Filter equivalent)."""

    def __init__(self, transforms: Sequence[Dict[str, Any]]):
        self.transforms = list(transforms)

    def __call__(self, points, valid):
        for t in self.transforms:
            cfg = dict(t)
            kind = cfg.pop("type")
            cfg.pop("enabled", None)
            if kind == "FilterPointByRange":
                points, valid = filter_point_by_range(points, valid, cfg["point_cloud_range"])
            elif kind == "BallQueryDownsample":
                points, valid = ball_query_downsample(points, valid, **cfg)
            elif kind == "FPSDownsample":
                points, valid = fps_downsample(points, valid, **cfg)
            elif kind == "VoxelDownsample":
                points, valid = voxel_downsample(points, valid, **cfg)
            else:
                raise KeyError(f"unknown point transform {kind!r}")
        return points, valid
