"""Reconstruction backbone: DA3 multi-view depth -> pseudo-LiDAR points ->
post pipeline -> sparse refinement.

Re-implementation of the reference ReconstructionBackbone
(reference: projects/mmdet3d_plugin/models/backbone/
reconstruction_backbone.py:31-924): InputProcessor(504) -> frozen DA3
forward -> per-camera pinhole back-projection with predicted intrinsics
(:285-345) -> cam->LiDAR via the row-vector cam2lidar_rts convention
(pts @ M[:3,:3].T + M[3,:3], :371-373) -> range filter / ball-query /
FPS pipeline -> SparseRefinement.

TPU design: everything after image load is ONE jitted program with static
shapes — the per-camera python loops of the reference become batched
einsums, the per-sample pipeline becomes a vmap, and padding-to-batch-max
(:388-442) becomes fixed (num_points,) buffers with masks. DA3 is frozen
via stop_gradient (the reference freezes params + inference_mode,
:100-103, 563-572).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recondet3d.data.input_processor import process_tensor_batch
from recondet3d.data.pipelines.point_pipeline import (
    ball_query_downsample,
    filter_point_by_range,
    fps_downsample,
    voxel_pre_reduce,
)
from recondet3d.models.refine.refinement import SparseRefinement
from recondet3d.utils.geometry import depth_to_points_cam

__all__ = ["ReconstructionBackbone"]


class ReconstructionBackbone(nn.Module):
    da3: nn.Module  # DepthAnything3Net / NestedDepthAnything3Net
    refinement: Optional[SparseRefinement] = None
    process_res: int = 504
    ref_view_strategy: str = "saddle_balanced"
    use_ray_pose: bool = False
    max_depth: float = 100.0
    freeze_da3: bool = True
    # point pipeline (reference config: ResDet3D_nuscenes_mini_config.py:134-161)
    filter_range: Sequence[float] = (-54.0, -54.0, -5.0, 54.0, 54.0, 6.0)
    bq_anchor_points: int = 25000
    bq_max_radius: float = 0.5
    bq_sample_num: int = 16
    # "first" = exact CUDA tie-break (reference parity); "any" = smallest
    # sorted-position tie-break, which unlocks exact early termination of
    # the grid ball query's band scans (ops/ball_query.py)
    bq_selection: str = "first"
    # grid ball-query cost knobs (result-invariant), tuned at the
    # PRODUCTION point density (~78k active pre-reduced points — real
    # scenes / the anchored bench): grid_dim 128 / block 2048 runs the
    # query at 28.9 ms vs 35.1 for the dense-cloud tuning (64/8192);
    # see ops/ball_query.py's docstring for both sweeps
    bq_grid_dim: int = 128
    bq_grid_block: int = 2048
    # share ONE cell-sorted structure (ops/cell_sort.py) across the FPS
    # anchor selection, the ball query, and the compaction — the final
    # FPS then skips its own sort too. Selected sets are identical; only
    # FPS tie-breaks / internal buffer order differ (see
    # ball_query_downsample's docstring).
    bq_share_sort: bool = True
    num_points: int = 40000
    gt_num_points: int = 40000
    # Voxel-grid pre-reduction ahead of BQ/FPS (the reference config's
    # sketched VoxelDownsample stage, ResDet3D_nuscenes_mini_config.py:
    # 134-139, voxel_size=0.1). 0.0 = off (exact reference pipeline);
    # production configs/bench enable it — it shrinks N ~2.7M -> <=cap
    # for ~15 ms and makes the downstream BQ/FPS several times cheaper.
    voxel_pre_reduce: float = 0.0
    pre_reduce_cap: int = 393216

    @property
    def use_color(self) -> bool:
        return bool(self.refinement is not None and self.refinement.use_color)

    def predict_depth(self, img):
        """Stage 1 of predict_points: DA3 multi-view depth + intrinsics
        from raw images. Split out so callers (bench/serving) can
        software-pipeline DA3 of scene t+1 against the point pipeline of
        scene t. Returns (depth (B,N,h,w) f32, intr (B,N,3,3) f32,
        da3_out)."""
        x, _ = process_tensor_batch(img, process_res=self.process_res)
        da3_out = self.da3(
            x,
            use_ray_pose=self.use_ray_pose,
            ref_view_strategy=self.ref_view_strategy,
        )
        if self.freeze_da3:
            da3_out = {
                k: jax.lax.stop_gradient(v) if isinstance(v, jnp.ndarray) else v
                for k, v in da3_out.items()
            }
        depth = da3_out["depth"].astype(jnp.float32)  # (B, N, h, w)
        intr = da3_out["intrinsics"].astype(jnp.float32)  # (B, N, 3, 3)
        return depth, intr, da3_out

    def points_from_depth(self, depth, intr, img, cam2lidar_rts):
        """Stage 2 of predict_points: unproject + voxel pre-reduce +
        ball-query/FPS downsample. Returns (points (B, num_points, C),
        valid)."""
        B, N, H, W, _ = img.shape
        pts_cam = depth_to_points_cam(depth, intr)  # (B, N, h, w, 3)
        valid = (depth > 0) & jnp.isfinite(depth) & (depth <= self.max_depth)

        R = cam2lidar_rts[..., :3, :3].astype(jnp.float32)
        t = cam2lidar_rts[..., 3, :3].astype(jnp.float32)
        pts_lidar = jnp.einsum("bnhwc,bndc->bnhwd", pts_cam, R) + t[:, :, None, None]

        P = N * depth.shape[2] * depth.shape[3]
        C = 3
        if self.use_color:
            # colors sampled from the original images resized to the depth
            # resolution, scaled to [0, 1]
            # (reference: reconstruction_backbone.py:349-365)
            from recondet3d.utils.interpolation import resize_2d

            h, w = depth.shape[2], depth.shape[3]
            rgb = resize_2d(
                (img.astype(jnp.float32) / 255.0).reshape(B * N, H, W, 3),
                (h, w), mode="bilinear", align_corners=False,
            ).reshape(B, N, h, w, 3)
            pts_lidar = jnp.concatenate([pts_lidar, rgb], axis=-1)
            C = 6
        pts = pts_lidar.reshape(B, P, C)
        msk = valid.reshape(B, P)

        def pipeline(p, m):
            if self.voxel_pre_reduce > 0.0:
                # subsumes the range filter (out-of-grid -> sentinel id)
                p, m = voxel_pre_reduce(
                    p, m,
                    voxel_size=self.voxel_pre_reduce,
                    point_cloud_range=tuple(self.filter_range),
                    max_out=min(self.pre_reduce_cap, p.shape[0]),
                )
            else:
                p, m = filter_point_by_range(p, m, tuple(self.filter_range))
            p, m = ball_query_downsample(
                p, m,
                anchor_points=self.bq_anchor_points,
                max_radius=self.bq_max_radius,
                sample_num=self.bq_sample_num,
                compact=True,
                selection=self.bq_selection,
                grid_dim=self.bq_grid_dim,
                grid_block=self.bq_grid_block,
                share_sort=self.bq_share_sort,
            )
            return fps_downsample(
                p, m, num_points=self.num_points,
                input_spatially_sorted=self.bq_share_sort,
            )

        # static python loop over the (small) batch — vmap would push its
        # batching rule through the Pallas FPS kernel and the scan-based
        # ball query, degrading them ~16x (measured 20s vs 1.2s at B=1)
        outs = [pipeline(pts[b], msk[b]) for b in range(B)]
        pts = jnp.stack([o[0] for o in outs])
        msk = jnp.stack([o[1] for o in outs])
        return pts, msk

    def predict_points(self, img, cam2lidar_rts, depth_override=None):
        """img (B, N, H, W, 3) raw RGB 0..255; cam2lidar_rts (B, N, 4, 4)
        row-vector convention. Returns (points (B, num_points, C), valid,
        da3_out) — C=6 xyzrgb when the refinement uses colors
        (reference: reconstruction_backbone.py:349-365, 623-628).

        ``depth_override`` (B, N, h, w) replaces the predicted depth while
        keeping the whole DA3 forward live (benchmark anchoring: time DA3
        on real images but drive the point pipeline with a realistic
        externally-supplied depth distribution)."""
        depth, intr, da3_out = self.predict_depth(img)
        if depth_override is not None:
            # denormal coupling keeps the depth head from being DCE'd so
            # the benched DA3 cost stays the true full-forward cost; the
            # coupling term is gated so override holes (depth_override == 0
            # = "no point", masked by the pipeline's depth > 0 check) stay
            # exactly zero instead of becoming denormal-positive
            override = depth_override.astype(jnp.float32)
            depth = override + jnp.where(
                override > 0, depth * jnp.float32(1e-38), 0.0
            )
        pts, msk = self.points_from_depth(depth, intr, img, cam2lidar_rts)
        return pts, msk, da3_out

    def colorize_gt_points(self, gt_points, gt_valid, img, lidar2img):
        """Project GT LiDAR points into the multi-view images and sample
        RGB — first visible camera wins, zeros when not visible
        (reference: _get_gt_color_points, reconstruction_backbone.py:229-283).

        gt_points (B, M, 3); img (B, N, H, W, 3) raw RGB 0..255;
        lidar2img (B, N, 4, 4) column-form (proj = pts_h @ L.T).
        Returns (B, M, 6) xyzrgb. The reference's per-camera python loop
        becomes one batched einsum + take_along_axis gather."""
        B, M, _ = gt_points.shape
        N, H, W = img.shape[1], img.shape[2], img.shape[3]
        pts_h = jnp.concatenate(
            [gt_points, jnp.ones((B, M, 1), gt_points.dtype)], axis=-1
        )
        proj = jnp.einsum("bmc,bndc->bnmd", pts_h, lidar2img.astype(jnp.float32))
        z = proj[..., 2]
        u = proj[..., 0] / z
        v = proj[..., 1] / z
        vis = (z > 0) & (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)  # (B,N,M)
        ui = jnp.clip(u.astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, H - 1)
        flat = (img.astype(jnp.float32) / 255.0).reshape(B, N, H * W, 3)
        cols = jnp.take_along_axis(
            flat, (vi * W + ui)[..., None], axis=2
        )  # (B, N, M, 3)
        first = jnp.argmax(vis, axis=1)  # (B, M) first visible cam
        picked = jnp.take_along_axis(
            cols, first[:, None, :, None], axis=1
        )[:, 0]  # (B, M, 3)
        filled = jnp.any(vis, axis=1) & (
            gt_valid if gt_valid is not None else True
        )
        rgb = jnp.where(filled[..., None], picked, 0.0)
        return jnp.concatenate([gt_points, rgb], axis=-1)

    def __call__(
        self,
        img: jnp.ndarray,
        cam2lidar_rts: jnp.ndarray,
        gt_points: Optional[jnp.ndarray] = None,
        gt_valid: Optional[jnp.ndarray] = None,
        lidar2img: Optional[jnp.ndarray] = None,
        return_loss: bool = False,
        train: bool = False,
        depth_override: Optional[jnp.ndarray] = None,
    ):
        """Returns (pseudo_points, valid, losses, aux)."""
        pts, msk, da3_out = self.predict_points(
            img, cam2lidar_rts, depth_override=depth_override
        )
        if (
            self.use_color
            and gt_points is not None
            and gt_points.shape[-1] == 3
            and lidar2img is not None
        ):
            gt_points = self.colorize_gt_points(gt_points, gt_valid, img, lidar2img)
        losses: Dict[str, jnp.ndarray] = {}
        aux: Dict[str, Any] = {"da3": da3_out}
        if self.refinement is not None:
            refined, r_losses, r_aux = self.refinement(
                pts, msk, gt_points=gt_points, gt_valid=gt_valid,
                return_loss=return_loss, train=train,
            )
            losses.update(r_losses)
            aux.update(r_aux)
            pts = refined
        return pts, msk, losses, aux
