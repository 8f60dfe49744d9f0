"""DA3 network assembly: backbone + heads (+ nested metric branch).

Re-implementation of the reference network composition
(reference: depth_anything_3/model/da3.py:40-442 — DepthAnything3Net
orchestrating depth / camera / GS / sky passes, and
NestedDepthAnything3Net combining an any-view branch with a metric branch
via least-squares scale alignment).

TPU design notes:
- the whole forward is one jittable function: masked quantiles replace the
  reference's dynamic boolean indexing + random subsampling
  (da3.py:166-173, 395-408), guards become ``where``s.
- backbone runs in ``dtype`` (bf16 in production — the reference autocasts,
  api.py:116-148); heads & camera math are fp32 like the reference's
  autocast-disabled blocks (da3.py:139-148).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from recondet3d.utils.alignment import (
    apply_metric_scaling,
    compute_alignment_mask,
    compute_sky_mask,
    least_squares_scale_scalar,
    masked_quantile,
    set_sky_regions_to_max_depth,
)
from recondet3d.utils.geometry import affine_inverse, as_homogeneous, map_pdf_to_opacity
from recondet3d.utils.transforms import pose_encoding_to_extri_intri

__all__ = ["DepthAnything3Net", "NestedDepthAnything3Net"]

PATCH_SIZE = 14


class DepthAnything3Net(nn.Module):
    """Composes backbone + head (+cam_dec/cam_enc, gs_head/gs_adapter).

    Submodules are passed as (unbound) linen modules, mirroring the
    reference's reflective ``create_object`` wiring (da3.py:69-99).
    """

    net: nn.Module
    head: nn.Module
    cam_dec: Optional[nn.Module] = None
    cam_enc: Optional[nn.Module] = None
    gs_head: Optional[nn.Module] = None
    gs_adapter: Optional[Any] = None  # plain callable, no params

    def __call__(
        self,
        x: jnp.ndarray,
        extrinsics: Optional[jnp.ndarray] = None,
        intrinsics: Optional[jnp.ndarray] = None,
        export_feat_layers: Sequence[int] = (),
        infer_gs: bool = False,
        use_ray_pose: bool = False,
        ref_view_strategy: str = "saddle_balanced",
    ) -> Dict[str, jnp.ndarray]:
        """x: (B, S, H, W, 3) normalized images. Returns dict with
        depth/depth_conf/(sky)/extrinsics/intrinsics/(gaussians)/aux."""
        B, S, H, W, _ = x.shape

        cam_token = None
        if extrinsics is not None and self.cam_enc is not None:
            cam_token = self.cam_enc(extrinsics, intrinsics, (H, W))

        feats, aux_feats = self.net(
            x,
            cam_token=cam_token,
            export_feat_layers=tuple(export_feat_layers),
            ref_view_strategy=ref_view_strategy,
        )

        output: Dict[str, jnp.ndarray] = dict(self.head(feats, H, W, patch_start_idx=0))

        if use_ray_pose:
            output = self._ray_pose(output, H, W)
        else:
            output = self._camera_estimation(feats, H, W, output)
        if infer_gs and self.gs_head is not None:
            output = self._gs(feats, H, W, output, x, extrinsics)

        output = self._mono_sky(output)

        if export_feat_layers:
            aux = {}
            for feat, layer in zip(aux_feats, export_feat_layers):
                aux[f"feat_layer_{layer}"] = feat.reshape(
                    B, S, H // PATCH_SIZE, W // PATCH_SIZE, feat.shape[-1]
                )
            output["aux"] = aux
        return output

    def _camera_estimation(self, feats, H, W, output):
        if self.cam_dec is None:
            return output
        pose_enc = self.cam_dec(feats[-1][1])
        output.pop("ray", None)
        output.pop("ray_conf", None)
        c2w, ixt = pose_encoding_to_extri_intri(pose_enc, (H, W))
        output["extrinsics"] = affine_inverse(c2w)
        output["intrinsics"] = ixt
        return output

    def _ray_pose(self, output, H, W):
        if "ray" not in output:
            return output
        from recondet3d.utils.ray_utils import get_extrinsic_from_camray

        ray = output.pop("ray")
        ray_conf = output.pop("ray_conf")
        extr_w2c, focal, pp = get_extrinsic_from_camray(
            ray, ray_conf, ray.shape[-3], ray.shape[-2]
        )
        c2w = affine_inverse(extr_w2c)[..., :3, :]
        B, S = c2w.shape[:2]
        zeros = jnp.zeros((B, S))
        ones = jnp.ones((B, S))
        fx = focal[..., 0] / 2 * W
        fy = focal[..., 1] / 2 * H
        cx = pp[..., 0] * W * 0.5
        cy = pp[..., 1] * H * 0.5
        intr = jnp.stack(
            [
                jnp.stack([fx, zeros, cx], -1),
                jnp.stack([zeros, fy, cy], -1),
                jnp.stack([zeros, zeros, ones], -1),
            ],
            axis=-2,
        )
        output["extrinsics"] = c2w
        output["intrinsics"] = intr
        return output

    def _gs(self, feats, H, W, output, images, gt_extrinsics):
        assert "depth" in output, "GS head needs multi-view depth"
        ctx_extr = as_homogeneous(output["extrinsics"])
        ctx_intr = output["intrinsics"]
        gt_extr = None if gt_extrinsics is None else as_homogeneous(gt_extrinsics)

        # de-normalize images back to [0,1] RGB for the image merger
        gs_outs = self.gs_head(feats, H, W, images=images, patch_start_idx=0)
        gaussians = self.gs_adapter(
            extrinsics=ctx_extr,
            intrinsics=ctx_intr,
            depths=output["depth"],
            opacities=map_pdf_to_opacity(gs_outs["raw_gs_conf"]),
            raw_gaussians=gs_outs["raw_gs"],
            image_shape=(H, W),
            gt_extrinsics=gt_extr,
        )
        output["gaussians"] = gaussians
        return output

    def _mono_sky(self, output):
        """Clamp sky pixels to the 99th-percentile depth
        (reference: da3.py:155-180 _process_mono_sky_estimation)."""
        if "sky" not in output:
            return output
        non_sky = compute_sky_mask(output["sky"], threshold=0.3)
        n_non_sky = jnp.sum(non_sky)
        n_sky = jnp.sum(~non_sky)
        ok = (n_non_sky > 10) & (n_sky > 10)
        non_sky_max = masked_quantile(output["depth"], non_sky, 0.99)
        clamped, _ = set_sky_regions_to_max_depth(output["depth"], None, non_sky, non_sky_max)
        output["depth"] = jnp.where(ok, clamped, output["depth"])
        return output


class NestedDepthAnything3Net(nn.Module):
    """Any-view branch + metric branch with least-squares scale alignment
    (reference: da3.py:308-442)."""

    anyview: nn.Module
    metric: nn.Module
    sky_depth_def: float = 200.0

    def __call__(
        self,
        x: jnp.ndarray,
        extrinsics=None,
        intrinsics=None,
        export_feat_layers: Sequence[int] = (),
        infer_gs: bool = False,
        use_ray_pose: bool = False,
        ref_view_strategy: str = "saddle_balanced",
    ) -> Dict[str, jnp.ndarray]:
        output = self.anyview(
            x,
            extrinsics,
            intrinsics,
            export_feat_layers=export_feat_layers,
            infer_gs=infer_gs,
            use_ray_pose=use_ray_pose,
            ref_view_strategy=ref_view_strategy,
        )
        metric_output = self.metric(x)

        metric_depth = apply_metric_scaling(metric_output["depth"], output["intrinsics"])
        non_sky = compute_sky_mask(metric_output["sky"], threshold=0.3)

        # scale alignment (reference: da3.py:385-416)
        median_conf = masked_quantile(output["depth_conf"], non_sky, 0.5)
        align_mask = compute_alignment_mask(
            output["depth_conf"], non_sky, output["depth"], metric_depth, median_conf
        )
        scale = least_squares_scale_scalar(metric_depth, output["depth"], mask=align_mask)
        scale = jnp.where(jnp.sum(align_mask) > 0, scale, 1.0)

        depth = output["depth"] * scale
        extr = output["extrinsics"].at[..., :3, 3].multiply(scale)

        # sky handling (reference: da3.py:418-442)
        non_sky_max = jnp.minimum(
            masked_quantile(depth, non_sky, 0.99), self.sky_depth_def
        )
        depth, depth_conf = set_sky_regions_to_max_depth(
            depth, output["depth_conf"], non_sky, non_sky_max
        )

        output["depth"] = depth
        output["depth_conf"] = depth_conf
        output["extrinsics"] = extr
        output["sky"] = metric_output["sky"]
        output["is_metric"] = jnp.int32(1)
        output["scale_factor"] = scale
        return output
