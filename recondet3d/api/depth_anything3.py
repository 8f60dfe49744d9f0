"""DepthAnything3-compatible public inference API on the JAX stack.

Re-implementation of the reference HF-hub model wrapper
(reference: depth_anything_3/api.py:48-463): preprocess -> forward (bf16)
-> Prediction -> umeyama alignment to input extrinsics -> export. Weights
load from local safetensors (the reference pulls from HF hub via
PyTorchModelHubMixin, api.py:76-90 — the same files convert through
recondet3d.api.weights; without a checkpoint the model runs randomly
initialized, flagged on the returned object).

TPU design: the forward is jitted once per (S, H, W) shape and cached;
extrinsics normalization (first-camera-relative + median-translation
scale, api.py:344-382) runs in numpy on host like the reference's
preprocessing.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from recondet3d.data.input_processor import InputProcessor
from recondet3d.data.output_processor import OutputProcessor
from recondet3d.models.da3.presets import MODEL_REGISTRY, build_da3
from recondet3d.specs import Prediction
from recondet3d.utils.logger import get_logger
from recondet3d.utils.pose_align import align_poses_umeyama

__all__ = ["DepthAnything3"]

logger = get_logger("recondet3d.api")


def _affine_inverse_np(A):
    R = A[..., :3, :3]
    T = A[..., :3, 3:]
    Rt = np.swapaxes(R, -1, -2)
    out = np.tile(np.eye(4, dtype=A.dtype), A.shape[:-2] + (1, 1))
    out[..., :3, :3] = Rt
    out[..., :3, 3:] = -Rt @ T
    return out


def _to44(ext):
    if ext.shape[-2] == 3:
        out = np.tile(np.eye(4, dtype=ext.dtype), ext.shape[:-2] + (1, 1))
        out[..., :3, :] = ext
        return out
    return ext


class DepthAnything3:
    """Usage: ``DepthAnything3.from_pretrained("depth-anything/DA3-SMALL")``
    then ``.inference([img, ...])`` -> Prediction."""

    def __init__(self, model, params, model_name: str, random_init: bool = False):
        import jax

        self.model = model
        self.params = params
        self.model_name = model_name
        self.random_init = random_init
        self.input_processor = InputProcessor()
        self.output_processor = OutputProcessor()
        self._jitted: Dict[tuple, object] = {}
        self._jax = jax

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(
        cls,
        name: str,
        cache_dir: str = "ckpts",
        dtype=None,
        checkpoint: Optional[str] = None,
        with_gs: Optional[bool] = None,
    ) -> "DepthAnything3":
        import jax
        import jax.numpy as jnp

        dtype = dtype or (jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32)
        model = build_da3(name, dtype=dtype, with_gs=with_gs)
        # init exercising every optional branch (GT-pose conditioning, GS
        # head) so all params materialize for checkpoint loading
        x0 = jnp.zeros((1, 2, 28, 28, 3))
        ext0 = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
        ixt0 = jnp.broadcast_to(jnp.eye(3) * 20.0, (1, 2, 3, 3))
        has_gs = getattr(model, "gs_head", None) is not None or (
            getattr(model, "anyview", None) is not None
            and model.anyview.gs_head is not None
        )
        params = jax.jit(
            lambda rng: model.init(rng, x0, ext0, ixt0, infer_gs=has_gs)
        )(jax.random.PRNGKey(0))

        ckpt_path = checkpoint or cls._find_checkpoint(name, cache_dir)
        if ckpt_path is None and "/" in name:
            ckpt_path = cls._download_checkpoint(name, cache_dir)
        random_init = True
        if ckpt_path is not None:
            from recondet3d.api.weights import convert_torch_state_dict, load_safetensors

            logger.info(f"loading weights from {ckpt_path}")
            sd = load_safetensors(ckpt_path)
            params, unused, unfilled = convert_torch_state_dict(sd, params)
            if unfilled:
                logger.warning(f"{len(unfilled)} params not found in checkpoint")
            random_init = False
        else:
            logger.warning(
                f"no checkpoint found for {name!r} in {cache_dir!r}; "
                "running with random weights (depth values will be meaningless)"
            )
        return cls(model, params, name, random_init=random_init)

    @staticmethod
    def _download_checkpoint(repo_id: str, cache_dir: str) -> Optional[str]:
        """Fetch model.safetensors from the HF hub into the cache (the
        reference downloads via PyTorchModelHubMixin, api.py:28-90).
        Returns None on any failure (offline, missing dep, unknown repo)
        so callers fall back to random init with a warning."""
        try:
            from huggingface_hub import hf_hub_download
        except Exception:
            return None
        try:
            return hf_hub_download(
                repo_id=repo_id, filename="model.safetensors",
                cache_dir=cache_dir,
            )
        except Exception as e:  # offline / auth / 404
            logger.warning(f"HF hub download failed for {repo_id!r}: {e}")
            return None

    @staticmethod
    def _find_checkpoint(name: str, cache_dir: str) -> Optional[str]:
        short = name.split("/")[-1].lower()
        candidates = [
            os.path.join(cache_dir, short, "model.safetensors"),
            os.path.join(cache_dir, f"{short}.safetensors"),
            os.path.join(cache_dir, "model.safetensors"),
        ]
        for c in candidates:
            if os.path.exists(c):
                return c
        # HF-hub style cache layout
        if os.path.isdir(cache_dir):
            for root, _, files in os.walk(cache_dir):
                if "model.safetensors" in files and short in root.lower():
                    return os.path.join(root, "model.safetensors")
        return None

    # ------------------------------------------------------------------
    def _forward_fn(self, key: tuple):
        if key not in self._jitted:
            import functools

            S, H, W, has_pose, feat_layers, infer_gs, use_ray_pose, strategy = key

            @functools.partial(self._jax.jit)
            def fwd(params, x, ext, ixt):
                return self.model.apply(
                    params, x,
                    ext if has_pose else None,
                    ixt if has_pose else None,
                    export_feat_layers=feat_layers,
                    infer_gs=infer_gs,
                    use_ray_pose=use_ray_pose,
                    ref_view_strategy=strategy,
                )

            self._jitted[key] = fwd
        return self._jitted[key]

    @staticmethod
    def _normalize_extrinsics(ext: np.ndarray) -> np.ndarray:
        """First-camera-relative + median-translation scale normalization
        (reference: api.py:344-360)."""
        ext = _to44(ext.astype(np.float64))
        transform = _affine_inverse_np(ext[:1])
        ext_norm = ext @ transform
        c2ws = _affine_inverse_np(ext_norm)
        dists = np.linalg.norm(c2ws[:, :3, 3], axis=-1)
        median = max(float(np.median(dists)), 1e-1)
        ext_norm[:, :3, 3] /= median
        return ext_norm.astype(np.float32)

    def inference(
        self,
        image: Sequence,
        extrinsics: Optional[np.ndarray] = None,
        intrinsics: Optional[np.ndarray] = None,
        align_to_input_ext_scale: bool = True,
        infer_gs: bool = False,
        use_ray_pose: bool = False,
        ref_view_strategy: str = "saddle_balanced",
        process_res: int = 504,
        process_res_method: str = "upper_bound_resize",
        export_dir: Optional[str] = None,
        export_format: str = "mini_npz",
        export_feat_layers: Optional[Sequence[int]] = None,
        conf_thresh_percentile: float = 40.0,
        num_max_points: int = 1_000_000,
        show_cameras: bool = True,
        export_kwargs: Optional[dict] = None,
    ) -> Prediction:
        import jax.numpy as jnp

        t0 = time.time()
        self.input_processor.process_res = process_res
        self.input_processor.process_res_method = process_res_method
        batch, ex, ix, raw_imgs = self.input_processor(image, extrinsics, intrinsics)
        logger.info(f"preprocess {time.time()-t0:.2f}s shape={batch.shape}")

        ex_norm = None
        if ex is not None:
            ex_norm = self._normalize_extrinsics(ex[0])[None]

        S, H, W = batch.shape[1:4]
        key = (
            S, H, W, ex is not None,
            tuple(export_feat_layers or ()), infer_gs, use_ray_pose, ref_view_strategy,
        )
        fwd = self._forward_fn(key)
        t0 = time.time()
        dummy = jnp.zeros((1, S, 4, 4), jnp.float32)
        dummy_k = jnp.zeros((1, S, 3, 3), jnp.float32)
        out = fwd(
            self.params,
            jnp.asarray(batch),
            jnp.asarray(ex_norm) if ex_norm is not None else dummy,
            jnp.asarray(ix) if ix is not None else dummy_k,
        )
        out = self._jax.device_get(out)
        logger.info(f"forward {time.time()-t0:.2f}s")

        prediction = self.output_processor(out)

        if ex is not None:
            prediction.intrinsics = ix[0]
            _, _, scale, aligned = align_poses_umeyama(
                prediction.extrinsics, ex[0],
                ransac=len(ex[0]) >= 10, return_aligned=True, random_state=42,
            )
            if align_to_input_ext_scale:
                prediction.extrinsics = _to44(ex[0].astype(np.float64))[:, :3].astype(np.float32)
                prediction.depth = prediction.depth / scale
            else:
                prediction.extrinsics = aligned[:, :3].astype(np.float32)

        prediction.processed_images = raw_imgs

        if export_dir is not None:
            from recondet3d.data.export import export

            kw = dict(export_kwargs or {})
            if "glb" in export_format:
                kw.update(
                    conf_thresh_percentile=conf_thresh_percentile,
                    max_points=num_max_points,
                    show_cameras=show_cameras,
                )
            export(prediction, export_format, export_dir, **kw)
        return prediction

    @staticmethod
    def available_models():
        return list(MODEL_REGISTRY)
