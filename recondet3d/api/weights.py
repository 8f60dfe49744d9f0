"""Torch/safetensors checkpoint -> flax params conversion for DA3 models.

The reference ships DA3 weights as HF-hub safetensors
(reference: depth_anything_3/api.py:28-90, PyTorchModelHubMixin). This
module maps those torch state_dicts onto the recondet3d flax module tree:

- Linear (O, I) -> Dense kernel (I, O)
- Conv2d (O, I, kh, kw) -> Conv kernel (kh, kw, I, O)
- ConvTranspose2d with kernel==stride -> StridedDeconv kernel (same torch
  (I, O, k, k) layout, straight copy)
- LayerNorm weight -> scale (wrapped fp32 layernorms live one level deeper
  under 'LayerNorm_0')

Unmatched reference keys (e.g. DualDPT aux levels 0-2, which are dead at
inference) are returned for inspection rather than silently dropped.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import jax
import numpy as np

__all__ = [
    "convert_torch_state_dict",
    "load_safetensors",
    "import_da3_checkpoint",
    "cast_trunk_params_bf16",
]

_PREFIX_MAP = [
    ("da3.backbone.pretrained.", "anyview/net/"),
    ("da3.head.", "anyview/head/"),
    ("da3.cam_enc.", "anyview/cam_enc/"),
    ("da3.cam_dec.", "anyview/cam_dec/"),
    ("da3.gs_head.", "anyview/gs_head/"),
    ("da3_metric.backbone.pretrained.", "metric/net/"),
    ("da3_metric.head.", "metric/head/"),
    ("backbone.pretrained.", "net/"),
    ("pretrained.", ""),  # bare DinoV2 wrapper
    ("head.", "head/"),
    ("cam_enc.", "cam_enc/"),
    ("cam_dec.", "cam_dec/"),
    ("gs_head.", "gs_head/"),
]

_REWRITES = [
    (re.compile(r"(^|/)scratch\."), r"\1"),
    (re.compile(r"blocks\.(\d+)\."), r"blocks_\1/"),
    (re.compile(r"trunk\.(\d+)\."), r"trunk_\1/"),
    (re.compile(r"projects\.(\d+)\."), r"projects_\1/"),
    (re.compile(r"resize_layers\.(\d+)\."), r"resize_layers_\1/"),
    (re.compile(r"output_conv1_aux\.(\d+)\.(\d+)\."), r"output_conv1_aux_\1_\2/"),
    (re.compile(r"output_conv2_aux\.(\d+)\.0\."), r"output_conv2_aux_\1/conv_a/"),
    (re.compile(r"output_conv2_aux\.(\d+)\.2\."), r"output_conv2_aux_\1/ln/"),
    (re.compile(r"output_conv2_aux\.(\d+)\.5\."), r"output_conv2_aux_\1/conv_b/"),
    (re.compile(r"(sky_output_conv2|output_conv2)\.0\."), r"\1/conv_a/"),
    (re.compile(r"(sky_output_conv2|output_conv2)\.2\.(?=weight|bias)"), r"\1/ln_or_convb/"),
    (re.compile(r"(sky_output_conv2|output_conv2)\.4\."), r"\1/conv_b/"),
    (re.compile(r"(sky_output_conv2|output_conv2)\.5\."), r"\1/conv_b/"),
    (re.compile(r"images_merger\.(\d+)\."), r"images_merger_\1/"),
    (re.compile(r"backbone\.(\d+)\."), r"backbone_\1/"),
    (re.compile(r"fc_fov\.0\."), "fc_fov_0/"),
    (re.compile(r"\."), "/"),
]


def _flatten(params) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {"/".join(str(k.key) for k in path): v for path, v in flat}


def _unflatten(flat: Dict[str, np.ndarray], template):
    paths = jax.tree_util.tree_flatten_with_path(template)
    leaves = [flat["/".join(str(k.key) for k in p)] for p, _ in paths[0]]
    return jax.tree_util.tree_unflatten(paths[1], leaves)


def convert_torch_state_dict(
    state_dict: Dict[str, np.ndarray], flax_params
) -> Tuple[object, List[str], List[str]]:
    """Returns (new_params, unused_torch_keys, unfilled_flax_paths)."""
    target = _flatten(flax_params)
    has_params_root = any(k.startswith("params/") for k in target)
    filled = dict(target)
    used = set()
    unused: List[str] = []

    for tkey, val in state_dict.items():
        val = np.asarray(val)
        key = tkey
        for pref, repl in _PREFIX_MAP:
            if key.startswith(pref):
                key = repl + key[len(pref):]
                break
        for pat, repl in _REWRITES:
            key = pat.sub(repl, key)

        # the '.2' slot is LN when use_ln_for_heads, final conv otherwise;
        # shape checking disambiguates
        variants = (
            [key.replace("ln_or_convb", "conv_b"), key.replace("ln_or_convb", "ln")]
            if "ln_or_convb" in key
            else [key]
        )
        resolved = []
        for k in variants:
            leaf = k.rsplit("/", 1)[-1]
            base = k.rsplit("/", 1)[0]
            if leaf == "weight":
                if val.ndim == 1:  # layernorm scale
                    resolved += [f"{base}/scale", f"{base}/LayerNorm_0/scale"]
                else:
                    resolved += [f"{base}/kernel"]
            elif leaf == "bias":
                resolved += [f"{base}/bias", f"{base}/LayerNorm_0/bias"]
            else:
                resolved += [k]

        placed = False
        for c in resolved:
            full = f"params/{c}" if has_params_root else c
            if full in target:
                tgt_shape = target[full].shape
                v = _convert_tensor(val, tgt_shape, c)
                if v is None:
                    continue
                # target leaves may be jax.ShapeDtypeStruct (layout-coverage
                # checks convert against jax.eval_shape trees — no init cost)
                filled[full] = v.astype(np.dtype(target[full].dtype))
                used.add(full)
                placed = True
                break
        if not placed:
            unused.append(tkey)

    unfilled = [k for k in target if k not in used]
    return _unflatten(filled, flax_params), unused, unfilled


def _convert_tensor(val: np.ndarray, tgt_shape, path: str):
    # 2-D = Linear weight: ALWAYS transpose (square matrices would otherwise
    # silently pass the identity shape check untransposed)
    if val.ndim == 2 and val.T.shape == tuple(tgt_shape):
        return np.ascontiguousarray(val.T)
    if val.shape == tuple(tgt_shape):
        return val
    if val.ndim == 4:
        conv = np.transpose(val, (2, 3, 1, 0))  # Conv2d OIHW -> HWIO
        if conv.shape == tuple(tgt_shape):
            return conv
        if val.shape == tuple(tgt_shape):
            return val  # deconv torch layout kept
    return None


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def import_da3_checkpoint(path: str, model, example_input):
    """Init the flax model and fill it from a safetensors/torch checkpoint."""
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(example_input))
    if path.endswith(".safetensors"):
        sd = load_safetensors(path)
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()}
    new_params, unused, unfilled = convert_torch_state_dict(sd, params)
    return new_params, unused, unfilled


def cast_trunk_params_bf16(params):
    """Serving-time storage cast: bf16 copies of exactly the DA3 ViT-trunk
    parameters the modules consume in bf16 anyway.

    PRECONDITION: the model must have been built with ``dtype=bfloat16``.
    Only then is the cast result-identical — each listed leaf is re-cast
    to bf16 by its module on every forward, so pre-casting is a no-op.
    Applied to an f32-configured model it silently LOSES precision: e.g.
    LayerScale applies ``gamma.astype(x.dtype)`` with x in f32, so a
    pre-cast gamma stays at bf16 resolution instead of full f32.

    Every trunk Dense/Conv (``nn.Dense(dtype=bf16)``) casts its f32 kernel
    and bias with ``jnp.asarray(w, bf16)`` on EVERY forward — f32 storage
    therefore costs double weight-read HBM bandwidth per step for bits the
    MXU never sees. Pre-casting those leaves is RESULT-IDENTICAL (the
    module applies the same cast, now a no-op) and the reference deploys
    half-precision trunks the same way (reference: da3.py autocast /
    from_pretrained dtype handling).

    Cast (consumed via ``.astype(bf16)``/``asarray(.., bf16)``):
      blocks_*/attn/{qkv,proj}, blocks_*/mlp/*, blocks_*/{ls1,ls2}/gamma,
      patch_embed/*, cls_token, camera_token.
    Kept f32 (consumed in f32): every LayerNorm (norm1/norm2/q_norm/
      k_norm/final norm — fp32 autocast semantics), pos_embed (the bicubic
      resize runs in the STORAGE dtype, so casting it would change
      results), and every non-trunk module (DPT/DualDPT heads, camera
      encoder/decoder — their f32 params feed mixed f32/bf16 paths).

    tests/test_da3_parity.py::test_cast_trunk_params_bf16_exact asserts
    bit-identical outputs.
    """
    import jax
    import jax.numpy as jnp

    def leaf(path, x):
        keys = [getattr(p, "key", "") for p in path]
        joined = "/".join(str(k) for k in keys)
        in_block = any(str(k).startswith("blocks_") for k in keys)
        cast = (
            (in_block and ("/attn/qkv" in joined or "/attn/proj" in joined
                           or "/mlp/" in joined or "/ls1/" in joined
                           or "/ls2/" in joined))
            or "patch_embed" in joined
            or keys[-1] in ("cls_token", "camera_token")
        )
        if cast and hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x

    return jax.tree_util.tree_map_with_path(leaf, params)
