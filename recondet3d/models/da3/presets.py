"""DA3 model presets (reference: depth_anything_3/configs/*.yaml +
registry.py). Factories build unbound linen module trees per preset;
``dtype``/``attn_impl`` select the TPU compute policy.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from recondet3d.models.da3.cam import CameraDec, CameraEnc
from recondet3d.models.da3.dpt import DPT, DualDPT, GSDPT
from recondet3d.models.da3.gs_adapter import GaussianAdapter
from recondet3d.models.da3.net import DepthAnything3Net, NestedDepthAnything3Net
from recondet3d.models.da3.vit import DinoViT

__all__ = ["build_da3", "PRESETS", "MODEL_REGISTRY"]


def _anyview(vit_name, out_layers, alt_start, head_dim_in, features, out_channels,
             cam_dim, dtype, attn_impl, with_gs=False, remat=False,
             remat_policy="block"):
    net = DinoViT(
        name_preset=vit_name,
        out_layers=tuple(out_layers),
        alt_start=alt_start,
        qknorm_start=alt_start,
        rope_start=alt_start,
        cat_token=True,
        dtype=dtype,
        attn_impl=attn_impl,
        remat=remat,
        remat_policy=remat_policy,
    )
    head = DualDPT(
        dim_in=head_dim_in,
        output_dim=2,
        features=features,
        out_channels=tuple(out_channels),
    )
    kwargs = dict(
        net=net,
        head=head,
        cam_enc=CameraEnc(dim_out=cam_dim),
        cam_dec=CameraDec(dim_in=head_dim_in),
    )
    if with_gs:
        kwargs["gs_head"] = GSDPT(
            dim_in=head_dim_in,
            output_dim=38,
            features=features,
            out_channels=tuple(out_channels),
        )
        kwargs["gs_adapter"] = GaussianAdapter(
            sh_degree=2,
            pred_color=False,
            pred_offset_depth=True,
            pred_offset_xy=True,
            gaussian_scale_min=1e-5,
            gaussian_scale_max=30.0,
        )
    return DepthAnything3Net(**kwargs)


def _monocular(dtype, attn_impl, remat=False, remat_policy="block"):
    # da3metric-large / da3mono-large: plain ViT-L + DPT(1ch) + sky head
    net = DinoViT(
        name_preset="vitl",
        out_layers=(4, 11, 17, 23),
        alt_start=-1,
        qknorm_start=-1,
        rope_start=-1,
        cat_token=False,
        dtype=dtype,
        attn_impl=attn_impl,
        remat=remat,
        remat_policy=remat_policy,
    )
    head = DPT(dim_in=1024, output_dim=1, features=256, out_channels=(256, 512, 1024, 1024))
    return DepthAnything3Net(net=net, head=head)


PRESETS = {
    "da3-small": dict(vit="vits", out_layers=(5, 7, 9, 11), alt_start=4,
                      head_dim_in=768, features=64, out_channels=(48, 96, 192, 384),
                      cam_dim=384),
    "da3-base": dict(vit="vitb", out_layers=(5, 7, 9, 11), alt_start=4,
                     head_dim_in=1536, features=128, out_channels=(96, 192, 384, 768),
                     cam_dim=768),
    "da3-large": dict(vit="vitl", out_layers=(11, 15, 19, 23), alt_start=8,
                      head_dim_in=2048, features=256, out_channels=(256, 512, 1024, 1024),
                      cam_dim=1024),
    "da3-giant": dict(vit="vitg", out_layers=(19, 27, 33, 39), alt_start=13,
                      head_dim_in=3072, features=256, out_channels=(256, 512, 1024, 1024),
                      cam_dim=1536, with_gs=True),
}

MODEL_REGISTRY = [
    "da3-small", "da3-base", "da3-large", "da3-giant",
    "da3metric-large", "da3mono-large", "da3nested-giant-large",
]


def build_da3(name: str, dtype=jnp.bfloat16, attn_impl: str = "auto",
              with_gs: Optional[bool] = None, remat: bool = False,
              remat_policy: str = "block"):
    """Build an unbound DA3 model for a preset name (HF-hub naming also
    accepted, e.g. 'depth-anything/DA3NESTED-GIANT-LARGE')."""
    key = name.split("/")[-1].lower()
    if key in ("da3metric-large", "da3mono-large"):
        return _monocular(dtype, attn_impl, remat=remat, remat_policy=remat_policy)
    if key == "da3nested-giant-large":
        cfg = dict(PRESETS["da3-giant"])
        preset_gs = cfg.pop("with_gs", False)
        use_gs = preset_gs if with_gs is None else with_gs
        anyview = _anyview(cfg.pop("vit"), dtype=dtype, attn_impl=attn_impl,
                           with_gs=use_gs, remat=remat,
                           remat_policy=remat_policy, **cfg)
        return NestedDepthAnything3Net(
            anyview=anyview,
            metric=_monocular(dtype, attn_impl, remat=remat,
                              remat_policy=remat_policy))
    if key in PRESETS:
        cfg = dict(PRESETS[key])
        preset_gs = cfg.pop("with_gs", False)
        use_gs = preset_gs if with_gs is None else with_gs
        return _anyview(cfg.pop("vit"), dtype=dtype, attn_impl=attn_impl,
                        with_gs=use_gs, remat=remat,
                        remat_policy=remat_policy, **cfg)
    raise KeyError(f"unknown DA3 preset {name!r}; known: {MODEL_REGISTRY}")
