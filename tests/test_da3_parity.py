"""Numerical parity of the JAX DA3 stack against the reference torch
implementation (imported read-only as an oracle, random weights converted
through recondet3d.api.weights). Everything fp32 on CPU."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_oracle import import_reference_da3
from recondet3d.api.weights import convert_torch_state_dict
from recondet3d.models.da3 import build_da3
from recondet3d.models.da3.vit import DinoViT

da3_ref = import_reference_da3()


def _state_dict(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


@pytest.fixture(scope="module")
def vit_pair():
    from depth_anything_3.model.dinov2.dinov2 import DinoV2

    torch.manual_seed(0)
    tnet = DinoV2(name="vits", out_layers=[5, 7, 9, 11], alt_start=4,
                  qknorm_start=4, rope_start=4, cat_token=True).eval()
    jnet = DinoViT(name_preset="vits", out_layers=(5, 7, 9, 11), alt_start=4,
                   qknorm_start=4, rope_start=4, cat_token=True,
                   dtype=jnp.float32, attn_impl="xla")
    x = jnp.zeros((1, 2, 28, 28, 3))
    params = jnet.init(jax.random.PRNGKey(0), x)
    # bare ViT: no prefix mapping needed, keys convert in place
    params, unused, unfilled = convert_torch_state_dict(_state_dict(tnet), params)
    assert not unfilled, f"unfilled flax params: {unfilled[:10]}"
    assert not unused, f"unused torch keys: {unused[:10]}"
    return tnet, jnet, params


@pytest.mark.parametrize("S,hw", [(2, (28, 28)), (2, (56, 42))])
def test_vit_parity(vit_pair, S, hw):
    tnet, jnet, params = vit_pair
    H, W = hw
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, S, 3, H, W)).astype(np.float32)

    with torch.no_grad():
        tfeats, _ = tnet(torch.from_numpy(x))

    x_j = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    jfeats, _ = jnet.apply(params, x_j)

    assert len(tfeats) == len(jfeats)
    for i, ((t_tok, t_cam), (j_tok, j_cam)) in enumerate(zip(tfeats, jfeats)):
        np.testing.assert_allclose(
            np.asarray(j_tok), t_tok.numpy(), atol=2e-4, rtol=2e-3,
            err_msg=f"layer {i} patch tokens",
        )
        np.testing.assert_allclose(
            np.asarray(j_cam), t_cam.numpy(), atol=2e-4, rtol=2e-3,
            err_msg=f"layer {i} camera token",
        )


def test_vit_parity_multiview_reorder(vit_pair):
    # S=6 triggers reference-view selection + reorder/restore
    tnet, jnet, params = vit_pair
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        tfeats, _ = tnet(torch.from_numpy(x))
    jfeats, _ = jnet.apply(params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))))
    for i, ((t_tok, _), (j_tok, _)) in enumerate(zip(tfeats, jfeats)):
        np.testing.assert_allclose(
            np.asarray(j_tok), t_tok.numpy(), atol=5e-4, rtol=5e-3,
            err_msg=f"layer {i}",
        )


@pytest.fixture(scope="module")
def net_pair():
    """Full DepthAnything3Net (vits + DualDPT + cam heads)."""
    from depth_anything_3.model.da3 import DepthAnything3Net as TorchNet
    from depth_anything_3.model.dinov2.dinov2 import DinoV2
    from depth_anything_3.model.dualdpt import DualDPT as TorchDualDPT
    from depth_anything_3.model.cam_enc import CameraEnc as TorchCamEnc
    from depth_anything_3.model.cam_dec import CameraDec as TorchCamDec

    torch.manual_seed(1)
    tnet = TorchNet(
        net=DinoV2(name="vits", out_layers=[5, 7, 9, 11], alt_start=4,
                   qknorm_start=4, rope_start=4, cat_token=True),
        head=TorchDualDPT(dim_in=768, output_dim=2, features=64,
                          out_channels=[48, 96, 192, 384]),
        cam_enc=TorchCamEnc(dim_out=384),
        cam_dec=TorchCamDec(dim_in=768),
    ).eval()
    jnet = build_da3("da3-small", dtype=jnp.float32, attn_impl="xla")
    x = jnp.zeros((1, 2, 28, 28, 3))
    # init with extrinsics so the cam_enc conditioning path materializes
    ext0 = jnp.broadcast_to(jnp.eye(4)[None, None], (1, 2, 4, 4))
    ixt0 = jnp.broadcast_to(jnp.eye(3)[None, None] * 20.0, (1, 2, 3, 3))
    params = jnet.init(jax.random.PRNGKey(0), x, ext0, ixt0)
    params, unused, unfilled = convert_torch_state_dict(_state_dict(tnet), params)
    assert not unfilled, f"unfilled: {unfilled[:10]}"
    # aux levels 0..2 of DualDPT are dead at inference; everything else maps
    assert all("_aux.0." in k or "_aux.1." in k or "_aux.2." in k for k in unused), unused[:10]
    return tnet, jnet, params


def test_full_net_parity(net_pair):
    tnet, jnet, params = net_pair
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x))
    jout = jnet.apply(params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))))

    np.testing.assert_allclose(
        np.asarray(jout["depth"]), tout["depth"].numpy(), atol=1e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(jout["depth_conf"]), tout["depth_conf"].numpy(), atol=1e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(jout["extrinsics"]), tout["extrinsics"].numpy(), atol=1e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(jout["intrinsics"]), tout["intrinsics"].numpy(), atol=1e-2, rtol=1e-2
    )


def test_full_net_parity_with_gt_poses(net_pair):
    """cam_enc conditioning path: GT extrinsics/intrinsics provided."""
    tnet, jnet, params = net_pair
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 2, 3, 28, 28)).astype(np.float32)
    # simple valid w2c extrinsics + pinhole intrinsics
    ext = np.broadcast_to(np.eye(4, dtype=np.float32)[None, None], (1, 2, 4, 4)).copy()
    ext[0, 1, 0, 3] = 0.5
    ixt = np.zeros((1, 2, 3, 3), np.float32)
    ixt[..., 0, 0] = ixt[..., 1, 1] = 30.0
    ixt[..., 0, 2] = ixt[..., 1, 2] = 14.0
    ixt[..., 2, 2] = 1.0
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x), torch.from_numpy(ext), torch.from_numpy(ixt))
    jout = jnet.apply(
        params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))),
        jnp.asarray(ext), jnp.asarray(ixt),
    )
    np.testing.assert_allclose(
        np.asarray(jout["depth"]), tout["depth"].numpy(), atol=1e-3, rtol=1e-2
    )


def test_metric_net_parity():
    """da3metric-large shaped net at vits-ish scale is too big to build here;
    test the plain-ViT + DPT(+sky) path instead with small dims."""
    from depth_anything_3.model.da3 import DepthAnything3Net as TorchNet
    from depth_anything_3.model.dinov2.dinov2 import DinoV2
    from depth_anything_3.model.dpt import DPT as TorchDPT

    torch.manual_seed(3)
    tnet = TorchNet(
        net=DinoV2(name="vits", out_layers=[2, 5, 8, 11], alt_start=-1,
                   qknorm_start=-1, rope_start=-1, cat_token=False),
        head=TorchDPT(dim_in=384, output_dim=1, features=64,
                      out_channels=[48, 96, 192, 384]),
    ).eval()

    from recondet3d.models.da3.dpt import DPT
    from recondet3d.models.da3.net import DepthAnything3Net

    jnet = DepthAnything3Net(
        net=DinoViT(name_preset="vits", out_layers=(2, 5, 8, 11), alt_start=-1,
                    qknorm_start=-1, rope_start=-1, cat_token=False,
                    dtype=jnp.float32, attn_impl="xla"),
        head=DPT(dim_in=384, output_dim=1, features=64, out_channels=(48, 96, 192, 384)),
    )
    x0 = jnp.zeros((1, 1, 28, 28, 3))
    params = jnet.init(jax.random.PRNGKey(0), x0)
    params, unused, unfilled = convert_torch_state_dict(_state_dict(tnet), params)
    assert not unfilled and not unused, (unused[:5], unfilled[:5])

    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 1, 3, 42, 56)).astype(np.float32)
    with torch.no_grad():
        tout = tnet(torch.from_numpy(x))
    jout = jnet.apply(params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))))
    np.testing.assert_allclose(
        np.asarray(jout["depth"]), tout["depth"].numpy(), atol=1e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(jout["sky"]), tout["sky"].numpy(), atol=1e-3, rtol=1e-2
    )


def test_from_pretrained_safetensors_file(net_pair, tmp_path):
    """The full weight-loading seam: torch state dict -> .safetensors file
    on disk -> DepthAnything3.from_pretrained(checkpoint=...) -> depth
    output identical to applying the directly-converted params."""
    from safetensors.numpy import save_file

    from recondet3d.api import DepthAnything3

    tnet, jnet, params = net_pair
    sd = {
        k: np.ascontiguousarray(v) for k, v in _state_dict(tnet).items()
    }
    path = str(tmp_path / "model.safetensors")
    save_file(sd, path)

    model = DepthAnything3.from_pretrained(
        "da3-small", cache_dir=str(tmp_path / "none"), checkpoint=path
    )
    assert not model.random_init

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 2, 28, 28, 3)).astype(np.float32)
    out_loaded = model.model.apply(
        model.params, jnp.asarray(img), use_ray_pose=False,
        ref_view_strategy="first",
    )
    out_direct = jnet.apply(
        params, jnp.asarray(img), use_ray_pose=False,
        ref_view_strategy="first",
    )
    np.testing.assert_allclose(
        np.asarray(out_loaded["depth"], np.float32),
        np.asarray(out_direct["depth"], np.float32),
        rtol=1e-4, atol=1e-5,
    )


import contextlib


@contextlib.contextmanager
def _cpu_linspace():
    """vit_giant2 construction calls .item() on a torch.linspace (drop-path
    decay rule, vision_transformer.py:175) which meta tensors reject; pin
    that one op to CPU while building layout-only models on the meta
    device."""
    orig = torch.linspace
    torch.linspace = lambda *a, **kw: orig(*a, **{**kw, "device": "cpu"})
    try:
        yield
    finally:
        torch.linspace = orig


def test_giant_nested_checkpoint_layout_coverage():
    """Layout-exact coverage of the real DA3NESTED-GIANT-LARGE checkpoint:
    the reference torch model at FULL vitg scale (built on the meta device
    — shapes only, no init cost) must convert with zero unused and zero
    unfilled keys. Covers the production-only layouts toy-scale tests
    miss: vitg swiglufused FFN (w12/w3), 40-block depth, DualDPT aux
    pyramid at dim_in=3072, GSDPT, and the nested da3./da3_metric.
    prefixes (reference: configs/da3-giant.yaml,
    configs/da3nested-giant-large.yaml, model/da3.py:308-334)."""
    from depth_anything_3.model.cam_dec import CameraDec as TorchCamDec
    from depth_anything_3.model.cam_enc import CameraEnc as TorchCamEnc
    from depth_anything_3.model.da3 import DepthAnything3Net as TorchNet
    from depth_anything_3.model.dinov2.dinov2 import DinoV2 as TorchDinoV2
    from depth_anything_3.model.dpt import DPT as TorchDPT
    from depth_anything_3.model.dualdpt import DualDPT as TorchDualDPT
    from depth_anything_3.model.gs_adapter import GaussianAdapter as TorchGSAdapter
    from depth_anything_3.model.gsdpt import GSDPT as TorchGSDPT

    with torch.device("meta"), _cpu_linspace():
        anyview = TorchNet(
            net=TorchDinoV2(name="vitg", out_layers=[19, 27, 33, 39],
                            alt_start=13, qknorm_start=13, rope_start=13,
                            cat_token=True),
            head=TorchDualDPT(dim_in=3072, output_dim=2, features=256,
                              out_channels=[256, 512, 1024, 1024]),
            cam_enc=TorchCamEnc(dim_out=1536),
            cam_dec=TorchCamDec(dim_in=3072),
            gs_head=TorchGSDPT(dim_in=3072, output_dim=38, features=256,
                               out_channels=[256, 512, 1024, 1024]),
            gs_adapter=TorchGSAdapter(
                sh_degree=2, pred_color=False, pred_offset_depth=True,
                pred_offset_xy=True, gaussian_scale_min=1e-5,
                gaussian_scale_max=30.0,
            ),
        )
        metric = TorchNet(
            net=TorchDinoV2(name="vitl", out_layers=[4, 11, 17, 23],
                            alt_start=-1, qknorm_start=-1, rope_start=-1,
                            cat_token=False),
            head=TorchDPT(dim_in=1024, output_dim=1, features=256,
                          out_channels=[256, 512, 1024, 1024]),
        )
        nested = torch.nn.Module()
        nested.da3 = anyview
        nested.da3_metric = metric
    sd = {k: np.zeros(tuple(v.shape), np.float32)
          for k, v in nested.state_dict().items()}

    from recondet3d.models.da3 import build_da3

    jnet = build_da3("da3nested-giant-large", dtype=jnp.float32,
                     attn_impl="xla", with_gs=True)
    x0 = jnp.zeros((1, 2, 28, 28, 3))
    ext0 = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
    ixt0 = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
    params = jax.eval_shape(
        lambda: jnet.init(jax.random.PRNGKey(0), x0, ext0, ixt0, infer_gs=True)
    )
    _, unused, unfilled = convert_torch_state_dict(sd, params)
    # DualDPT aux-pyramid levels 0-2 are dead at inference and deliberately
    # not materialized in the flax tree (same convention as net_pair)
    live_unused = [
        k for k in unused
        if not any(f"_aux.{lvl}." in k for lvl in (0, 1, 2))
    ]
    assert not live_unused, f"unused torch keys ({len(live_unused)}): {live_unused[:20]}"
    assert not unfilled, f"unfilled flax paths ({len(unfilled)}): {unfilled[:20]}"


def test_giant_single_checkpoint_layout_coverage():
    """Same full-scale layout check for the standalone DA3-GIANT layout
    (bare prefixes, no nested wrapper)."""
    from depth_anything_3.model.cam_dec import CameraDec as TorchCamDec
    from depth_anything_3.model.cam_enc import CameraEnc as TorchCamEnc
    from depth_anything_3.model.da3 import DepthAnything3Net as TorchNet
    from depth_anything_3.model.dinov2.dinov2 import DinoV2 as TorchDinoV2
    from depth_anything_3.model.dualdpt import DualDPT as TorchDualDPT

    with torch.device("meta"), _cpu_linspace():
        tnet = TorchNet(
            net=TorchDinoV2(name="vitg", out_layers=[19, 27, 33, 39],
                            alt_start=13, qknorm_start=13, rope_start=13,
                            cat_token=True),
            head=TorchDualDPT(dim_in=3072, output_dim=2, features=256,
                              out_channels=[256, 512, 1024, 1024]),
            cam_enc=TorchCamEnc(dim_out=1536),
            cam_dec=TorchCamDec(dim_in=3072),
        )
    sd = {k: np.zeros(tuple(v.shape), np.float32)
          for k, v in tnet.state_dict().items()}

    from recondet3d.models.da3 import build_da3

    jnet = build_da3("da3-giant", dtype=jnp.float32, attn_impl="xla",
                     with_gs=False)
    x0 = jnp.zeros((1, 2, 28, 28, 3))
    ext0 = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
    ixt0 = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
    params = jax.eval_shape(
        lambda: jnet.init(jax.random.PRNGKey(0), x0, ext0, ixt0)
    )
    _, unused, unfilled = convert_torch_state_dict(sd, params)
    # DualDPT aux-pyramid levels 0-2 are dead at inference and deliberately
    # not materialized in the flax tree (same convention as net_pair)
    live_unused = [
        k for k in unused
        if not any(f"_aux.{lvl}." in k for lvl in (0, 1, 2))
    ]
    assert not live_unused, f"unused torch keys ({len(live_unused)}): {live_unused[:20]}"
    assert not unfilled, f"unfilled flax paths ({len(unfilled)}): {unfilled[:20]}"


@pytest.fixture(scope="module")
def large_pair():
    """Full da3-large pair at REAL wiring (reference: configs/da3-large.yaml):
    vitl 24 blocks, out_layers [11,15,19,23], alt/qknorm/rope from 8,
    cat_token, DualDPT at dim_in=2048, CameraDec at 2048. Random weights
    converted through the production seam."""
    from depth_anything_3.model.cam_dec import CameraDec as TorchCamDec
    from depth_anything_3.model.cam_enc import CameraEnc as TorchCamEnc
    from depth_anything_3.model.da3 import DepthAnything3Net as TorchNet
    from depth_anything_3.model.dinov2.dinov2 import DinoV2
    from depth_anything_3.model.dualdpt import DualDPT as TorchDualDPT

    torch.manual_seed(3)
    tnet = TorchNet(
        net=DinoV2(name="vitl", out_layers=[11, 15, 19, 23], alt_start=8,
                   qknorm_start=8, rope_start=8, cat_token=True),
        head=TorchDualDPT(dim_in=2048, output_dim=2, features=256,
                          out_channels=[256, 512, 1024, 1024]),
        cam_enc=TorchCamEnc(dim_out=1024),
        cam_dec=TorchCamDec(dim_in=2048),
    ).eval()
    jnet = build_da3("da3-large", dtype=jnp.float32, attn_impl="xla")
    x0 = jnp.zeros((1, 2, 28, 28, 3))
    # init with extrinsics so the cam_enc conditioning + ray/aux pyramid
    # materialize (same convention as net_pair)
    ext0 = jnp.broadcast_to(jnp.eye(4)[None, None], (1, 2, 4, 4))
    ixt0 = jnp.broadcast_to(jnp.eye(3)[None, None] * 20.0, (1, 2, 3, 3))
    params = jnet.init(jax.random.PRNGKey(0), x0, ext0, ixt0)
    params, unused, unfilled = convert_torch_state_dict(_state_dict(tnet), params)
    assert not unfilled, f"unfilled: {unfilled[:10]}"
    assert all("_aux.0." in k or "_aux.1." in k or "_aux.2." in k
               for k in unused), unused[:10]
    return tnet, jnet, params


def test_da3_large_parity_production_res(large_pair):
    """da3-large forward at production 504-side resolution (378x504 -> a
    27x36 patch grid): pos-embed bicubic interpolation from the 37x37
    base grid at real scale, all 24 vitl blocks with alt local/global +
    QK-norm + RoPE at their real start index 8, DualDPT fusion at
    dim_in=2048. Scale-sensitive wiring a toy-res test cannot catch
    (reference: dinov2/vision_transformer.py:401-456)."""
    tnet, jnet, params = large_pair
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 2, 3, 378, 504)).astype(np.float32)

    with torch.no_grad():
        tout = tnet(torch.from_numpy(x))
    jout = jnet.apply(params, jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))))

    np.testing.assert_allclose(
        np.asarray(jout["depth"], np.float32),
        tout["depth"].numpy().reshape(np.asarray(jout["depth"]).shape),
        atol=5e-3, rtol=5e-3, err_msg="depth",
    )
    np.testing.assert_allclose(
        np.asarray(jout["depth_conf"], np.float32),
        tout["depth_conf"].numpy().reshape(np.asarray(jout["depth_conf"]).shape),
        atol=5e-3, rtol=5e-3, err_msg="depth_conf",
    )
    np.testing.assert_allclose(
        np.asarray(jout["extrinsics"], np.float32),
        tout["extrinsics"].numpy().reshape(np.asarray(jout["extrinsics"]).shape),
        atol=5e-3, rtol=5e-3, err_msg="extrinsics",
    )


def test_vitg_block_swiglufused_parity():
    """One transformer block at REAL vitg dims (1536, 24 heads, swiglufused
    hidden 4096): the fused-SwiGLU FFN numerics and the w12/w3 weight
    layout (reference: dinov2/layers/swiglu_ffn.py:44, block.py:26)."""
    from depth_anything_3.model.dinov2.layers import SwiGLUFFNFused as TorchSwiGLU
    from depth_anything_3.model.dinov2.layers.block import Block as TorchBlock

    from recondet3d.models.da3.layers import Block as JBlock

    torch.manual_seed(5)
    tblk = TorchBlock(dim=1536, num_heads=24, mlp_ratio=4, qkv_bias=True,
                      init_values=1.0, ffn_layer=TorchSwiGLU).eval()
    jblk = JBlock(num_heads=24, mlp_ratio=4.0, qkv_bias=True,
                  init_values=1.0, ffn_layer="swiglufused",
                  dtype=jnp.float32, attn_impl="xla")
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 128, 1536)).astype(np.float32)
    params = jblk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, unused, unfilled = convert_torch_state_dict(_state_dict(tblk), params)
    assert not unused and not unfilled, (unused[:5], unfilled[:5])

    with torch.no_grad():
        tout = tblk(torch.from_numpy(x))
    jout = jblk.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy(), atol=2e-4, rtol=2e-3,
    )


def test_cast_trunk_params_bf16_exact():
    """cast_trunk_params_bf16 (the serving-time storage cast) must be
    RESULT-IDENTICAL: every cast leaf is consumed through the exact same
    bf16 cast inside its module, so pre-casting only removes per-step
    HBM traffic, never changes a bit."""
    from recondet3d.api.weights import cast_trunk_params_bf16

    net = build_da3("da3-small", dtype=jnp.bfloat16, attn_impl="xla")
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 56, 56, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)

    out0 = net.apply(variables, x)
    cast_vars = dict(variables,
                     params=cast_trunk_params_bf16(variables["params"]))
    # the cast must actually hit the trunk (not be a no-op selector)
    n_cast = sum(
        int(v.dtype == jnp.bfloat16)
        for v in jax.tree_util.tree_leaves(cast_vars["params"])
    )
    assert n_cast > 20, f"only {n_cast} leaves cast - selector broken?"
    out1 = net.apply(cast_vars, x)
    for k in out0:
        if hasattr(out0[k], "dtype"):
            np.testing.assert_array_equal(
                np.asarray(out0[k], np.float32), np.asarray(out1[k], np.float32),
                err_msg=f"output {k} changed under the storage cast",
            )
