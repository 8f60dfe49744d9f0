#!/usr/bin/env python
"""Split DA3's forward cost on the chip: ViT backbone vs DPT head vs
camera decoder (+sky clamp).

profile_stages.py times the whole DA3 forward (~102 ms at bench shapes);
this dissects it so the next optimization targets the real sub-stage.
Each piece is separately jitted (stage-boundary fusion loss applies, so
the sum slightly over-counts; the ranking is what matters).

Usage: python scripts/profile_da3.py [iters]
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


def timeit(name, fn, *args, iters=5, mfu=True):
    out, _ = _timing.timeit(name, fn, *args, iters=iters, width=30, mfu=mfu)
    return out


def _profile_nested(model, variables, x, iters):
    """Dissect the nested preset: anyview (vitg) vs metric (vitl) branch,
    their ViT/head internals, and the scale-alignment tail."""
    B, S, H, W, _ = x.shape

    def sub(method_path):
        def f(v, xx):
            return model.apply(
                v, xx, method=lambda m, *a, **k: _resolve(m, method_path)(*a, **k)
            )
        return f

    def _resolve(m, path):
        for p in path.split("."):
            m = getattr(m, p)
        return m

    # anyview branch total (vitg backbone + DualDPT + cam dec)
    def f_anyview(v, xx):
        out = model.apply(
            v, xx, ref_view_strategy="saddle_balanced",
            method=lambda m, *a, **k: m.anyview(*a, **k),
        )
        return {"depth": out["depth"], "intrinsics": out["intrinsics"],
                "depth_conf": out["depth_conf"], "extrinsics": out["extrinsics"]}

    av = timeit("anyview (vitg) total", jax.jit(f_anyview), variables, x, iters=iters)

    # metric branch total (vitl backbone + DPT w/ sky)
    def f_metric(v, xx):
        out = model.apply(v, xx, method=lambda m, *a, **k: m.metric(*a, **k))
        return {"depth": out["depth"], "sky": out["sky"]}

    mt = timeit("metric (vitl) total", jax.jit(f_metric), variables, x, iters=iters)

    # anyview vitg backbone alone
    def f_vitg(v, xx):
        return model.apply(
            v, xx, cam_token=None, export_feat_layers=(),
            ref_view_strategy="saddle_balanced",
            method=lambda m, *a, **k: m.anyview.net(*a, **k),
        )

    feats, _ = timeit("  anyview vitg backbone", jax.jit(f_vitg), variables, x,
                      iters=iters)

    def f_head(v, ff):
        return dict(model.apply(
            v, ff, H, W, patch_start_idx=0,
            method=lambda m, *a, **k: m.anyview.head(*a, **k),
        ))

    timeit("  anyview DualDPT head", jax.jit(f_head), variables, feats, iters=iters)

    def f_vitl(v, xx):
        return model.apply(
            v, xx, cam_token=None, export_feat_layers=(),
            ref_view_strategy="saddle_balanced",
            method=lambda m, *a, **k: m.metric.net(*a, **k),
        )

    mfeats, _ = timeit("  metric vitl backbone", jax.jit(f_vitl), variables, x,
                       iters=iters)

    def f_mhead(v, ff):
        return dict(model.apply(
            v, ff, H, W, patch_start_idx=0,
            method=lambda m, *a, **k: m.metric.head(*a, **k),
        ))

    timeit("  metric DPT head", jax.jit(f_mhead), variables, mfeats, iters=iters)

    # alignment tail: everything after the two branch forwards (arrays only)
    timeit("  alignment tail", jax.jit(_align_arrays), av, mt, iters=iters)

    def f_all(v, xx):
        out = model.apply(v, xx, ref_view_strategy="saddle_balanced")
        return {"depth": out["depth"], "intrinsics": out["intrinsics"]}

    timeit("TOTAL nested fused", jax.jit(f_all), variables, x, iters=iters)


def _align_arrays(av, mt):
    from recondet3d.utils.alignment import (
        apply_metric_scaling, compute_alignment_mask, compute_sky_mask,
        least_squares_scale_scalar, masked_quantile,
    )

    metric_depth = apply_metric_scaling(mt["depth"], av["intrinsics"])
    non_sky = compute_sky_mask(mt["sky"], threshold=0.3)
    median_conf = masked_quantile(av["depth_conf"], non_sky, 0.5)
    align_mask = compute_alignment_mask(
        av["depth_conf"], non_sky, av["depth"], metric_depth, median_conf
    )
    scale = least_squares_scale_scalar(metric_depth, av["depth"], mask=align_mask)
    q99 = masked_quantile(av["depth"] * scale, non_sky, 0.99)
    return scale, q99


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from recondet3d.data.input_processor import process_tensor_batch
    from recondet3d.models.da3 import build_da3

    preset = os.environ.get("RECONDET3D_BENCH_PRESET", "da3-large")
    model = build_da3(preset, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    img, _ = bench.make_inputs(rng)
    x = jax.jit(lambda im: process_tensor_batch(im, process_res=504)[0])(
        jnp.asarray(img)
    )
    jax.block_until_ready(x)
    B, S, H, W, _ = x.shape
    print(f"[profile_da3] input {x.shape} ({x.dtype})", file=sys.stderr)

    variables = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    from recondet3d.models.da3.net import NestedDepthAnything3Net

    if isinstance(model, NestedDepthAnything3Net):
        _profile_nested(model, variables, x, iters)
        return

    # stage 1: ViT backbone (patch embed + blocks + reorder)
    def f_backbone(v, xx):
        return model.apply(
            v, xx, cam_token=None, export_feat_layers=(),
            ref_view_strategy="saddle_balanced",
            method=lambda m, *a, **k: m.net(*a, **k),
        )

    feats, _aux = timeit(
        "vit_backbone", jax.jit(f_backbone), variables, x, iters=iters
    )

    # stage 2: DPT head (depth + sky decode from the 4 tap layers)
    def f_head(v, ff):
        return dict(
            model.apply(
                v, ff, H, W, patch_start_idx=0,
                method=lambda m, *a, **k: m.head(*a, **k),
            )
        )

    head_out = timeit("dpt_head", jax.jit(f_head), variables, feats, iters=iters)

    # stage 3: camera decoder + pose decode + sky clamp
    def f_cam(v, ff, out):
        out = dict(out)
        out = model.apply(
            v, ff, H, W, out,
            method=lambda m, *a, **k: m._camera_estimation(*a, **k),
        )
        return model.apply(
            v, out, method=lambda m, *a, **k: m._mono_sky(*a, **k)
        )

    timeit("cam_dec+sky", jax.jit(f_cam), variables, feats, head_out, iters=iters)

    # whole DA3 for comparison
    def f_all(v, xx):
        out = model.apply(
            v, xx, ref_view_strategy="saddle_balanced"
        )
        return {"depth": out["depth"], "intrinsics": out["intrinsics"]}

    timeit("TOTAL da3 fused", jax.jit(f_all), variables, x, iters=iters)


if __name__ == "__main__":
    main()
