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


def timeit(name, fn, *args, iters=5):
    out, _ = _timing.timeit(name, fn, *args, iters=iters, width=30)
    return out


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
