"""Dataset-driven evaluation (mAP/NDS) entry point.

Re-implementation of the reference test tool
(reference: tools/test.py:114-272 — build dataset/model, run inference,
dataset.evaluate -> nuScenes metrics).
"""

from __future__ import annotations

import argparse
import itertools

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate ResDet3D")
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--eval", default="bbox")
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from recondet3d.cli.train import (
        _setup_compile_cache,
        build_model_from_cfg,
        data_iterator,
    )
    from recondet3d.core.config import load_py_config, parse_cli_overrides
    from recondet3d.data.nuscenes import NuScenesDataset
    from recondet3d.train import load_checkpoint

    _setup_compile_cache()
    args = parse_args(argv)
    overrides = parse_cli_overrides(args.cfg_options)
    cfg = load_py_config(args.config, overrides)
    model = build_model_from_cfg(cfg)
    if model.pts_bbox_head is None:
        raise SystemExit(
            "config has no pts_bbox_head; evaluation needs a detection head "
            "(see configs/resdet3d_centerhead.py)"
        )
    dcfg = cfg["data"]["test"]
    dataset = NuScenesDataset(
        ann_file=dcfg["ann_file"], data_root=dcfg.get("data_root", ""),
        classes=dcfg.get("classes"), test_mode=True,
        custom_eval_set=dcfg.get("custom_eval_set"),
    )

    it = data_iterator(dataset, num_points_gt=8, img_hw=(900, 1600),
                       n_cams=6, epochs=1)
    first = next(it)
    variables = jax.jit(
        lambda r: model.init(r, jnp.asarray(first["img"]),
                             jnp.asarray(first["cam2lidar_rts"]))
    )(jax.random.PRNGKey(0))
    if args.checkpoint:
        state = load_checkpoint(args.checkpoint)
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}

    fwd = jax.jit(lambda v, i, c: model.apply(v, i, c))
    results = []
    for i, batch in enumerate(itertools.chain([first], it)):
        if args.max_samples is not None and i >= args.max_samples:
            break
        out = fwd(variables, jnp.asarray(batch["img"]),
                  jnp.asarray(batch["cam2lidar_rts"]))
        dets = model.pts_bbox_head.decode(
            out["det_preds"], class_names=dataset.CLASSES
        )
        results.extend(dets)
        print(f"sample {i}: {len(dets[0]['boxes_3d'])} boxes", flush=True)
    while len(results) < len(dataset):
        results.append(dict(boxes_3d=np.zeros((0, 9)), scores_3d=np.zeros(0),
                            labels_3d=np.zeros(0, np.int64)))
    metrics = dataset.evaluate(results)
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}")
    return 0


if __name__ == "__main__":
    main()
