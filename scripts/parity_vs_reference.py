#!/usr/bin/env python
"""Real-weight parity harness: checkpoint -> inference -> verdict.

Given a DA3 safetensors checkpoint, runs the full 6-view ResDet3D
inference path (DA3 depth -> unproject -> ball-query/FPS to 40k points),
writes depth maps + a point-cloud PCD, and scores the result against the
reference's checked-in outputs (reference: output/sample_0_points.pcd,
output/batch_0_pred_{0,1}_points.pcd — produced by
tools/inference_mmdet3d.py:286-289, 40k xyzrgb points each; the
inference contract is api.py:76-90 + ResDet3D.py:184-213).

The result is PARITY.json with quantified metrics and tolerances:
  - symmetric chamfer distance (m) pseudo-points vs each reference PCD
  - range-distribution RMSE (sorted radial-distance quantiles, m)
  - per-axis extent / centroid deltas
  - depth-map summary stats per view

Provenance caveats recorded in the JSON:
  - No checkpoint ships in this environment and huggingface.co is
    unreachable (DNS NXDOMAIN, retried — see `network_attempt`), so this
    harness is exercised with --allow-random for plumbing tests and is
    ready to run the moment weights land:
        python scripts/parity_vs_reference.py --ckpt model.safetensors
  - The reference PCDs come from nuScenes-mini samples whose source
    images are not in this environment. When run on other images
    (default: assets/bench_sample), the chamfer numbers measure
    scene-level agreement only through the distribution metrics; exact
    chamfer parity additionally needs --images pointing at the matching
    nuScenes sample (6 cams, nuScenes order) + --cam2lidar from its
    calibration.

Usage:
  python scripts/parity_vs_reference.py --ckpt /path/to/model.safetensors
      [--preset da3nested-giant-large] [--images DIR] [--out parity_out]
      [--cam2lidar file.npy] [--allow-random]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFERENCE_PCDS = [
    "/root/reference/output/sample_0_points.pcd",
    "/root/reference/output/batch_0_pred_0_points.pcd",
    "/root/reference/output/batch_0_pred_1_points.pcd",
]

# Pass/fail tolerances. Chamfer: the reference's own two batch_0 preds
# differ across samples by metres (different scenes); same-scene parity
# at 504-res depth should land well under 0.5 m mean symmetric chamfer
# (the FPS spacing over the 108 m range is ~0.5 m at 40k points).
TOLERANCES = {
    "chamfer_same_scene_m": 0.5,
    "range_quantile_rmse_m": 2.0,
    "extent_rel_err": 0.25,
}


def chamfer(a: np.ndarray, b: np.ndarray, chunk: int = 2048) -> dict:
    """Symmetric chamfer between (N,3) and (M,3), chunked on host."""

    def one_way(x, y):
        mins = np.empty(len(x), np.float32)
        for i in range(0, len(x), chunk):
            d = np.linalg.norm(x[i : i + chunk, None, :] - y[None], axis=-1)
            mins[i : i + chunk] = d.min(axis=1)
        return mins

    ab, ba = one_way(a, b), one_way(b, a)
    return {
        "mean_m": float((ab.mean() + ba.mean()) / 2),
        "median_m": float((np.median(ab) + np.median(ba)) / 2),
        "p90_m": float((np.quantile(ab, 0.9) + np.quantile(ba, 0.9)) / 2),
    }


def distribution_stats(pts: np.ndarray) -> dict:
    r = np.linalg.norm(pts[:, :2], axis=1)
    q = np.quantile(r, np.linspace(0, 1, 101))
    return {
        "count": int(len(pts)),
        "centroid": [float(v) for v in pts.mean(0)],
        "extent": [float(v) for v in (pts.max(0) - pts.min(0))],
        "range_quantiles": [float(v) for v in q],
    }


def attempt_network(timeout: float = 10.0) -> dict:
    """Record whether huggingface.co is reachable (it is not, in this env)."""
    import urllib.request

    rec = {"url": "https://huggingface.co", "attempts": []}
    for _ in range(2):
        try:
            r = urllib.request.urlopen(rec["url"], timeout=timeout)
            rec["attempts"].append({"ok": True, "status": r.status})
            return rec
        except Exception as e:
            rec["attempts"].append({"ok": False, "error": f"{type(e).__name__}: {e}"})
            time.sleep(1)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.environ.get("RECONDET3D_BENCH_CKPT"))
    ap.add_argument("--preset", default="da3nested-giant-large")
    ap.add_argument("--images", default=os.path.join(REPO, "assets", "bench_sample"))
    ap.add_argument("--cam2lidar", default=None,
                    help=".npy (N,4,4) row-vector cam2lidar; default bench rig")
    ap.add_argument("--out", default=os.path.join(REPO, "parity_out"))
    ap.add_argument("--allow-random", action="store_true",
                    help="run with random init (plumbing test only)")
    ap.add_argument("--same-scene", action="store_true",
                    help="assert the same-scene chamfer tolerance (use when "
                    "--images IS the scene behind the reference PCDs)")
    args = ap.parse_args()

    if not args.ckpt and not args.allow_random:
        sys.exit(
            "No checkpoint: pass --ckpt or set RECONDET3D_BENCH_CKPT "
            "(or --allow-random for a plumbing run)."
        )

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    import cv2
    import jax.numpy as jnp

    os.environ["RECONDET3D_BENCH_PRESET"] = args.preset
    import bench
    from recondet3d.data.export import export_to_depth_vis
    from recondet3d.data.export.pointcloud_io import read_pcd, write_pcd

    os.makedirs(args.out, exist_ok=True)

    # --- inputs -----------------------------------------------------------
    cams = sorted(
        f for f in os.listdir(args.images)
        if f.lower().endswith((".jpg", ".png", ".jpeg"))
    )[:6]
    if len(cams) < 6:
        sys.exit(f"need 6 camera images in {args.images}, found {len(cams)}")
    views = [cv2.imread(os.path.join(args.images, f))[..., ::-1] for f in cams]
    hw = views[0].shape[:2]
    views = [
        v if v.shape[:2] == hw else cv2.resize(v, (hw[1], hw[0])) for v in views
    ]
    img = np.stack(views)[None].astype(np.float32)
    if args.cam2lidar:
        c2l = np.load(args.cam2lidar).astype(np.float32)[None]
    else:
        _, c2l = bench.make_inputs(np.random.default_rng(0))

    # --- model ------------------------------------------------------------
    model = bench.build_pipeline(jnp.bfloat16)
    img_j, c2l_j = jnp.asarray(img), jnp.asarray(c2l)
    variables = jax.jit(lambda r: model.init(r, img_j, c2l_j))(jax.random.PRNGKey(0))

    weights_rec = {"ckpt": args.ckpt, "random_init": args.ckpt is None}
    if args.ckpt:
        from recondet3d.api.weights import convert_torch_state_dict, load_safetensors

        da3_params = jax.device_get(
            variables["params"]["reconstruction_backbone"]["da3"]
        )
        da3_params, unused, unfilled = convert_torch_state_dict(
            load_safetensors(args.ckpt), da3_params
        )
        weights_rec.update(unused=len(unused), unfilled=len(unfilled))
        if unfilled:
            print(f"[parity] WARNING: {len(unfilled)} params unfilled:",
                  unfilled[:8], file=sys.stderr)
        p = dict(variables["params"]); rb = dict(p["reconstruction_backbone"])
        rb["da3"] = da3_params; p["reconstruction_backbone"] = rb
        variables = dict(variables, params=p)

    # --- inference --------------------------------------------------------
    fwd = jax.jit(lambda v, i, c: model.apply(v, i, c))
    out = jax.device_get(fwd(variables, img_j, c2l_j))
    pts = np.asarray(out["pseudo_points"][0], np.float32)
    msk = np.asarray(out["pseudo_valid"][0], bool)
    depth = np.asarray(out["aux"]["da3"]["depth"][0], np.float32)  # (N, h, w)
    mask_empty_fallback = False
    if msk.any():
        pts = pts[msk]
    else:
        # random-init DA3 can predict a depth field whose unprojection
        # leaves ZERO in-range points (every row masked). Keep the
        # plumbing run exercising the metric code paths on the raw
        # capacity rows, labeled as degenerate — real weights produce a
        # real mask.
        mask_empty_fallback = True
        pts = np.nan_to_num(pts, nan=0.0, posinf=0.0, neginf=0.0)
        print("[parity] WARNING: zero valid pseudo-points (random-init "
              "degenerate); metrics computed on unmasked capacity rows",
              file=sys.stderr)

    # --- outputs ----------------------------------------------------------
    write_pcd(os.path.join(args.out, "points.pcd"), pts[:, :3],
              colors=pts[:, 3:6] if pts.shape[1] >= 6 else None)
    np.savez_compressed(os.path.join(args.out, "depth.npz"), depth=depth)

    class _P:  # minimal Prediction stand-in for the exporter
        pass

    _p = _P(); _p.depth = depth
    export_to_depth_vis(_p, args.out)

    report = {
        "preset": args.preset,
        "images": [os.path.join(args.images, f) for f in cams],
        "weights": weights_rec,
        "network_attempt": attempt_network(),
        "tolerances": TOLERANCES,
        "n_points": int(len(pts)),
        "mask_empty_fallback": mask_empty_fallback,
        "depth_stats": [
            {"view": i, "min": float(d.min()), "max": float(d.max()),
             "mean": float(d.mean()), "median": float(np.median(d))}
            for i, d in enumerate(depth)
        ],
        "ours": distribution_stats(pts[:, :3]),
        "vs_reference": {},
        "caveat": (
            "chamfer vs the reference PCDs is a same-scene metric; when "
            "--images is not the nuScenes sample behind them, judge by "
            "the distribution metrics only"
        ),
    }

    for ref_path in REFERENCE_PCDS:
        if not os.path.exists(ref_path):
            continue
        ref_pts, _ = read_pcd(ref_path)
        ref_pts = ref_pts[:, :3].astype(np.float32)
        ours_q = np.asarray(report["ours"]["range_quantiles"])
        ref_stats = distribution_stats(ref_pts)
        ref_q = np.asarray(ref_stats["range_quantiles"])
        ours_ext = np.asarray(report["ours"]["extent"])
        ref_ext = np.asarray(ref_stats["extent"])
        entry = {
            "reference": ref_stats,
            "chamfer": chamfer(pts[:, :3], ref_pts),
            "range_quantile_rmse_m": float(
                np.sqrt(np.mean((ours_q - ref_q) ** 2))
            ),
            "extent_rel_err": float(
                np.max(np.abs(ours_ext - ref_ext) / np.maximum(ref_ext, 1e-6))
            ),
        }
        entry["pass_distribution"] = bool(
            entry["range_quantile_rmse_m"] <= TOLERANCES["range_quantile_rmse_m"]
            and entry["extent_rel_err"] <= TOLERANCES["extent_rel_err"]
        )
        if args.same_scene:
            entry["pass_chamfer"] = bool(
                entry["chamfer"]["mean_m"] <= TOLERANCES["chamfer_same_scene_m"]
            )
        report["vs_reference"][os.path.basename(ref_path)] = entry

    passes = [
        e.get("pass_chamfer", e["pass_distribution"])
        for e in report["vs_reference"].values()
    ]
    report["verdict"] = (
        "PASS" if passes and any(passes)
        else ("FAIL" if args.ckpt else "N/A (random init — plumbing run only)")
    )

    out_json = os.path.join(args.out, "PARITY.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"verdict": report["verdict"],
                      "n_points": report["n_points"],
                      "out": out_json}))


if __name__ == "__main__":
    main()
