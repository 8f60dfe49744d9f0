#!/usr/bin/env python
"""End-to-end benchmark: camera-frames/sec/chip for the full ResDet3D
pipeline (DA3 multi-view depth -> unprojection -> ball-query/FPS ->
sparse-conv occupancy refinement) on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The headline preset is the reference's production backbone
(DA3NESTED-GIANT-LARGE, reference: projects/configs/
ResDet3D_nuscenes_mini_config.py:214); the lighter da3-large preset is
dual-reported in the same JSON line under "extra".

vs_baseline follows BASELINE.json's north star (">=5x CPU-reference
throughput on v5e"): the same jitted program measured once on the CPU
backend (cached per preset in bench_baseline.json) defines cpu_fps, and
vs_baseline = tpu_fps / (5 * cpu_fps)  — i.e. 1.0 == target met.

Compositions (both honest, both reported):
  raw      — the point pipeline consumes DA3's own depth. With random
             init that depth field is arbitrary, so the pipeline cost is
             not anchored to a realistic distribution.
  anchored — DA3 still runs live on the real camera views (its cost is
             timed in full; a denormal coupling keeps it un-DCE-able) but
             the point pipeline consumes a depth field z-buffer-rendered
             from the reference's own output point cloud
             (assets/bench_sample/reference_points.npz), i.e. the
             realistic production distribution. Headline when available.

Schedules:
  serial    — each scene runs DA3 -> point pipeline -> refinement in
              sequence (the reference's per-scene order).
  pipelined — DA3 of scene t+1 is issued in the same step as the point
              pipeline of scene t (ResDet3D.pipelined_test_step). On a
              single-TensorCore chip XLA serializes HLOs, so this mainly
              probes scheduler/fusion effects; measured v5e numbers
              (anchored): nested 15.92 vs 15.90 serial, da3-large 23.06
              vs 23.16 — parity, as expected on one core
              (docs/performance.md).

Env knobs: RECONDET3D_BENCH_PRESET (default da3nested-giant-large),
RECONDET3D_BENCH_EXTRA (comma list, default da3-large; "" skips),
RECONDET3D_BENCH_SCHEDULE (serial|pipelined, default serial),
RECONDET3D_BENCH_COMPOSITION (anchored|raw|both, default anchored),
RECONDET3D_BENCH_ITERS (default 10), RECONDET3D_BENCH_BATCH (scenes per
step, default 2 — the measured throughput sweet spot; 1 = single-scene
latency), RECONDET3D_BENCH_REPS (in-jit scan repeats per timed call,
default 8), RECONDET3D_BENCH_CPU=1 to (re)measure the CPU baseline of
the headline preset, RECONDET3D_BENCH_CKPT to load real DA3 safetensors.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

PRESET = os.environ.get("RECONDET3D_BENCH_PRESET", "da3nested-giant-large")
EXTRA = [
    p for p in os.environ.get("RECONDET3D_BENCH_EXTRA", "da3-large").split(",")
    if p and p != PRESET
]
SCHEDULE = os.environ.get("RECONDET3D_BENCH_SCHEDULE", "serial")
COMPOSITION = os.environ.get("RECONDET3D_BENCH_COMPOSITION", "anchored")
ITERS = int(os.environ.get("RECONDET3D_BENCH_ITERS", "10"))
# scenes per jitted step: frames/s/chip is a THROUGHPUT metric and nothing
# ties the step to one scene — batching amortizes the VPU-bound softmax,
# per-stage bookkeeping, and the fixed dispatch cost, and fills the MXU on
# the small heads. fps = BATCH * N_CAMS / step_time. Measured saturation
# (docs/performance.md): nested 16.7 (B=1) -> 17.8 (B=2) -> 17.5 (B=4),
# da3-large 24.6 -> 27.3 — B=2 is the throughput default; set 1 for the
# single-scene latency number.
BATCH = int(os.environ.get("RECONDET3D_BENCH_BATCH", "2"))
BASELINE_FILE = os.path.join(REPO, "bench_baseline.json")

N_CAMS = 6
IMG_H, IMG_W = 900, 1600  # nuScenes camera resolution


def build_pipeline(dtype, preset=None, freeze_da3=True):
    from recondet3d.models.da3 import build_da3
    from recondet3d.models.detect import ReconstructionBackbone, ResDet3D
    from recondet3d.models.refine import SparseRefinement

    # unfrozen (fine-tuning) steps keep gradients through the ViT trunk;
    # remat the blocks or the live activations exceed v5e HBM.
    # RECONDET3D_REMAT_POLICY: 'block' (min memory) | 'dots' (save GEMM
    # outputs, recompute only elementwise glue)
    da3 = build_da3(
        preset or PRESET, dtype=dtype, remat=not freeze_da3,
        remat_policy=os.environ.get("RECONDET3D_REMAT_POLICY", "block"),
    )
    refinement = SparseRefinement(
        max_voxels=40960,
        occ_max_voxels=65536,
        stage_caps=(40960, 32768, 24576, 16384),
        dtype=dtype,
    )
    # voxel-grid pre-reduction (the reference config's sketched
    # VoxelDownsample stage) is the production default here: ~2x cheaper
    # point pipeline at equal downstream caps. RECONDET3D_BENCH_VPR=0
    # restores the exact unreduced reference pipeline.
    vpr = float(os.environ.get("RECONDET3D_BENCH_VPR", "0.1"))
    backbone = ReconstructionBackbone(
        da3=da3, refinement=refinement, voxel_pre_reduce=vpr,
        freeze_da3=freeze_da3,
    )
    return ResDet3D(reconstruction_backbone=backbone)


# nuScenes-like 6-camera rig yaws (FRONT, FRONT_LEFT, FRONT_RIGHT, BACK,
# BACK_LEFT, BACK_RIGHT)
_RIG_YAWS = np.deg2rad([0.0, 55.0, -55.0, 180.0, 110.0, -110.0])
# camera optical frame (x right, y down, z forward) -> vehicle/lidar frame
# (x forward, y left, z up), column form
_R_CAM2VEH = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)


def _real_assets():
    sample_dir = os.path.join(REPO, "assets", "bench_sample")
    return (
        os.environ.get("RECONDET3D_BENCH_NOISE") != "1"
        and all(os.path.exists(os.path.join(sample_dir, f"cam{i}.jpg"))
                for i in range(N_CAMS))
    )


def make_inputs(rng, batch=1):
    """Bench inputs: six real 900x1600 camera views (checked-in crops of the
    reference's example photos, assets/bench_sample/) on a nuScenes-like
    rig. Falls back to uniform noise if the assets are absent.
    RECONDET3D_BENCH_NOISE=1 forces the old synthetic inputs.

    ``batch`` > 1 replicates the scene with per-scene photometric jitter:
    scenes must differ numerically or XLA CSEs the per-scene point
    pipelines (the backbone unrolls them as a python loop) into one."""
    sample_dir = os.path.join(REPO, "assets", "bench_sample")
    use_real = _real_assets()
    if use_real:
        import cv2

        views = [
            cv2.imread(os.path.join(sample_dir, f"cam{i}.jpg"))[..., ::-1]
            for i in range(N_CAMS)
        ]
        img = np.stack(views)[None].astype(np.float32)
    else:
        img = rng.uniform(0, 255, (1, N_CAMS, IMG_H, IMG_W, 3)).astype(np.float32)
    if batch > 1:
        img = np.tile(img, (batch, 1, 1, 1, 1))
        # ±2-level brightness jitter per scene: visually negligible but
        # CSE-proof
        img += rng.uniform(-2.0, 2.0, (batch, 1, 1, 1, 1)).astype(np.float32)
        img = np.clip(img, 0, 255)
    c2l = np.tile(np.eye(4, dtype=np.float32), (batch, N_CAMS, 1, 1))
    for i in range(N_CAMS):
        th = _RIG_YAWS[i] if use_real else 2 * np.pi * i / N_CAMS
        Rz = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
            np.float32,
        )
        c2l[:, i, :3, :3] = Rz @ _R_CAM2VEH if use_real else Rz
        c2l[:, i, 3, :3] = [np.cos(th), np.sin(th), 1.5]
    return img, c2l


def make_anchor_depth(c2l, ph, pw, batch=1):
    """Z-buffer-render per-view depth maps from the reference's own output
    point cloud (assets/bench_sample/reference_points.npz), so the point
    pipeline consumes the realistic production depth distribution instead
    of a random-weight DA3 field. Host-side numpy, runs once at setup
    (untimed). Returns (1, N_CAMS, ph, pw) f32 with 0 = no point (treated
    as invalid by the pipeline's depth > 0 mask), or None if the asset is
    missing."""
    path = os.path.join(REPO, "assets", "bench_sample", "reference_points.npz")
    if not os.path.exists(path):
        return None
    pts = np.load(path)["points"].astype(np.float32)  # (P, 3) lidar frame
    # densify to pipeline scale: jitter-resample to ~N_CAMS*ph*pw/4 points
    rng = np.random.default_rng(0)
    n_target = N_CAMS * ph * pw // 4
    idx = rng.integers(0, len(pts), n_target)
    pts = pts[idx] + rng.normal(0, 0.03, (n_target, 3)).astype(np.float32)
    # nominal nuScenes intrinsics scaled to the processed resolution
    fx = 1266.0 * pw / IMG_W
    fy = 1266.0 * ph / IMG_H
    cx, cy = pw / 2.0, ph / 2.0
    depth = np.zeros((1, N_CAMS, ph, pw), np.float32)
    for n in range(N_CAMS):
        R = c2l[0, n, :3, :3]  # row-vector: p_lidar = p_cam @ R.T + t
        t = c2l[0, n, 3, :3]
        p_cam = (pts - t) @ R  # inverse of the row-vector transform
        z = p_cam[:, 2]
        ok = z > 0.5
        uf = fx * p_cam[:, 0] / np.maximum(z, 1e-6) + cx
        vf = fy * p_cam[:, 1] / np.maximum(z, 1e-6) + cy
        ok &= (uf >= 0) & (uf < pw) & (vf >= 0) & (vf < ph)
        u = np.where(ok, uf, 0.0).astype(np.int32)
        v = np.where(ok, vf, 0.0).astype(np.int32)
        flat = np.full(ph * pw, np.inf, np.float32)
        np.minimum.at(flat, v[ok] * pw + u[ok], z[ok])
        d = flat.reshape(ph, pw)
        depth[0, n] = np.where(np.isfinite(d), d, 0.0)
    if batch > 1:
        depth = np.tile(depth, (batch, 1, 1, 1))
        # per-scene cm-scale depth jitter (CSE-proof); holes stay exactly 0
        jit = rng.normal(0, 0.01, (batch, 1, 1, 1)).astype(np.float32)
        depth = np.where(depth > 0, np.maximum(depth + jit, 0.51), 0.0)
    return depth


def _load_ckpt_into(variables, ckpt):
    import jax

    from recondet3d.api.weights import convert_torch_state_dict, load_safetensors

    da3_params = jax.device_get(
        variables["params"]["reconstruction_backbone"]["da3"]
    )
    da3_params, _, unfilled = convert_torch_state_dict(
        load_safetensors(ckpt), da3_params
    )
    if unfilled:
        print(f"[bench] WARNING: {len(unfilled)} params unfilled", file=sys.stderr)
    p = dict(variables["params"]); rb = dict(p["reconstruction_backbone"])
    rb["da3"] = da3_params; p["reconstruction_backbone"] = rb
    print(f"[bench] loaded DA3 weights from {ckpt}", file=sys.stderr)
    return dict(variables, params=p)


def measure(preset, backend, iters, schedule=SCHEDULE, composition=COMPOSITION):
    """Returns dict with fps (headline composition), per-composition fps,
    flops and ms/step."""
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    model = build_pipeline(dtype, preset=preset)
    rng = np.random.default_rng(0)
    # CPU baseline stays at B=1 (frames/s is comparable across batch
    # sizes; a B>1 CPU compile of the nested model takes tens of minutes)
    batch = BATCH if backend == "tpu" else 1
    img, c2l = make_inputs(rng, batch=batch)
    use_real = _real_assets()
    img_j, c2l_j = jnp.asarray(img), jnp.asarray(c2l)

    t0 = time.time()
    variables = jax.jit(lambda r: model.init(r, img_j, c2l_j))(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    print(f"[bench:{preset}] init {time.time()-t0:.1f}s", file=sys.stderr)

    ckpt = os.environ.get("RECONDET3D_BENCH_CKPT")
    if ckpt:  # real DA3 safetensors -> real depth distribution
        variables = _load_ckpt_into(variables, ckpt)

    if backend == "tpu" and os.environ.get(
            "RECONDET3D_BENCH_BF16_PARAMS", "1") != "0":
        # serving-time storage cast: bf16 copies of exactly the trunk
        # params the modules consume in bf16 anyway — RESULT-IDENTICAL
        # (tests/test_da3_parity.py::test_cast_trunk_params_bf16_exact),
        # removes the per-step f32->bf16 weight-cast HBM traffic
        from recondet3d.api.weights import cast_trunk_params_bf16

        variables = jax.jit(
            lambda v: dict(v, params=cast_trunk_params_bf16(v["params"]))
        )(variables)
        jax.block_until_ready(variables)

    # anchor depth (realistic distribution) at the model's processed res
    from recondet3d.data.input_processor import compute_process_shape

    bk = model.reconstruction_backbone
    _, _, rh, rw = compute_process_shape(IMG_H, IMG_W, bk.process_res)
    ph, pw = rh, rw
    anchor = None
    if composition in ("anchored", "both") and not ckpt:
        anchor_np = make_anchor_depth(c2l, ph, pw, batch=batch)
        if anchor_np is not None:
            anchor = jnp.asarray(anchor_np)
    if anchor is None and composition != "raw":
        composition = "raw"
        print("[bench] anchor assets unavailable -> raw composition",
              file=sys.stderr)

    # reduce outputs to scalars ON DEVICE: both heads still compute (no
    # DCE), but the host sync transfers 8 bytes instead of ~4.6MB — over a
    # tunneled backend the full fetch added ~100ms/iter of pure transfer.
    # The whole step is repeated REPS times inside ONE jit call via
    # lax.scan so the fixed ~24ms tunnel dispatch+sync round trip is paid
    # once per REPS steps, not once per step (CLAUDE.md measurement notes).
    # The scan carry threads a numerically-zero (~1e-38) image perturbation
    # derived from the previous step's output, so XLA can neither hoist the
    # body out of the loop nor run iterations concurrently.
    reps = 1 if backend == "cpu" else int(
        os.environ.get("RECONDET3D_BENCH_REPS", "8")
    )

    def _scalars(out):
        return (
            out["pseudo_points"].sum().astype(jnp.float32),
            out["aux"]["occupancy_logits"].sum().astype(jnp.float32),
        )

    def _step(v, i, c, anchor_d):
        out = model.apply(v, i, c, depth_override=anchor_d)
        return _scalars(out)

    def _run_serial(v, i, c, anchor_d):
        def body(carry, _):
            eps, _, _ = carry
            s0, s1 = _step(v, i + eps.astype(i.dtype), c, anchor_d)
            return (s0 * jnp.float32(1e-38), s0, s1), None

        (_, s0, s1), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)),
            None, length=reps,
        )
        return s0, s1

    def _prime(v, i):
        return model.apply(
            v, i, method=lambda m, im: m.reconstruction_backbone.predict_depth(im)
        )[:2]

    def _run_pipelined(v, i, c, d0, n0, anchor_d):
        # scene stream: step t issues DA3 on scene t (img + eps_t) and the
        # point pipeline on scene t-1's carried depth; when anchored, the
        # consumed depth is the anchor field denormal-coupled to the carry
        # so the DA3 forward stays load-bearing inside the loop. The bench
        # replays ONE scene, so prev_img == img (a real serving loop would
        # carry scene t-1's images alongside its depth).
        def body(carry, _):
            eps, depth, intr, _, _ = carry
            consumed = depth if anchor_d is None else (
                # gated coupling: anchor holes (0 = invalid) stay exactly 0
                anchor_d + jnp.where(anchor_d > 0, depth * jnp.float32(1e-38), 0.0)
            )
            (d2, n2), out = model.apply(
                v, consumed, intr, i, i + eps.astype(i.dtype), c,
                method="pipelined_test_step",
            )
            s0, s1 = _scalars(out)
            return (s0 * jnp.float32(1e-38), d2, n2, s0, s1), None

        (_, _, _, s0, s1), _ = jax.lax.scan(
            body, (jnp.float32(0.0), d0, n0, jnp.float32(0.0), jnp.float32(0.0)),
            None, length=reps,
        )
        return s0, s1

    def sync(o):
        # axon's block_until_ready does not reliably block; a device_get does
        float(o[0])
        float(o[1])

    anchor_arg = anchor if composition in ("anchored", "both") else None

    if schedule == "pipelined":
        prime = jax.jit(_prime)
        d0, n0 = prime(variables, img_j)
        fwd = jax.jit(_run_pipelined)
        args = (variables, img_j, c2l_j, d0, n0, anchor_arg)
    else:
        fwd = jax.jit(_run_serial)
        args = (variables, img_j, c2l_j, anchor_arg)

    t0 = time.time()
    out = fwd(*args)
    sync(out)
    print(f"[bench:{preset}] compile+first {time.time()-t0:.1f}s", file=sys.stderr)

    flops = None
    try:  # XLA's own FLOP count for ONE e2e step (MFU line) — lower the
        # single step, not the scan: cost_analysis counts a loop body once
        # regardless of trip count, so the scan lowering under-reports
        ca = (
            jax.jit(_step).lower(variables, img_j, c2l_j, anchor_arg)
            .compile().cost_analysis()
        )
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)

    # per-call timings, then MIN: the tunnel-shared chip shows heavy
    # run-to-run interference (same op measured 1.4 vs 57 ms minutes
    # apart); the min over calls is the stable throughput statistic.
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fwd(*args)
        sync(out)
        ts.append(time.time() - t0)
    dt = min(ts) / reps
    mean_dt = sum(ts) / len(ts) / reps
    if mean_dt > 1.1 * dt:
        print(f"[bench:{preset}] interference: mean {mean_dt*1e3:.0f} ms vs "
              f"min {dt*1e3:.0f} ms per step", file=sys.stderr)

    res = dict(
        fps=batch * N_CAMS / dt, ms_per_step=dt * 1e3, ms_mean=mean_dt * 1e3,
        flops=flops, batch=batch,
        per_iter_ms=[round(t / reps * 1e3, 1) for t in ts],
        composition="anchored" if anchor_arg is not None else "raw",
        schedule=schedule,
    )

    if composition == "both" and anchor is not None and backend == "tpu":
        # side measurement: raw composition at the same schedule
        if schedule == "pipelined":
            args2 = (variables, img_j, c2l_j, d0, n0, None)
        else:
            args2 = (variables, img_j, c2l_j, None)
        out = fwd(*args2); sync(out)  # compile
        ts2 = []
        for _ in range(max(2, iters - 2)):
            t0 = time.time()
            out = fwd(*args2)
            sync(out)
            ts2.append(time.time() - t0)
        res["raw_fps"] = batch * N_CAMS / (min(ts2) / reps)
    return res


def _read_baselines():
    if not os.path.exists(BASELINE_FILE):
        return {}
    with open(BASELINE_FILE) as f:
        rec = json.load(f)
    if "baselines" in rec:
        return rec["baselines"]
    # legacy single-preset format
    if "preset" in rec:
        return {rec["preset"]: dict(cpu_fps=rec["cpu_fps"], shape=rec.get("shape"))}
    return {}


def main():
    baselines = _read_baselines()
    if os.environ.get("RECONDET3D_BENCH_CPU") == "1":
        # measure in a subprocess: jax_platforms cannot be flipped back to
        # tpu within one process
        import subprocess

        env = dict(os.environ, RECONDET3D_BENCH_CPU="inner",
                   JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        )
        cpu_fps = float(out.stdout.strip().splitlines()[-1])
        baselines[PRESET] = dict(
            cpu_fps=cpu_fps, shape=[N_CAMS, IMG_H, IMG_W],
            composition=COMPOSITION if COMPOSITION != "both" else "anchored",
            schedule=SCHEDULE,
        )
        with open(BASELINE_FILE, "w") as f:
            json.dump({"baselines": baselines}, f, indent=1)
        print(f"[bench] cpu baseline {PRESET}: {cpu_fps:.5f} frames/s",
              file=sys.stderr)
        return
    elif os.environ.get("RECONDET3D_BENCH_CPU") == "inner":
        comp = COMPOSITION if COMPOSITION != "both" else "anchored"
        print(measure(PRESET, "cpu", iters=1, composition=comp)["fps"])
        return

    def vs(preset, fps, res):
        b = baselines.get(preset)
        if not b:
            return None
        # a baseline measured under a different composition/schedule (or a
        # legacy record that never stamped them) is not comparable
        for key in ("composition", "schedule"):
            if b.get(key) != res.get(key):
                print(f"[bench:{preset}] baseline {key}={b.get(key)!r} != "
                      f"run {key}={res.get(key)!r} -> vs_baseline=None "
                      f"(re-measure with RECONDET3D_BENCH_CPU=1)",
                      file=sys.stderr)
                return None
        return round(fps / (5.0 * b["cpu_fps"]), 3)

    def mfu_of(res):
        if not res.get("flops"):
            return None
        # v5e bf16 peak: 197 TFLOP/s; self-auditing utilization line
        return res["flops"] / (res["ms_per_step"] / 1e3) / 197e12 * 100.0

    results = {}
    for preset in [PRESET] + EXTRA:
        res = measure(preset, "tpu", iters=ITERS)
        results[preset] = res
        mfu = mfu_of(res)
        line = (f"[bench:{preset}] {res['fps']:.2f} frames/s/chip "
                f"({res['ms_per_step']:.0f} ms/step, {res['composition']}, "
                f"{res['schedule']})")
        if mfu:
            line += (f", {res['flops']/1e12:.2f} TFLOP/step -> MFU "
                     f"{mfu:.1f}% of v5e bf16 peak")
        if "raw_fps" in res:
            line += f"; raw composition {res['raw_fps']:.2f} f/s"
        print(line, file=sys.stderr)

    head = results[PRESET]
    mfu = mfu_of(head)
    extra = {
        p: {
            "fps": round(r["fps"], 3),
            "vs_baseline": vs(p, r["fps"], r),
            "mfu_pct": None if not mfu_of(r) else round(mfu_of(r), 2),
            "ms_min": round(r["ms_per_step"], 1),
            "ms_mean": round(r["ms_mean"], 1),
            "batch": r["batch"],
        }
        for p, r in results.items() if p != PRESET
    }
    rec = {
        "metric": (
            f"camera-frames/sec/chip, e2e ResDet3D ({PRESET} depth + "
            f"unprojection + ball-query/FPS + sparse-conv occupancy), "
            f"{N_CAMS}x{IMG_H}x{IMG_W} input, {head['composition']} "
            f"depth composition, {head['schedule']} schedule, "
            f"batch {head['batch']}"
        ),
        "value": round(head["fps"], 3),
        "unit": "frames/s/chip",
        "vs_baseline": vs(PRESET, head["fps"], head),
        "mfu_pct": None if mfu is None else round(mfu, 2),
        # min is the throughput statistic (tunnel-shared chip shows heavy
        # run-to-run interference); mean >> min flags an interfered run,
        # per_iter_ms quantifies it
        "ms_min": round(head["ms_per_step"], 1),
        "ms_mean": round(head["ms_mean"], 1),
        "batch": head["batch"],
        "per_iter_ms": head["per_iter_ms"],
    }
    if "raw_fps" in head:
        rec["raw_fps"] = round(head["raw_fps"], 3)
    if extra:
        rec["extra"] = extra
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
