#!/usr/bin/env python
"""Measure the production train step on the real chip: full ResDet3D
(frozen da3-large depth -> unprojection -> pipeline -> refinement) with
occupancy loss + AdamW-on-trainables, one jitted step.

Usage: python scripts/measure_train_step.py [iters] [--unfrozen] [--curve]

--curve (use with iters >= 50) additionally writes TRAIN_CURVE.json
(the normalized on-chip loss trajectory + ms/step) and ASSERTS the
normalized tail the way tests/test_full_loop.py does on CPU — the
reference's production occupancy run stagnates at ~0.88 normalized
(reference: ANALYSIS_OCCUPANCY_TRAINING.md:6-9), a healthy chip-side
run here must beat 0.5 by step 150 — so one command catches chip-side
training regressions.

--unfrozen removes the DA3 freeze (reference fine-tuning mode,
freeze_da3=False in ResDet3D_nuscenes_mini_config.py) so gradients flow
through the whole ViT — this is the path that compiles and executes the
two Pallas flash-attention backward kernels (ops/attention.py dQ and
dK/dV) on the real chip at production token counts (721 local / 4326
global, padded to the backward block grid; RECONDET3D_REMAT_POLICY
selects the rematerialization policy: block (recompute whole blocks,
min memory) | dots (save GEMM outputs) | global (remat only the
global-attention blocks) | attn (save FFN/norm activations, recompute
only the attention sub-path)).
The trunk blocks are rematerialized when unfrozen (build_pipeline sets
remat) or the live activations exceed v5e HBM.

Preset via RECONDET3D_BENCH_PRESET. Defaults are per-mode: frozen ->
bench.PRESET (da3nested-giant-large), --unfrozen -> da3-large. The
nested-giant preset cannot fine-tune on ONE v5e — params+AdamW state
alone are 1656M*4B*3 = 19.9 GB > 16 GB HBM; that configuration is
inherently multichip (scripts/flagship_multichip.py shards it), so
combining --unfrozen with an explicit nested-giant preset errors out
early instead of OOMing after minutes of compile."""

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
from recondet3d.parallel.mesh import make_mesh, shard_batch
from recondet3d.train.trainer import Trainer


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    unfrozen = "--unfrozen" in sys.argv[1:]
    iters = int(args[0]) if args else 5
    preset = os.environ.get("RECONDET3D_BENCH_PRESET")
    if preset is None:
        # per-mode default: nested-giant cannot fine-tune on one v5e
        preset = "da3-large" if unfrozen else bench.PRESET
    elif unfrozen and "giant" in preset:
        sys.exit(
            f"--unfrozen with {preset}: params+AdamW state (19.9 GB) exceed "
            "one v5e's 16 GB HBM; use scripts/flagship_multichip.py for the "
            "sharded fine-tune or RECONDET3D_BENCH_PRESET=da3-large here."
        )
    print(f"preset: {preset}", file=sys.stderr)
    model = bench.build_pipeline(jnp.bfloat16, preset=preset,
                                 freeze_da3=not unfrozen)
    if unfrozen:
        print("UNFROZEN: gradients through DA3 (Pallas attention backward)",
              file=sys.stderr)
    rng = np.random.default_rng(0)
    img, c2l = bench.make_inputs(rng)
    gt = rng.uniform(-50, 50, (1, 40000, 3)).astype(np.float32)
    gt[..., 2] = rng.uniform(-4, 2, (1, 40000))
    batch = dict(
        img=jnp.asarray(img),
        cam2lidar_rts=jnp.asarray(c2l),
        gt_points=jnp.asarray(gt),
    )

    # unfrozen runs use the standard fine-tune lr (1e-4): the reference
    # only ever fine-tunes from PRETRAINED weights, and this harness's
    # random-init ViT diverges to nan within ~7 steps under the reference
    # config's cyclic ramp toward 1e-2 (measured round 4; the flash
    # backward itself is finite at these shapes up to 30-sigma inputs —
    # see the nan probe note in docs/performance.md). Timing is
    # lr-independent; the lower lr just keeps the recorded loss finite.
    #
    # --curve runs size the cyclic schedule to the run (total_steps =
    # iters, the train CLI's max_steps behavior): with the schedule fixed
    # at 1000 a 200-step run covers only the first 20% of the lr ramp and
    # the curve stalls near the base lr (measured: normalized 0.77 at
    # nested-giant) — a schedule artifact, not a training regression; the
    # regression gate needs the schedule to complete to be comparable
    # across runs.
    curve = "--curve" in sys.argv[1:]
    trainer = Trainer(model=model, total_steps=iters if curve else 1000,
                      lr=1e-4 if unfrozen else 1e-3, mesh=make_mesh(),
                      frozen_patterns=() if unfrozen else ("da3",))
    t0 = time.time()
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params)
    print(f"init_state {time.time()-t0:.1f}s", file=sys.stderr)

    n_opt = sum(
        x.size for x in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(x, "size")
    )
    n_par = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"params {n_par/1e6:.1f}M, opt-state {n_opt/1e6:.1f}M elements",
          file=sys.stderr)

    step = trainer.compile()
    sb = shard_batch(trainer.mesh, batch)

    # two warmup steps: the first executions pay compile + tunnel transfer /
    # donation setup (measured ~60s + ~50s), steady state follows
    for w in range(2):
        t0 = time.time()
        state, metrics = step(state, sb)
        loss = float(metrics["loss"])  # sync
        print(f"warmup {w}: {time.time()-t0:.1f}s loss={loss:.4f}",
              file=sys.stderr)

    # (curve parsed above, before the Trainer is built)
    losses = []
    t0 = time.time()
    for it in range(iters):
        state, metrics = step(state, sb)
        loss = float(metrics["loss"])  # device_get sync each step
        losses.append(loss)
        if iters <= 20 or it % 10 == 0 or it == iters - 1:
            print(f"  step {it}: loss={loss:.4f} "
                  f"grad_norm={float(metrics['grad_norm']):.4f}",
                  file=sys.stderr, flush=True)
    dt = (time.time() - t0) / iters
    print(f"train step: {dt*1000:.1f} ms/step  loss={loss:.4f} "
          f"grad_norm={float(metrics['grad_norm']):.4f}")

    if curve:
        import json

        normalized = [l / losses[0] for l in losses]
        rec = dict(
            preset=preset, unfrozen=unfrozen, steps=iters,
            ms_per_step=round(dt * 1000, 1),
            losses=[round(l, 4) for l in losses],
            normalized_tail=round(normalized[-1], 4),
        )
        suffix = "" if preset == "da3-large" else f"_{preset}"
        path = os.path.join(REPO, f"TRAIN_CURVE{suffix}.json")
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {path}: normalized tail {normalized[-1]:.3f}",
              file=sys.stderr)
        # regression gate (mirrors tests/test_full_loop.py): the curve must
        # clearly beat the reference's stagnating ~0.88 normalized plateau.
        # Preset-calibrated floors, measured round 5 on-chip (200 steps,
        # completed cyclic schedule): da3-large converges to 0.074
        # normalized (loss 6.98 -> 0.52, matching the round-2 record);
        # nested-giant PLATEAUS at 0.64 (loss 6.93 -> 4.41, grad_norm
        # 0.43) — its random-init dual-branch depth field yields a harder
        # occupancy memorization target, a floor difference, not a
        # regression (verified by running both presets back to back).
        thresh = (0.75 if "giant" in preset else 0.5) if iters >= 150 \
            else 0.95
        assert normalized[-1] < thresh, (
            f"chip train curve regressed: normalized tail "
            f"{normalized[-1]:.3f} >= {thresh} over {iters} steps"
        )


if __name__ == "__main__":
    main()
