#!/usr/bin/env python
"""AOT-lower (and compile) the FLAGSHIP training step on a virtual multichip
mesh — production shapes, not the toy dryrun.

Flagship config = configs/resdet3d_centerhead.py, which inherits
resdet3d_nuscenes_mini.py: the DA3NESTED-GIANT-LARGE backbone (vitg main +
vitl metric branch, 1657.9M params; 6 cams, process_res 504, 900x1600
inputs), 40k-point pipeline, SparseRefinement at
sparse_shape [41,1440,1440] with production stage caps, BEV occupancy U-Net,
CenterHead detection losses — the full train step (loss + grads + AdamW)
jitted over a ('data','model') mesh with the ViT tensor-parallel layout.

Everything runs on abstract values (jax.eval_shape / AOT lowering): no
parameters are materialized, so this validates that the flagship sharded
program traces, partitions, and compiles on an n-device mesh without
needing n real chips (reference scale target: SURVEY §2.7,
ResDet3D_nuscenes_mini_config.py:240).

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python scripts/flagship_multichip.py [--compile]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


V5E_HBM_MB = 16 * 1024
HBM_BUDGET_MB = 15 * 1024  # leave ~1 GB headroom for runtime buffers


def flagship_lowering(mesh, *, compile_step: bool = True, max_objs: int = 500,
                      unfrozen: bool = False):
    """Trace + SPMD-partition the flagship train step on ``mesh``.

    ``unfrozen=False`` is the production frozen-DA3 regime (AdamW state
    only on the refinement — build_optimizer masks 'da3');
    ``unfrozen=True`` is the fine-tune regime (gradients + AdamW moments
    through the whole 1.66B-param nested net, trunk blocks rematerialized)
    — the configuration measure_train_step.py documents as inherently
    multichip.

    Returns a dict of diagnostics (trace/compile seconds, per-device
    memory estimates when compiled, and a ``fits_v5e`` verdict asserting
    the donated-arguments peak under the 16 GB HBM budget).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from recondet3d.cli.train import build_model_from_cfg
    from recondet3d.core.config import load_py_config
    from recondet3d.parallel.mesh import DATA_AXIS, data_sharding, replicated
    from recondet3d.parallel.tp import da3_param_shardings
    from recondet3d.train.optim import build_optimizer
    from recondet3d.train.trainer import TrainState, make_train_step

    cfg = load_py_config(os.path.join(REPO, "configs", "resdet3d_centerhead.py"))
    cfg_dict = cfg.to_dict()
    if unfrozen:
        # freeze_da3=False also turns on trunk remat (cli/train.py)
        cfg_dict["model"]["reconstruction_backbone"]["freeze_da3"] = False
    model = build_model_from_cfg(cfg_dict)

    dp = mesh.shape[DATA_AXIS]
    B = dp  # one scene per data shard — the production regime
    batch_avals = {
        "img": jax.ShapeDtypeStruct((B, 6, 900, 1600, 3), jnp.float32,
                                    sharding=data_sharding(mesh, 5)),
        "cam2lidar_rts": jax.ShapeDtypeStruct((B, 6, 4, 4), jnp.float32,
                                              sharding=data_sharding(mesh, 4)),
        "gt_points": jax.ShapeDtypeStruct((B, 40000, 3), jnp.float32,
                                          sharding=data_sharding(mesh, 3)),
        "gt_bboxes_3d": jax.ShapeDtypeStruct((B, max_objs, 9), jnp.float32,
                                             sharding=data_sharding(mesh, 3)),
        "gt_labels_3d": jax.ShapeDtypeStruct((B, max_objs), jnp.int32,
                                             sharding=data_sharding(mesh, 2)),
        "gt_bboxes_valid": jax.ShapeDtypeStruct((B, max_objs), bool,
                                                sharding=data_sharding(mesh, 2)),
    }

    t0 = time.time()
    var_avals = jax.eval_shape(
        lambda r, b: model.init(r, return_loss=True, train=False, **b),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        batch_avals,
    )
    params_avals = var_avals["params"]
    stats_avals = var_avals.get("batch_stats", {})
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params_avals))
    eval_shape_s = time.time() - t0

    optimizer = build_optimizer(lr=1e-3, weight_decay=0.01, total_steps=100,
                                grad_clip=100.0,
                                frozen_patterns=() if unfrozen else ("da3",))
    opt_avals = jax.eval_shape(optimizer.init, params_avals)

    # attach the production shardings: TP layout on the ViT kernels,
    # replicated everywhere else
    p_shardings = da3_param_shardings(params_avals, mesh)

    def with_sharding(aval, s):
        return jax.ShapeDtypeStruct(aval.shape, aval.dtype, sharding=s)

    # AdamW moments (mu/nu inside the optax state) must be sharded LIKE
    # THEIR PARAMETERS or the replicated copies blow the per-device HBM
    # budget in the unfrozen regime (2x 6.6 GB of f32 moments). The optax
    # state embeds the params tree, so a moment leaf's path SUFFIX equals
    # its parameter's path: match on that (plus shape) and fall back to
    # replicated for everything else (counts, hyperparams).
    pflat = jax.tree_util.tree_flatten_with_path(p_shardings)[0]
    aflat = jax.tree_util.tree_flatten_with_path(params_avals)[0]
    by_path = {
        tuple(str(k) for k in path): (aval.shape, s)
        for (path, s), (_, aval) in zip(pflat, aflat)
    }

    def moment_sharding(path, aval):
        keys = tuple(str(k) for k in path)
        for i in range(len(keys)):
            hit = by_path.get(keys[i:])
            if hit is not None and hit[0] == aval.shape:
                return with_sharding(aval, hit[1])
        return with_sharding(aval, replicated(mesh))

    params_avals = jax.tree_util.tree_map(with_sharding, params_avals, p_shardings)
    opt_avals = jax.tree_util.tree_map_with_path(moment_sharding, opt_avals)
    stats_avals = jax.tree_util.tree_map(
        lambda a: with_sharding(a, replicated(mesh)), stats_avals)

    state_avals = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=replicated(mesh)),
        params=params_avals,
        batch_stats=stats_avals,
        opt_state=opt_avals,
    )

    step = make_train_step(model, optimizer)
    t0 = time.time()
    lowered = jax.jit(step, donate_argnums=(0,)).lower(state_avals, batch_avals)
    lower_s = time.time() - t0

    out = {
        "devices": int(np.prod(list(mesh.shape.values()))),
        "mesh": dict(mesh.shape),
        "batch": B,
        "params_M": round(n_params / 1e6, 1),
        "eval_shape_s": round(eval_shape_s, 1),
        "lower_s": round(lower_s, 1),
    }
    # exact per-device STATE bytes from the sharded avals: params + AdamW
    # moments + batch stats (+ gradients, which GSPMD shards like their
    # params, in the unfrozen regime). This is the irreducible resident
    # footprint the TPU scheduler cannot trade away.
    def sharded_bytes(tree):
        total = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            if not hasattr(leaf, "shape"):
                continue
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            s = getattr(leaf, "sharding", None)
            shards = 1
            if s is not None and s.spec is not None:
                for axes in s.spec:
                    if axes is None:
                        continue
                    for ax in (axes if isinstance(axes, tuple) else (axes,)):
                        shards *= mesh.shape[ax]
            total += n * leaf.dtype.itemsize // shards
        return total

    state_b = (sharded_bytes(params_avals) + sharded_bytes(opt_avals)
               + sharded_bytes(stats_avals))
    if unfrozen:
        state_b += sharded_bytes(params_avals)  # gradients
    out["state_bytes_per_device_MB"] = round(state_b / 2**20, 1)
    assert state_b / 2**20 < HBM_BUDGET_MB, (
        f"per-device state {state_b/2**20:.0f} MB exceeds the "
        f"{HBM_BUDGET_MB} MB v5e budget — the sharding plan itself is wrong"
    )

    if compile_step:
        t0 = time.time()
        compiled = lowered.compile()
        out["compile_s"] = round(time.time() - t0, 1)
        try:
            ma = compiled.memory_analysis()
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    out[k.replace("_in_bytes", "_MB")] = round(v / 2**20, 1)
            # per-device peak with the state donated: outputs alias the
            # argument buffers, so live memory ~= arguments + temporaries
            peak = out.get("argument_size_MB", 0) + out.get("temp_size_MB", 0)
            out["peak_donated_MB"] = round(peak, 1)
            if not unfrozen:
                out["fits_v5e"] = bool(peak < HBM_BUDGET_MB)
                assert out["fits_v5e"], (
                    f"per-device peak {peak:.0f} MB exceeds the "
                    f"{HBM_BUDGET_MB} MB v5e budget (HBM {V5E_HBM_MB} MB)"
                )
            else:
                # The CPU backend cannot certify BACKWARD peaks: its
                # scheduler does not minimize liveness and its attention
                # path materializes (N, N) score matrices that the TPU's
                # Pallas flash VJP never allocates (O(N) residuals).
                # Control experiment: the da3-large unfrozen step PROVEN
                # to run on one 16 GB v5e (588 ms/step, round 3) reports
                # a 53 GB "peak" under this same analysis. Record the
                # number, gate only on the state accounting above.
                out["cpu_backward_peak_caveat"] = (
                    "CPU-scheduler liveness + XLA-attention temps; "
                    "chip-proven 16 GB da3-large unfrozen reports 53 GB "
                    "under this analysis"
                )
        except AssertionError:
            raise
        except Exception as e:  # memory analysis is backend-best-effort
            out["memory_analysis"] = f"unavailable: {e}"
    return out


def main():
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax

    from recondet3d.parallel import make_mesh

    n = len(jax.devices())
    tp = 2 if n % 2 == 0 and n >= 4 else 1
    mesh = make_mesh(jax.devices(), data=n // tp, model=tp)
    info = flagship_lowering(mesh, compile_step="--no-compile" not in sys.argv,
                             unfrozen="--unfrozen" in sys.argv)
    print("flagship_multichip:", info)


if __name__ == "__main__":
    main()
