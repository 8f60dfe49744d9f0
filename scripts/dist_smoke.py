#!/usr/bin/env python
"""Multi-process distributed training smoke worker.

Proves ``parallel/distributed.py`` is more than an initialize wrapper:
N OS processes (each with 2 forced-host CPU devices) join one
``jax.distributed`` job, build ONE global ('data','model') mesh over all
2N devices, and run a real Trainer step — the batch is globally sharded
over the data axis, gradient psums cross the process boundary through
XLA's collectives, and every process reports the same loss.

This is the TPU-native analog of the reference's torchrun/srun launchers
(reference: tools/dist_train.sh:1-10, train_mmdet3d.py:199-206 — mmcv
init_dist + MMDistributedDataParallel): same one-program-per-process
contract, but the process group / NCCL backend is replaced by the global
mesh and GSPMD.

Usage (one per process):
  python scripts/dist_smoke.py <coordinator host:port> <num_procs> <proc_id>

Exercised end-to-end by tests/test_training.py::test_two_process_mesh.
"""

import os
import sys

# must be set before jax import; 2 local devices per process
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_xf = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _xf:
    os.environ["XLA_FLAGS"] = (
        _xf + " --xla_force_host_platform_device_count=2"
    ).strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    # the preinstalled TPU plugin ignores JAX_PLATFORMS; force the cpu
    # backend through the config BEFORE any device/distributed init, or
    # both workers attach to the one real chip as 1-process jobs
    jax.config.update("jax_platforms", "cpu")

    from recondet3d.parallel.distributed import (
        init_distributed,
        is_distributed,
        process_info,
    )

    init_distributed(coordinator, num_processes=nprocs, process_id=pid)

    import jax
    import numpy as np

    info = process_info()
    assert info["process_count"] == nprocs, info
    assert is_distributed() == (nprocs > 1)
    n_global = info["global_device_count"]
    assert n_global == nprocs * info["local_device_count"], info

    from __graft_entry__ import _example_batch, _tiny_pipeline
    from recondet3d.parallel import make_mesh
    from recondet3d.train import Trainer

    model = _tiny_pipeline()
    mesh = make_mesh()  # ALL global devices -> dp over both processes
    trainer = Trainer(model=model, total_steps=2, lr=1e-3, mesh=mesh)

    # one scene per global device; every process holds the same global
    # batch (single-controller semantics: device_put writes only the
    # addressable shards)
    img, c2l, gt = _example_batch(B=n_global)
    batch = dict(img=img, cam2lidar_rts=c2l, gt_points=gt)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, history = trainer.run(state, iter([batch]), max_steps=1)
    assert int(state.step) == 1
    loss = float(history[-1]["loss"])
    assert np.isfinite(loss)
    print(
        f"dist_smoke proc {pid}/{nprocs}: loss={loss:.6f} "
        f"global_devices={n_global}",
        flush=True,
    )


if __name__ == "__main__":
    main()
