"""Training loop tests: cyclic schedules vs the mmcv contract, a few real
optimization steps on the tiny ResDet3D (loss decreases), data-parallel
sharding over the 8-device CPU mesh, checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recondet3d.models.da3 import build_da3
from recondet3d.models.detect import ReconstructionBackbone, ResDet3D
from recondet3d.models.refine import SparseRefinement
from recondet3d.parallel import make_mesh
from recondet3d.train import Trainer, cyclic_schedule


def test_cyclic_schedule_shape():
    s = cyclic_schedule(1e-3, 100, target_ratio=(10, 1e-4), step_ratio_up=0.4)
    v0 = float(s(0))
    v_up = float(s(40))
    v_end = float(s(99))
    assert abs(v0 - 1e-3) < 1e-9
    assert abs(v_up - 1e-2) < 1e-4  # peak = base * 10
    assert v_end < 1e-5  # anneals toward base * 1e-4
    # monotone up then down
    vals = [float(s(i)) for i in range(100)]
    assert np.argmax(vals) in range(38, 43)


def _tiny_model():
    da3 = build_da3("da3-small", dtype=jnp.float32, attn_impl="xla")
    refinement = SparseRefinement(
        point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
        voxel_size=(0.1, 0.1, 0.1), max_voxels=1024,
        occ_feature_shape=(20, 20, 8), occ_max_voxels=512,
        sparse_shape=(40, 160, 160), unet_channels=(32, 48, 64, 96),
        stage_caps=(1024, 512, 384, 256), encoder_out_channels=16,
    )
    backbone = ReconstructionBackbone(
        da3=da3, refinement=refinement, process_res=56,
        filter_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 2.0),
        bq_anchor_points=128, num_points=256, max_depth=20.0,
    )
    return ResDet3D(reconstruction_backbone=backbone)


def _batch(rng, B=2):
    img = rng.uniform(0, 255, (B, 2, 56, 84, 3)).astype(np.float32)
    c2l = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 2, 4, 4)).copy()
    gt = rng.uniform(-7, 7, (B, 300, 3)).astype(np.float32)
    gt[..., 2] = rng.uniform(-1.8, 1.8, (B, 300))
    return dict(img=img, cam2lidar_rts=c2l, gt_points=gt)


def test_tp_param_shardings():
    import jax.numpy as jnp

    from recondet3d.models.da3.vit import DinoViT
    from recondet3d.parallel.tp import shard_params

    mesh = make_mesh(data=4, model=2)
    vit = DinoViT(name_preset="vits", out_layers=(5, 7, 9, 11),
                  dtype=jnp.float32, attn_impl="xla")
    params = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 28, 28, 3)))
    sharded = shard_params(params, mesh)
    qkv = sharded["params"]["blocks_0"]["attn"]["qkv"]["kernel"]
    proj = sharded["params"]["blocks_0"]["attn"]["proj"]["kernel"]
    pe = sharded["params"]["pos_embed"]
    # column-parallel qkv: output dim split over 'model'
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    assert proj.sharding.spec == jax.sharding.PartitionSpec("model", None)
    assert pe.sharding.spec == jax.sharding.PartitionSpec()
    # the math still matches the replicated forward
    x = jnp.ones((1, 1, 28, 28, 3))
    with mesh:
        out_sharded, _ = jax.jit(lambda p, x: vit.apply(p, x))(sharded, x)
    out_ref, _ = vit.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_sharded[0][0]), np.asarray(out_ref[0][0]), atol=2e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_train_steps_decrease_loss(tmp_path):
    model = _tiny_model()
    mesh = make_mesh()  # 8 virtual CPU devices -> data-parallel over 8
    trainer = Trainer(
        model=model, total_steps=8, lr=2e-3, mesh=mesh,
        work_dir=str(tmp_path), checkpoint_interval=None,
    )
    rng = np.random.default_rng(0)
    batch = _batch(rng, B=8)  # divisible by 8 devices
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, history = trainer.run(state, iter([batch] * 8))
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # fitting a fixed batch must reduce loss
    assert int(state.step) == 8

    # checkpoint round-trip
    from recondet3d.train import latest_checkpoint, load_checkpoint, save_checkpoint

    save_checkpoint(str(tmp_path), state)
    path = latest_checkpoint(str(tmp_path))
    restored = load_checkpoint(path, target=jax.device_get(state))
    assert int(restored.step) == 8
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    r0 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(r0))


@pytest.mark.slow
def test_checkpoint_across_topologies(tmp_path):
    """Orbax checkpoints are topology-free: save from a dp4 x tp2 run,
    restore bitwise-identically onto dp8 x tp1 and onto a single device,
    and keep training after the reshard (VERDICT r2 ask #9; reference
    role: mmcv checkpoint/resume under the TPU sharding model)."""
    from recondet3d.train import latest_checkpoint, load_checkpoint, save_checkpoint

    model = _tiny_model()
    rng = np.random.default_rng(1)
    batch = _batch(rng, B=8)

    mesh_a = make_mesh(data=4, model=2)
    trainer_a = Trainer(
        model=model, total_steps=3, lr=2e-3, mesh=mesh_a,
        work_dir=str(tmp_path), checkpoint_interval=None,
    )
    state = trainer_a.init_state(jax.random.PRNGKey(0), batch)
    state, _ = trainer_a.run(state, iter([batch] * 3))
    save_checkpoint(str(tmp_path), state)
    path = latest_checkpoint(str(tmp_path))
    host_params = jax.device_get(state.params)
    del state, trainer_a

    for data, model_ax in ((8, 1), (1, 1)):
        devs = jax.devices()[: data * model_ax]
        mesh_b = make_mesh(devices=devs, data=data, model=model_ax)
        trainer_b = Trainer(
            model=model, total_steps=3, lr=2e-3, mesh=mesh_b,
            work_dir=None, checkpoint_interval=None,
        )
        target = trainer_b.init_state(jax.random.PRNGKey(7), batch)
        restored = load_checkpoint(path, target=jax.device_get(target))
        assert int(restored.step) == 3
        # re-place the host pytree with the NEW topology's layout
        from recondet3d.parallel.tp import shard_params

        resharded = target.replace(
            step=jnp.asarray(restored.step),
            params=shard_params(restored.params, mesh_b),
            batch_stats=jax.device_put(restored.batch_stats),
            opt_state=jax.device_put(restored.opt_state),
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            jax.device_get(resharded.params), host_params,
        )
        # the resharded state must still train
        b2 = {k: v[: data * model_ax] if k != "img" else v[: data * model_ax]
              for k, v in _batch(rng, B=max(8, data * model_ax)).items()}
        state2, hist = trainer_b.run(resharded, iter([b2]))
        assert int(state2.step) == 4
        assert np.isfinite(hist[0]["loss"])


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    """Two OS processes join one jax.distributed job (CPU backend, 2
    forced-host devices each), build a single global 4-device mesh, and
    run one real Trainer step with the batch sharded across the process
    boundary — the multi-host analog of the reference's torchrun/srun
    launchers (tools/dist_train.sh, train_mmdet3d.py:199-206), with the
    process group replaced by the global mesh + GSPMD collectives."""
    import socket
    import subprocess
    import sys as _sys

    # free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coordinator = f"127.0.0.1:{port}"

    import os as _os

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    script = _os.path.join(repo, "scripts", "dist_smoke.py")
    env = {k: v for k, v in _os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [_sys.executable, script, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"dist_smoke proc {pid}/2" in out, out
        assert "global_devices=4" in out, out
    # single-controller contract: both processes computed the same loss
    losses = [o.split("loss=")[1].split()[0] for o in outs]
    assert losses[0] == losses[1], outs


@pytest.mark.slow
def test_remat_policies_equivalent():
    """'block' / 'global' / 'attn' remat policies change only what is
    saved vs recomputed — loss and gradients must match bitwise-ish
    (f32 accumulation noise only) across policies."""
    from recondet3d.models.da3.vit import DinoViT

    x = np.random.default_rng(0).uniform(
        0, 1, (1, 3, 56, 56, 3)).astype(np.float32)
    outs = {}
    for pol in ("block", "global", "attn"):
        m = DinoViT(name_preset="vits", out_layers=(3, 5), alt_start=2,
                    rope_start=2, remat=True, remat_policy=pol)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))

        def loss(params):
            feats = m.apply({"params": params["params"]}, jnp.asarray(x))
            return sum(jnp.sum(t.astype(jnp.float32) ** 2)
                       for t in jax.tree_util.tree_leaves(feats))

        l, g = jax.jit(jax.value_and_grad(loss))(v)
        gn = sum(float(jnp.sum(jnp.abs(t)))
                 for t in jax.tree_util.tree_leaves(g))
        outs[pol] = (float(l), gn)
    ref = outs["block"]
    for pol, (l, gn) in outs.items():
        assert abs(l - ref[0]) < 1e-3 * abs(ref[0]), (pol, outs)
        assert abs(gn - ref[1]) < 1e-3 * abs(ref[1]), (pol, outs)
