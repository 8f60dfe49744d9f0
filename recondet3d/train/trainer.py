"""Training loop: pjit data-parallel train step, metrics, checkpoints.

Replaces the reference's mmcv EpochBasedRunner + DDP stack
(reference: mmdetection3d/mmdet3d/apis/train.py:6 -> mmdet train_detector
-> mmcv Runner; scatter/DDP wrappers in tools/train_mmdet3d.py:37-65,
199-206). The TPU shape: one jitted ``train_step`` over a named mesh —
the batch is sharded on the 'data' axis, XLA inserts the gradient psums
(replacing NCCL allreduce), and batch-norm statistics are computed on the
global batch (subsuming NaiveSyncBatchNorm, mmdet3d/ops/norm.py).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from recondet3d.parallel.mesh import DATA_AXIS, make_mesh, shard_batch
from recondet3d.train.optim import build_optimizer

__all__ = ["TrainState", "Trainer", "make_train_step"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_train_step(model, optimizer, loss_keys: Optional[list] = None):
    """Returns train_step(state, batch) -> (state, metrics).

    ``model.apply`` must accept (variables, **batch, return_loss=True,
    train=True) and return (losses, aux)."""

    def loss_fn(params, batch_stats, batch):
        (losses, _), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            return_loss=True,
            train=True,
            mutable=["batch_stats"],
            **batch,
        )
        total = sum(losses.values())
        return total, (losses, mutated["batch_stats"])

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": total, "grad_norm": gnorm, **losses}
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
            ),
            metrics,
        )

    return train_step


@dataclasses.dataclass
class Trainer:
    """Minimal runner: jit the step over a mesh, drive epochs, log, checkpoint."""

    model: Any
    total_steps: int
    lr: float = 1e-3
    weight_decay: float = 0.01
    grad_clip: float = 100.0
    mesh: Any = None
    work_dir: Optional[str] = None
    log_interval: int = 1
    checkpoint_interval: Optional[int] = None  # steps
    hooks: tuple = ()
    # param subtrees excluded from the optimizer (reference freezes the DA3
    # backbone); () trains everything — fine-tuning mode, which is also what
    # routes gradients through the Pallas flash-attention backward
    frozen_patterns: tuple = ("da3",)

    def __post_init__(self):
        self.mesh = self.mesh or make_mesh()
        self.optimizer = build_optimizer(
            lr=self.lr, weight_decay=self.weight_decay,
            total_steps=self.total_steps, grad_clip=self.grad_clip,
            frozen_patterns=self.frozen_patterns,
        )
        self._step_fn = None
        self._writer = None

    def init_state(self, rng, example_batch) -> TrainState:
        # jit the init: eager flax init dispatches thousands of tiny ops
        # (minutes over a tunneled backend); one compiled program instead
        init_fn = jax.jit(
            lambda r, b: self.model.init(r, return_loss=True, train=False, **b)
        )
        variables = init_fn(rng, example_batch)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # tensor-parallel parameter layout over the 'model' axis (no-op on a
        # data-only mesh); optimizer moments inherit the layout via
        # zeros_like
        from recondet3d.parallel.tp import shard_params

        params = shard_params(params, self.mesh)
        opt_state = self.optimizer.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=batch_stats, opt_state=opt_state,
        )

    def compile(self):
        step = make_train_step(self.model, self.optimizer)
        # shardings are carried by the arguments (params laid out by
        # init_state, batch by shard_batch); GSPMD propagates the rest and
        # inserts the gradient psums / TP all-reduces
        self._step_fn = jax.jit(step, donate_argnums=(0,))
        return self._step_fn

    def run(self, state: TrainState, data_iter, max_steps: Optional[int] = None,
            log_fn: Callable[[int, Dict], None] = None):
        if self._step_fn is None:
            self.compile()
        writer = self._get_writer()
        n = max_steps or self.total_steps
        t0 = time.time()
        history = []
        for i, batch in enumerate(data_iter):
            if i >= n:
                break
            batch = shard_batch(self.mesh, batch)
            state, metrics = self._step_fn(state, batch)
            if (i + 1) % self.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["steps_per_sec"] = (i + 1) / (time.time() - t0)
                history.append(m)
                if writer is not None:
                    for k, v in m.items():
                        writer.add_scalar(f"train/{k}", v, int(state.step))
                if log_fn:
                    log_fn(int(state.step), m)
            for hook in self.hooks:
                hook(int(state.step), state, metrics)
            if self.checkpoint_interval and (i + 1) % self.checkpoint_interval == 0:
                self.save_checkpoint(state)
        return state, history

    def save_checkpoint(self, state: TrainState):
        if self.work_dir is None:
            return
        from recondet3d.train.checkpoints import save_checkpoint

        save_checkpoint(self.work_dir, state)

    def _get_writer(self):
        if self.work_dir is None:
            return None
        if self._writer is None:
            try:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(self.work_dir)
            except ImportError:
                self._writer = None
        return self._writer
