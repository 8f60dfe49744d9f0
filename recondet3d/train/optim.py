"""Optimizer + cyclic schedules.

Re-implementation of the reference training optimization
(reference: projects/configs/ResDet3D_nuscenes_mini_config.py:356-375 —
AdamW lr 1e-3 wd 0.01, grad clip L2 100, mmcv cyclic LR
target_ratio=(10, 1e-4) step_ratio_up=0.4 with cosine annealing, cyclic
momentum target_ratio=(0.8947.., 1)). In optax the momentum cycle is a
schedule on adamw's b1 via inject_hyperparams.
"""

from __future__ import annotations

import math
from typing import Optional

import optax

__all__ = ["cyclic_schedule", "build_optimizer"]


def cyclic_schedule(base: float, total_steps: int, target_ratio=(10.0, 1e-4),
                    step_ratio_up: float = 0.4, anneal: str = "cos"):
    """mmcv CyclicLrUpdater (by_epoch=False, cyclic_times=1): value goes
    base -> base*ratio[0] over the up phase, then -> base*ratio[1]."""
    up_steps = int(total_steps * step_ratio_up)

    def cos_anneal(start, end, pct):
        return end + (start - end) * (1 + math.cos(math.pi * pct)) / 2

    def lin_anneal(start, end, pct):
        return start + (end - start) * pct

    fn = cos_anneal if anneal == "cos" else lin_anneal

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.minimum(step, total_steps - 1)
        pct_up = jnp.clip(step / max(up_steps, 1), 0.0, 1.0)
        pct_down = jnp.clip(
            (step - up_steps) / max(total_steps - up_steps, 1), 0.0, 1.0
        )
        hi = base * target_ratio[0]
        lo = base * target_ratio[1]
        # cosine anneal in jnp form
        up = hi + (base - hi) * (1 + jnp.cos(jnp.pi * pct_up)) / 2
        down = lo + (hi - lo) * (1 + jnp.cos(jnp.pi * pct_down)) / 2
        return jnp.where(step < up_steps, up, down)

    return schedule


def build_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 0.01,
    total_steps: int = 1000,
    grad_clip: Optional[float] = 100.0,
    cyclic_lr: bool = True,
    cyclic_momentum: bool = True,
    momentum_target_ratio=(0.8947368421052632, 1.0),
    base_momentum: float = 0.9,
    frozen_patterns=("da3",),
):
    """frozen_patterns: param subtrees whose path contains any of these
    names are excluded from the optimizer entirely (no updates, no moment
    buffers — the reference freezes the DA3 backbone, freeze_da3=True in
    ResDet3D_nuscenes_mini_config.py; gradients are already stopped, this
    avoids ~3x the backbone's size in dead AdamW state)."""
    lr_sched = cyclic_schedule(lr, total_steps) if cyclic_lr else lr
    if cyclic_momentum:
        b1_sched = cyclic_schedule(
            base_momentum, total_steps, target_ratio=momentum_target_ratio
        )
    else:
        b1_sched = base_momentum

    opt = optax.inject_hyperparams(
        lambda learning_rate, b1: optax.adamw(
            learning_rate=learning_rate, b1=b1, weight_decay=weight_decay
        )
    )(learning_rate=lr_sched, b1=b1_sched)

    if frozen_patterns:
        import jax

        def trainable_mask(params):
            def one(path, _):
                names = {str(k.key) for k in path}
                return not any(p in names for p in frozen_patterns)

            return jax.tree_util.tree_map_with_path(one, params)

        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", trainable_mask(params)
            ),
        )

    if grad_clip is not None:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt
