"""Optimizers and LR schedules via optax.

Mirrors the reference's trainer setup
(/root/reference/training/trainer.py:146-199): Adam / AdamW / Lamb, with
MultiStepLR / CosineAnnealingLR / ExponentialLR, all behind a linear
epoch-wise warmup (min factor 1e-3, trainer.py:195-198). The reference
steps its schedulers per epoch; we evaluate the same piecewise schedule
per optimizer step given steps_per_epoch.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import optax


def lr_schedule(base_lr: float, steps_per_epoch: int, epochs: int,
                scheduler: str = "MultiStepLR",
                milestones: Sequence[int] = (),
                gamma: float = 0.1, min_lr: float = 0.0,
                warmup_epochs: Optional[int] = None):
    """Returns an optax schedule step -> lr.

    Epoch-granular to match torch scheduler.step()-per-epoch semantics;
    the post-warmup scheduler counts epochs from the end of warmup
    (torch SequentialLR behaviour, trainer.py:192-193).
    """
    spe = max(1, steps_per_epoch)
    wu = warmup_epochs or 0

    def schedule(step):
        epoch = step // spe
        e = jnp.asarray(epoch, jnp.float32)
        if scheduler == "MultiStepLR":
            ms = jnp.asarray(list(milestones) if milestones else [epochs + 1],
                             jnp.float32)
            n_passed = jnp.sum((e - wu) >= ms)
            main = base_lr * gamma ** n_passed
        elif scheduler == "CosineAnnealingLR":
            t_max = epochs + 1
            main = min_lr + 0.5 * (base_lr - min_lr) * (
                1 + jnp.cos(jnp.pi * jnp.minimum(e - wu, t_max) / t_max))
        elif scheduler == "ExponentialLR":
            main = base_lr * gamma ** jnp.maximum(e - wu, 0)
        elif scheduler in (None, "none", "constant"):
            main = jnp.asarray(base_lr)
        else:
            raise NotImplementedError(f"Unsupported LR scheduler: {scheduler}")
        if wu > 0:
            warm = base_lr * jnp.maximum(e / wu, 1e-3)
            return jnp.where(e < wu, warm, main)
        return main

    return schedule


def make_optimizer(optimizer: str, schedule, weight_decay: float = 0.0):
    """Adam (L2-coupled like torch), AdamW (decoupled), or Lamb."""
    optimizer = optimizer.lower()
    wd = weight_decay or 0.0
    if optimizer == "adam":
        # torch Adam applies weight decay to the gradient *before* the
        # moment updates -> add_decayed_weights first.
        parts = []
        if wd > 0:
            parts.append(optax.add_decayed_weights(wd))
        parts += [optax.scale_by_adam(),
                  optax.scale_by_learning_rate(schedule)]
        return optax.chain(*parts)
    if optimizer == "adamw":
        return optax.adamw(schedule, weight_decay=wd)
    if optimizer == "lamb":
        return optax.lamb(schedule, weight_decay=wd)
    raise NotImplementedError(f"Unsupported optimizer: {optimizer}")
