"""Learning-rate schedule mirroring the reference optimizer stack.

Reference train.py:60-63: Adam(lr) + StepLR(step_size=10, gamma=1 — i.e.
no decay) wrapped in GradualWarmupScheduler(multiplier=1, total_epoch=15)
stepped once per epoch with ``epoch+1``: the lr ramps linearly
``base * (epoch+1)/15`` for the first 15 epochs, then stays at ``base``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_schedule(base_lr: float, steps_per_epoch: int,
                    warmup_epochs: int = 15) -> optax.Schedule:
    """Per-epoch staircase warmup: lr(step) = base * min(epoch+1, W)/W."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * jnp.minimum((epoch + 1.0) / warmup_epochs, 1.0)

    return schedule


def make_optimizer(base_lr: float, steps_per_epoch: int,
                   warmup_epochs: int = 15,
                   b1: float = 0.9, b2: float = 0.999
                   ) -> optax.GradientTransformation:
    """Adam with the reference warmup (torch Adam defaults, train.py:60)."""
    return optax.adam(
        warmup_schedule(base_lr, steps_per_epoch, warmup_epochs),
        b1=b1, b2=b2, eps=1e-8)
