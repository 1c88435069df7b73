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
                   b1: float = 0.9, b2: float = 0.999,
                   freeze_backbone: bool = False
                   ) -> optax.GradientTransformation:
    """Adam with the reference warmup (torch Adam defaults, train.py:60).

    ``freeze_backbone`` implements the reference's declared-but-unwired
    ``--freeze`` flag (config.py:45): parameters under ``main_encoder``
    receive zero updates (heads/transformer still train).
    """
    tx = optax.adam(
        warmup_schedule(base_lr, steps_per_epoch, warmup_epochs),
        b1=b1, b2=b2, eps=1e-8)
    if not freeze_backbone:
        return tx

    def label_fn(params):
        import jax
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        labels = {}

        def build(tree, prefix=()):
            if isinstance(tree, dict):
                return {k: build(v, prefix + (k,))
                        for k, v in tree.items()}
            return ("frozen" if "main_encoder" in prefix else "train")

        return build(params)

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label_fn)
