"""Train state: params + optimizer + BatchNorm stats + PL-EMA + PRNG.

Replaces the reference's implicit torch module/optimizer state
(reference train.py:53-75) with one explicit pytree, so a checkpoint
captures everything (params, opt state, BN running stats, PL-reg EMA,
PRNG position, step) — the reference saved only ``net.state_dict()``
(train.py:237-246).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    pl_mean: jax.Array
    rng: jax.Array
    # Frozen (non-trained, non-optimized) variables — ViP's FAVOR+
    # Gaussian projection lives in flax's "constants" collection
    # (reference vision_performer.py: requires_grad=False buffer).  It
    # rides in the state so checkpoints capture it: the projection is
    # drawn from the *init* PRNG, and an evaluator re-initializing with
    # a different seed would otherwise silently decode with the wrong
    # feature map.
    constants: Any = flax.struct.field(default_factory=dict)

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation,
               rng: jax.Array, constants: Any = None) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            pl_mean=jnp.zeros(()),
            rng=rng,
            constants={} if constants is None else constants,
        )
