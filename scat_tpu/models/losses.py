"""Training losses.

Reference train.py:176-203: ``loss = w3d*MSE(pred_j3d, gt_j3d) +
w2d*L1(pred_j2d_px, gt_j2d_px) [+ 10*l_pl]`` with label-width dispatch —
105-wide labels (STB/MTC/RHD) carry 3D=[:63], 2D=[63:]; 166-wide labels
(FreiHAND/HO-3D) carry pose=[3:51], 3D=[61:124], 2D=[124:].

Static-shape adaptation: the reference drops empty samples by slicing the
batch (train.py:143-150); here a per-sample ``valid`` mask reweights the
means instead, keeping one XLA program for every batch.

Path-length regularization (reference train.py:178-183): the reference
re-initializes its EMA state every step (``pl_mean_var = 0.0`` inside the
loop) so the "EMA" collapses to ``0.01 * batch_mean``; reproduced when
``ema_reset_compat=True`` (default, matching shipped behavior), otherwise
a true EMA with threaded state.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


# the reference's fixed x10 PL-term weight (train.py:200-201); shared
# so the accumulation path's total-decomposition (training/steps.py)
# cannot drift from scat_loss's composition
PL_WEIGHT = 10.0


class LabelViews(NamedTuple):
    joints_3d: jax.Array  # [B, 63]
    joints_2d: jax.Array  # [B, 42]
    pose: Optional[jax.Array]  # [B, 48] for 166-wide labels


def split_labels(labels: jax.Array) -> LabelViews:
    """Label-width dispatch (reference train.py:188-196)."""
    width = labels.shape[1]
    if width == 105:
        return LabelViews(labels[:, :63], labels[:, 63:], None)
    elif width == 166:
        return LabelViews(labels[:, 61:124], labels[:, 124:],
                          labels[:, 3:51])
    raise ValueError(f"unsupported label width {width} (expected 105/166)")


def _masked_mean(x: jax.Array, valid: Optional[jax.Array]) -> jax.Array:
    """Mean over all elements, counting only rows where valid==1."""
    if valid is None:
        return x.mean()
    per_elem = x.shape[1] if x.ndim > 1 else 1
    w = valid.astype(x.dtype)
    return jnp.sum(x * w[:, None]) / jnp.maximum(w.sum() * per_elem, 1.0)


def keypoint_loss_3d(pred: jax.Array, gt: jax.Array,
                     valid: Optional[jax.Array] = None) -> jax.Array:
    """MSE over flattened [B,63] joints (reference train.py:191)."""
    return _masked_mean((pred - gt) ** 2, valid)


def keypoint_loss_2d(pred: jax.Array, gt: jax.Array,
                     valid: Optional[jax.Array] = None) -> jax.Array:
    """L1 over flattened [B,42] pixel joints (reference train.py:192)."""
    return _masked_mean(jnp.abs(pred - gt), valid)


def path_length_loss(pl_grad: jax.Array, pl_mean_state: jax.Array,
                     ema_reset_compat: bool = True, decay: float = 0.01
                     ) -> Tuple[jax.Array, jax.Array]:
    """(l_pl, new_pl_mean_state) from the PL probe gradient.

    ``pl_grad`` is the NHWC [B,28,28,21] gradient of the transformer
    output sum w.r.t. the 21-channel conv map; lengths follow reference
    train.py:179 — sum over spatial, mean over channels, sqrt.
    """
    pl_lengths = jnp.sqrt(
        jnp.sum(pl_grad.astype(jnp.float32) ** 2, axis=(1, 2)).mean(axis=1))
    if ema_reset_compat:
        pl_mean = decay * jnp.mean(pl_lengths)  # ref train.py:180-182
        new_state = pl_mean
    else:
        pl_mean = pl_mean_state + decay * (jnp.mean(pl_lengths)
                                           - pl_mean_state)
        new_state = jax.lax.stop_gradient(pl_mean)
    l_pl = jnp.mean((pl_lengths - pl_mean) ** 2)
    return l_pl, new_state


class LossBreakdown(NamedTuple):
    total: jax.Array
    l_3d: jax.Array
    l_2d: jax.Array
    l_pl: jax.Array


def scat_loss(pred_joints_3d: jax.Array, pred_joints_2d_px: jax.Array,
              labels: jax.Array, l_weight_3d: float, l_weight_2d: float,
              valid: Optional[jax.Array] = None,
              pl_grad: Optional[jax.Array] = None,
              pl_mean_state: Optional[jax.Array] = None,
              ema_reset_compat: bool = True,
              pl_weight: float = PL_WEIGHT
              ) -> Tuple[LossBreakdown, jax.Array]:
    """Full SCAT training loss (reference train.py:176-203).

    ``pred_joints_3d`` [B,63], ``pred_joints_2d_px`` [B,42] in pixels.
    Returns (breakdown, new_pl_mean_state).
    """
    views = split_labels(labels)
    l_3d = keypoint_loss_3d(pred_joints_3d, views.joints_3d, valid)
    l_2d = keypoint_loss_2d(pred_joints_2d_px, views.joints_2d, valid)
    if pl_grad is not None:
        if pl_mean_state is None:
            pl_mean_state = jnp.zeros(())
        l_pl, new_state = path_length_loss(pl_grad, pl_mean_state,
                                           ema_reset_compat)
    else:
        l_pl = jnp.zeros(())
        new_state = pl_mean_state if pl_mean_state is not None \
            else jnp.zeros(())
    total = (l_weight_3d * l_3d + l_weight_2d * l_2d + pl_weight * l_pl)
    return LossBreakdown(total, l_3d, l_2d, l_pl), new_state
