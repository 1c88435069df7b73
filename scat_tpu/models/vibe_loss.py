"""VIBE-style temporal/adversarial losses for the video stage.

Reference models/loss.py:65-356 (``VIBELoss``): 2D L1 + 3D MSE keypoint
terms, MANO pose/shape MSE, temporal smoothness, and LSGAN/Wasserstein
adversarial terms against the motion discriminator.  Theta layout:
``[:, :3]`` camera, ``[3:51]`` pose, ``[51:]`` shape
(reference loss.py:169-170,193-194).  Not wired into the shipped
reference train.py — belongs to the temporal/video training stage
(BASELINE config 5); here it is a first-class module.

Static-shape adaptation: the reference boolean-indexes valid samples
(loss.py:149-152); here ``w_3d``/``w_smpl`` weight the means instead.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

POSE_SLICE = slice(3, 51)
SHAPE_SLICE = slice(51, None)


def _wmean(x: jax.Array, w: Optional[jax.Array]) -> jax.Array:
    """Mean over elements of rows weighted by w (w=None -> plain mean)."""
    if w is None:
        return x.mean()
    w = w.reshape(w.shape + (1,) * (x.ndim - w.ndim)).astype(x.dtype)
    denom = jnp.maximum(jnp.broadcast_to(w, x.shape).sum(), 1.0)
    return jnp.sum(x * w) / denom


def keypoint_loss_2d(pred: jax.Array, real: jax.Array,
                     w: Optional[jax.Array] = None) -> jax.Array:
    """L1 (the frankmocap-style choice, reference loss.py:230)."""
    return _wmean(jnp.abs(pred - real), w)


def keypoint_loss_3d(pred: jax.Array, real: jax.Array,
                     w: Optional[jax.Array] = None) -> jax.Array:
    """MSE (reference loss.py:233-253)."""
    return _wmean((pred - real) ** 2, w)


def mano_losses(pred_pose, pred_shape, gt_pose, gt_shape,
                w: Optional[jax.Array] = None):
    """Pose/shape parameter MSE (reference loss.py:270-273)."""
    return (_wmean((pred_pose - gt_pose) ** 2, w),
            _wmean((pred_shape - gt_shape) ** 2, w))


def batch_smooth_pose_loss(pred_theta: jax.Array) -> jax.Array:
    """reference loss.py:275-284: |mean(pose diff)| + 10 |mean(rot diff)|
    over the time axis of [B, T, 48]."""
    rot_diff = pred_theta[:, 1:, :3] - pred_theta[:, :-1, :3]
    pose_diff = pred_theta[:, 1:, 3:] - pred_theta[:, :-1, 3:]
    return jnp.abs(jnp.mean(pose_diff)) + jnp.abs(jnp.mean(rot_diff)) * 10


def batch_smooth_shape_loss(pred_shape: jax.Array) -> jax.Array:
    """reference loss.py:287-295."""
    return jnp.abs(jnp.mean(pred_shape[:, 1:] - pred_shape[:, :-1]))


def batch_smooth_joints_loss(joints: jax.Array) -> jax.Array:
    """MSE of consecutive-frame joints [B, T, J, D]
    (reference loss.py:297-314)."""
    return jnp.mean((joints[:, 1:] - joints[:, :-1]) ** 2)


# LSGAN terms (reference loss.py:316-333)
def encoder_disc_l2_loss(disc_value: jax.Array) -> jax.Array:
    return jnp.sum((disc_value - 1.0) ** 2) / disc_value.shape[0]


def adv_disc_l2_loss(real_disc_value: jax.Array, fake_disc_value: jax.Array
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    la = jnp.sum((real_disc_value - 1.0) ** 2) / real_disc_value.shape[0]
    lb = jnp.sum(fake_disc_value ** 2) / fake_disc_value.shape[0]
    return la, lb, la + lb


# Wasserstein terms (reference loss.py:336-356)
def encoder_disc_wasserstein_loss(disc_value: jax.Array) -> jax.Array:
    return -jnp.sum(disc_value) / disc_value.shape[0]


def adv_disc_wasserstein_loss(real_disc_value, fake_disc_value):
    la = -jnp.sum(real_disc_value) / real_disc_value.shape[0]
    lb = jnp.sum(fake_disc_value) / fake_disc_value.shape[0]
    return la, lb, la + lb


class VIBELossConfig(NamedTuple):
    e_loss_weight: float = 60.0
    e_3d_loss_weight: float = 30.0
    e_pose_loss_weight: float = 1.0
    e_shape_loss_weight: float = 0.001
    d_motion_loss_weight: float = 1.0
    use_smooth: bool = False


def vibe_generator_loss(cfg: VIBELossConfig,
                        pred_theta: jax.Array,    # [B, T, 61]
                        pred_j2d: jax.Array,      # [B, T, 21, 2]
                        pred_j3d: jax.Array,      # [B, T, 21, 3]
                        real_2d: jax.Array, real_3d: jax.Array,
                        gt_theta: jax.Array,
                        w_3d: Optional[jax.Array] = None,
                        w_smpl: Optional[jax.Array] = None,
                        disc_fake_value: Optional[jax.Array] = None
                        ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Generator-side total (reference loss.py:90-218, minus the
    data-plumbing; sequences stay [B, T, ...] and are flattened here)."""
    reduce = lambda x: x.reshape((-1,) + x.shape[2:])  # noqa: E731
    loss_dict: Dict[str, jax.Array] = {}
    if cfg.use_smooth:
        loss_dict["smooth_pose_loss"] = (
            batch_smooth_pose_loss(pred_theta[:, :, POSE_SLICE])
            * cfg.e_pose_loss_weight * 10)
        loss_dict["smooth_shape_loss"] = (
            batch_smooth_shape_loss(pred_theta[:, :, SHAPE_SLICE])
            * cfg.e_shape_loss_weight * 100)

    flat_theta = reduce(pred_theta)
    loss_dict["loss_kp_2d"] = keypoint_loss_2d(
        reduce(pred_j2d), reduce(real_2d)) * cfg.e_loss_weight
    loss_dict["loss_kp_3d"] = keypoint_loss_3d(
        reduce(pred_j3d), reduce(real_3d),
        None if w_3d is None else w_3d.reshape(-1)) * cfg.e_3d_loss_weight

    gt_flat = reduce(gt_theta)
    w = None if w_smpl is None else w_smpl.reshape(-1)
    loss_pose, loss_shape = mano_losses(
        flat_theta[:, POSE_SLICE], flat_theta[:, SHAPE_SLICE],
        gt_flat[:, POSE_SLICE],
        jnp.zeros_like(flat_theta[:, SHAPE_SLICE]), w)  # ref loss.py:171
    loss_dict["loss_pose"] = loss_pose * cfg.e_pose_loss_weight
    loss_dict["loss_shape"] = loss_shape * cfg.e_shape_loss_weight

    gen_loss = sum(loss_dict.values())
    if disc_fake_value is not None:
        e_disc = (encoder_disc_l2_loss(disc_fake_value)
                  * cfg.d_motion_loss_weight)
        loss_dict["e_m_disc_loss"] = e_disc
        gen_loss = gen_loss + e_disc
    return gen_loss, loss_dict


def vibe_discriminator_loss(cfg: VIBELossConfig,
                            real_disc_value: jax.Array,
                            fake_disc_value: jax.Array):
    """Discriminator-side LSGAN total (reference loss.py:200-216)."""
    la, lb, total = adv_disc_l2_loss(real_disc_value, fake_disc_value)
    return (la * cfg.d_motion_loss_weight, lb * cfg.d_motion_loss_weight,
            total * cfg.d_motion_loss_weight)
