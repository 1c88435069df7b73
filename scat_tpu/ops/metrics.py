"""Evaluation metrics: MPJPE, PCK, AUC, acceleration.

Reference formulas:
  * PCK over 20-50mm thresholds — reference eval.py:300-316
    (including the ``dist.flat`` quirk: every per-joint column is actually
    the all-joint mean; reproduced behind ``flat_compat=True``)
  * AUC via trapezoid on normalized thresholds — reference eval.py:328-348
  * MPJPE — reference eval.py:1026-1027
  * acceleration / accel-error — reference data_utils/eval_utils.py:6-48

All functions are pure jnp with static shapes.  Instead of the reference's
dynamic "skip empty samples" filter (reference train.py:143-150), metrics
accept an optional per-sample ``valid`` mask ([B] in {0,1}) that excludes
samples without changing shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# PCK thresholds in millimeters, reference eval.py:806/963.
DEFAULT_PCK_RANGE_MM = tuple(range(20, 51, 5))


def joint_distances_mm(pred_joints: jax.Array, gt_joints: jax.Array
                       ) -> jax.Array:
    """Per-joint L2 distance in millimeters; inputs in meters ``[B,J,3]``."""
    d = (pred_joints * 1000.0 - gt_joints * 1000.0)
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def cal_pck(pred_joints: jax.Array, gt_joints: jax.Array,
            rnge=DEFAULT_PCK_RANGE_MM, flat_compat: bool = True,
            valid: Optional[jax.Array] = None) -> jax.Array:
    """PCK matrix ``[len(rnge), J+1]`` in percent.

    ``flat_compat=True`` reproduces reference eval.py:311-312 where
    ``np.mean(dist.flat <= r)`` makes every joint column the all-joint mean
    (the final column — mean of the per-joint columns — is then the same
    number).  With ``flat_compat=False`` the per-joint columns are true
    per-joint PCKs.
    """
    dist = joint_distances_mm(pred_joints, gt_joints)  # [B, J]
    B, J = dist.shape
    if valid is None:
        w = jnp.ones((B,), dtype=dist.dtype)
    else:
        w = valid.astype(dist.dtype)
    denom = jnp.maximum(w.sum(), 1.0)
    thresholds = jnp.asarray(rnge, dtype=dist.dtype)  # [T]
    hits = (dist[None, :, :] <= thresholds[:, None, None]).astype(dist.dtype)
    hits = hits * w[None, :, None]
    if flat_compat:
        overall = 100.0 * hits.sum(axis=(1, 2)) / (denom * J)  # [T]
        pck = jnp.broadcast_to(overall[:, None], (len(rnge), J + 1))
    else:
        per_joint = 100.0 * hits.sum(axis=1) / denom  # [T, J]
        mean_col = per_joint.mean(axis=1, keepdims=True)
        pck = jnp.concatenate([per_joint, mean_col], axis=1)
    return pck


def area_under_curve(xpts: jax.Array, ypts: jax.Array) -> jax.Array:
    """Normalized trapezoidal AUC (reference eval.py:328-348).

    Assumes ``xpts`` unique and sorted (true for the PCK threshold grid; the
    reference's np.unique dedup is an identity there).
    """
    xpts = jnp.asarray(xpts, dtype=jnp.float32)
    ypts = jnp.asarray(ypts, dtype=jnp.float32)
    norm = jnp.trapezoid(jnp.ones_like(xpts), xpts)
    return jnp.trapezoid(ypts, xpts) / norm


def mpjpe(pred_joints: jax.Array, gt_joints: jax.Array) -> jax.Array:
    """Per-sample mean per-joint position error in meters ``[B]``
    (multiply by 1000 for the reference's mm print, eval.py:1026/1050)."""
    d = pred_joints - gt_joints
    return jnp.sqrt(jnp.sum(d * d, axis=-1)).mean(axis=-1)


def pck_auc(pred_joints: jax.Array, gt_joints: jax.Array,
            rnge=DEFAULT_PCK_RANGE_MM, flat_compat: bool = True,
            valid: Optional[jax.Array] = None
            ) -> Tuple[jax.Array, jax.Array]:
    """Convenience: (pck matrix, AUC of the mean-PCK column)."""
    pck = cal_pck(pred_joints, gt_joints, rnge, flat_compat, valid)
    r = jnp.asarray(rnge, dtype=jnp.float32)
    auc = area_under_curve(r / r.max(), pck[:, -1])
    return pck, auc


def compute_accel(joints: jax.Array) -> jax.Array:
    """Mean joint acceleration magnitude per frame, ``[N,J,3] -> [N-2]``
    (reference data_utils/eval_utils.py:6-17)."""
    velocities = joints[1:] - joints[:-1]
    accel = velocities[1:] - velocities[:-1]
    return jnp.linalg.norm(accel, axis=2).mean(axis=1)


def compute_error_accel(joints_gt: jax.Array, joints_pred: jax.Array,
                        vis: Optional[jax.Array] = None) -> jax.Array:
    """Acceleration error vs GT, visibility-masked
    (reference data_utils/eval_utils.py:20-48).

    Unlike the reference (which boolean-indexes and changes shape), invisible
    frames contribute zero and a static-shape ``[N-2]`` array is returned;
    use :func:`accel_error_mean` for the masked mean.
    """
    accel_gt = joints_gt[:-2] - 2 * joints_gt[1:-1] + joints_gt[2:]
    accel_pred = joints_pred[:-2] - 2 * joints_pred[1:-1] + joints_pred[2:]
    normed = jnp.linalg.norm(accel_pred - accel_gt, axis=2).mean(axis=1)
    if vis is not None:
        mask = _accel_vis_mask(vis)
        normed = normed * mask
    return normed


def _accel_vis_mask(vis: jax.Array) -> jax.Array:
    """A window is valid only if frames i, i+1, i+2 are all visible
    (reference eval_utils.py:42-46)."""
    invis = jnp.logical_not(vis.astype(bool))
    new_invis = invis[:-2] | invis[1:-1] | invis[2:]
    return jnp.logical_not(new_invis).astype(jnp.float32)


def accel_error_mean(joints_gt: jax.Array, joints_pred: jax.Array,
                     vis: Optional[jax.Array] = None) -> jax.Array:
    # build the mask ONCE here (passing vis down would multiply by the
    # same mask a second time inside compute_error_accel)
    errs = compute_error_accel(joints_gt, joints_pred)
    if vis is None:
        return errs.mean()
    mask = _accel_vis_mask(vis)
    return (errs * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def valid_sample_mask(images: jax.Array, threshold: float = 2000.0
                      ) -> jax.Array:
    """Static-shape replacement for the reference's empty-crop filter.

    Reference train.py:143-150 drops batch items whose normalized pixel sum
    is within 2000 of +-224*224*3 (an all-white/all-black failed crop, given
    pixels in [-1,1]).  Returns a float ``[B]`` mask instead of slicing.
    """
    content = jnp.abs(jnp.sum(images, axis=(1, 2, 3)))
    full = float(images.shape[1] * images.shape[2] * images.shape[3])
    return (jnp.abs(content - full) > threshold).astype(jnp.float32)


def get_dist_pck(pred: jax.Array, gt: jax.Array,
                 norm_lm_ids=(4, 5)) -> jax.Array:
    """Reference-landmark-normalized joint distances, layout
    ``[1, J, B]`` like the reference (eval.py:274-298 ``_getDistPCK``):
    per-sample L2 distances divided by the gt distance between the two
    normalization landmarks."""
    ref = jnp.linalg.norm(gt[:, norm_lm_ids[0]] - gt[:, norm_lm_ids[1]],
                          axis=-1)                     # [B]
    dist = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1))  # [B, J]
    return (dist / ref[:, None]).T[None]
