"""Jitted train / eval steps — the whole reference hot loop as one XLA
program each.

Reference call stack being fused (train.py:136-209): empty-sample filter
-> H2D copy -> net forward -> weak-perspective projection -> 3D MSE +
2D L1 (+ PL reg) -> backward -> Adam step.  Here the filter is a validity
mask, the forward/backward/update trace into a single jit, and batches
arrive already on device.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from scat_tpu.models import losses as losses_lib
from scat_tpu.ops import metrics as metrics_lib
from scat_tpu.ops import procrustes
from scat_tpu.ops.geometry import batch_orth_proj_idrot, project_2d
from scat_tpu.training.state import TrainState


def predictions_to_keypoints(pred_params: jax.Array
                             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Split [B,66] -> (cam [B,3], joints3d [B,21,3], joints2d_px [B,21,2])
    (reference train.py:164-174)."""
    cam = pred_params[:, :3]
    j3d = pred_params[:, 3:66].reshape(-1, 21, 3)
    j2d = project_2d(batch_orth_proj_idrot(j3d, cam))
    return cam, j3d, j2d


def make_train_step(model, tx: optax.GradientTransformation,
                    l_weight_3d: float, l_weight_2d: float,
                    pl_reg: bool = False, ema_reset_compat: bool = True,
                    grad_accum: int = 1
                    ) -> Callable[[TrainState, Dict[str, jax.Array]],
                                  Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the fused train step for any encoder with the
    ``(pred, feat_visual[, pl_grad])`` output contract.

    ``grad_accum > 1`` runs the forward/backward over that many
    sequential microbatches (``lax.scan``) and applies ONE optimizer
    update — the standard memory lever for batch sizes whose
    activations don't fit HBM.  Each microbatch's KEYPOINT gradient is
    weighted by its share of the batch's valid samples, so that part of
    the accumulated gradient equals the full-batch valid-weighted loss
    gradient exactly (not just approximately).  The PL term is averaged
    1/A per microbatch instead (the non-accum path applies no valid
    weighting to it), and its batch statistic necessarily becomes
    per-microbatch: PL lengths are a within-forward population spread,
    so between-microbatch variance is not representable under
    accumulation — l_pl under accum measures spread around each
    microbatch's own (EMA'd) mean.  BN statistics and the PL-EMA
    thread through the microbatches sequentially (same semantics as
    torch grad accum).
    """

    def _loss_fn(params, batch_stats, pl_mean, constants, images,
                 labels, valid, mask_key, dropout_key, w_kp=None,
                 w_pl=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if constants:
            variables["constants"] = constants
        outputs, mutated = model.apply(
            variables, images, train=True,
            rngs={"mask": mask_key, "dropout": dropout_key},
            mutable=["batch_stats"])
        # Output contracts: (pred, fmap[, attn][, pl_grad]) — the
        # coarse head inserts attn (reference hand_net.py:306-311);
        # pl_grad is always last when pl_reg is on.
        if not isinstance(outputs, tuple):
            outputs = (outputs,)
        pred = outputs[0]
        pl_grad = outputs[-1] if pl_reg else None
        _, j3d, j2d = predictions_to_keypoints(pred)
        breakdown, new_pl = losses_lib.scat_loss(
            j3d.reshape(-1, 63), j2d.reshape(-1, 42), labels,
            l_weight_3d, l_weight_2d, valid=valid, pl_grad=pl_grad,
            pl_mean_state=pl_mean, ema_reset_compat=ema_reset_compat)
        total = breakdown.total
        if w_kp is not None:
            # per-term microbatch weights (accum path): keypoint terms
            # by valid share, PL by plain 1/A
            pl_part = losses_lib.PL_WEIGHT * breakdown.l_pl
            total = w_kp * (total - pl_part) + w_pl * pl_part
        return total, (mutated["batch_stats"], breakdown,
                       new_pl, (j3d[0], j2d[0]))

    grad_fn = jax.grad(_loss_fn, has_aux=True)

    def _accum_grads(state: TrainState, images, labels, valid,
                     mask_key, dropout_key):
        """(grads, new_bs, breakdown, new_pl, pred0) over microbatches."""
        n = images.shape[0]
        if n % grad_accum:
            raise ValueError(
                f"batch size {n} is not divisible by "
                f"--grad_accum {grad_accum}")
        m = n // grad_accum
        split = lambda x: x.reshape((grad_accum, m) + x.shape[1:])
        # weight each microbatch by its share of the batch's valid
        # samples: sum_i (sv_i/SV) * grad(masked_mean_i) is EXACTLY the
        # gradient of the full-batch valid-weighted mean
        sv_total = jnp.maximum(jnp.sum(valid), 1.0)
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(jnp.shape(p), jnp.result_type(p)),
            state.params)

        w_pl = 1.0 / grad_accum

        def body(carry, xs):
            grads_acc, bs, pl_mean, i = carry
            im, lb, vd = xs
            w = jnp.sum(vd) / sv_total
            # weights go INTO the loss so each term's gradient carries
            # its own weight; the accumulator is then a plain sum
            grads, (new_bs, breakdown, new_pl, pred0) = grad_fn(
                state.params, bs, pl_mean, state.constants, im, lb, vd,
                jax.random.fold_in(mask_key, i),
                jax.random.fold_in(dropout_key, i), w, w_pl)
            grads_acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(a.dtype), grads_acc, grads)
            ys = (w * (breakdown.total
                       - losses_lib.PL_WEIGHT * breakdown.l_pl)
                  + w_pl * losses_lib.PL_WEIGHT * breakdown.l_pl,
                  w * breakdown.l_3d, w * breakdown.l_2d,
                  w_pl * breakdown.l_pl, pred0)
            return (grads_acc, new_bs, new_pl, i + 1), ys

        init = (zeros, state.batch_stats, state.pl_mean,
                jnp.zeros((), jnp.int32))
        (grads, new_bs, new_pl, _), ys = jax.lax.scan(
            body, init, (split(images), split(labels), split(valid)))
        breakdown = losses_lib.LossBreakdown(
            jnp.sum(ys[0]), jnp.sum(ys[1]), jnp.sum(ys[2]),
            jnp.sum(ys[3]))
        # sample 0 of microbatch 0 == the batch's sample 0
        pred0 = jax.tree_util.tree_map(lambda x: x[0], ys[4])
        return grads, new_bs, breakdown, new_pl, pred0

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        images, labels = batch["image"], batch["label"]
        valid = batch.get("valid")
        if valid is None:
            valid = metrics_lib.valid_sample_mask(images)
        mask_key, dropout_key, new_rng = jax.random.split(state.rng, 3)

        if grad_accum > 1:
            grads, new_bs, breakdown, new_pl, pred0 = _accum_grads(
                state, images, labels, valid, mask_key, dropout_key)
        else:
            grads, (new_bs, breakdown, new_pl, pred0) = grad_fn(
                state.params, state.batch_stats, state.pl_mean,
                state.constants, images, labels, valid, mask_key,
                dropout_key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, pl_mean=new_pl, rng=new_rng)
        stats = {
            "loss": breakdown.total,
            "loss_3d": l_weight_3d * breakdown.l_3d,
            "loss_2d": l_weight_2d * breakdown.l_2d,
            "loss_pl": losses_lib.PL_WEIGHT * breakdown.l_pl,
            "valid_frac": valid.mean(),
            # sample 0's predictions for the train-time debug grid
            # (reference train.py:211-222); [21,3]/[21,2] — negligible
            # D2H traffic, only fetched when the host debug hook fires.
            "pred0_3d": pred0[0],
            "pred0_2d": pred0[1],
        }
        return new_state, stats

    return train_step


def make_eval_step(model, pl_reg: bool = False,
                   pck_range=metrics_lib.DEFAULT_PCK_RANGE_MM,
                   flat_compat: bool = True, return_attn: bool = False,
                   constants=None):
    """Fused eval step: forward -> projection -> PA-Procrustes -> metrics
    (reference eval.py:810-1027 minus visualization).

    ``return_attn=True`` (coarse head under ``--debug``) also emits the
    last layer's attention from the SAME forward — the reference re-runs
    the net for its attention dump (eval.py:834); here it's free.
    """

    def eval_step(params, batch_stats, batch: Dict[str, jax.Array]):
        images, labels = batch["image"], batch["label"]
        valid = batch.get("valid")
        if valid is None:
            valid = metrics_lib.valid_sample_mask(images)
        variables = {"params": params, "batch_stats": batch_stats}
        if constants:
            variables["constants"] = constants
        outputs = model.apply(variables, images, train=False)
        pred = outputs[0]
        _, j3d, j2d = predictions_to_keypoints(pred)
        views = losses_lib.split_labels(labels)
        gt3d = views.joints_3d.reshape(-1, 21, 3)
        aligned = procrustes.similarity_align(j3d, gt3d)
        pck = metrics_lib.cal_pck(aligned, gt3d, pck_range,
                                  flat_compat=flat_compat, valid=valid)
        err = metrics_lib.mpjpe(aligned, gt3d)
        out = {
            "pck": pck,
            "mpjpe_per_sample": err,
            "valid": valid,
            "pred_joints_3d": aligned,
            "pred_joints_2d": j2d,
        }
        if return_attn:
            # coarse-head contract: (pred, feat_visual, attn[, pl_grad])
            out["attn"] = outputs[2]
        return out

    return eval_step


def make_fused_preprocess_train_step(
        model, tx: optax.GradientTransformation,
        l_weight_3d: float, l_weight_2d: float,
        out_size: int = 224, pl_reg: bool = False,
        ema_reset_compat: bool = True):
    """Train step with the image preprocessing fused INTO the program.

    Batch contract: ``raw_image`` uint8 [B,H,W,3] frames, ``affine``
    [B,2,3] (input-px -> crop-px, from crop_hand_affine and friends),
    ``label``, ``valid``.  The warp + normalize + forward + loss +
    backward + update compile as ONE XLA program — no separate
    preprocessing dispatch between steps (the BASELINE.json north-star
    fused on-device stage, taken to its endpoint).
    """
    from scat_tpu.data import preprocess

    inner = make_train_step(model, tx, l_weight_3d, l_weight_2d,
                            pl_reg=pl_reg,
                            ema_reset_compat=ema_reset_compat)

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        raw = batch["raw_image"].astype(jnp.float32)
        images = preprocess.affine_sample(
            preprocess.normalize_to_unit(raw), batch["affine"],
            out_size, out_size, fill=-1.0)
        inner_batch = {"image": images, "label": batch["label"],
                       "valid": batch.get(
                           "valid",
                           jnp.ones((raw.shape[0],), jnp.float32))}
        return inner(state, inner_batch)

    return train_step
