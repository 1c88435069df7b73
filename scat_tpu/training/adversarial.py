"""Temporal/adversarial training — the video stage (BASELINE config 5).

The reference ships the pieces but never wires them into a driver
(SURVEY.md §2.7: VIBELoss + MotionDiscriminator belong to the temporal
stage): per-frame H3DW-style encoder -> theta sequences [B,T,61] ->
MANO joint decode -> VIBE keypoint/pose/shape/smoothness losses + LSGAN
motion-adversarial terms against a GRU discriminator over pose
sequences (theta[:, :, 3:51], reference loss.py:193-197).

One jitted program per optimization side; frames fold into the batch
axis for the CNN (B*T) and back out for the temporal terms, so the MXU
sees one big batched conv workload.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from scat_tpu.models import mano as mano_lib
from scat_tpu.models import vibe_loss as vl
from scat_tpu.ops.geometry import batch_orth_proj_idrot, project_2d


@flax.struct.dataclass
class AdversarialTrainState:
    step: jax.Array
    gen_params: Any
    gen_batch_stats: Any
    gen_opt_state: Any
    disc_params: Any
    disc_opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, gen_variables, disc_variables, gen_tx, disc_tx, rng):
        return cls(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_variables["params"],
            gen_batch_stats=gen_variables.get("batch_stats", {}),
            gen_opt_state=gen_tx.init(gen_variables["params"]),
            disc_params=disc_variables["params"],
            disc_opt_state=disc_tx.init(disc_variables["params"]),
            rng=rng,
        )


def _decode_thetas(mano_model, thetas_flat):
    """theta [N,61] -> (joints [N,21,3], j2d_px [N,21,2])."""
    cam = thetas_flat[:, :3]
    rots = thetas_flat[:, 3:6]
    poses = thetas_flat[:, 6:51]
    shapes = thetas_flat[:, 51:61]
    out = mano_lib.rot_pose_beta_to_mesh(mano_model, rots, poses, shapes)
    joints = out[:, :21]
    j2d = project_2d(batch_orth_proj_idrot(joints, cam))
    return joints, j2d


def make_adversarial_train_step(
        encoder, discriminator, mano_model: mano_lib.ManoModel,
        gen_tx: optax.GradientTransformation,
        disc_tx: optax.GradientTransformation,
        cfg: vl.VIBELossConfig = vl.VIBELossConfig()):
    """Fused generator+discriminator update.

    ``batch``: images [B,T,H,W,3], labels [B,T,166] (pose 3:51, 3D
    61:124, 2D 124:166 — reference train.py:193-196), and a real motion
    bank ``real_theta`` [B,T,61] for the discriminator.
    """

    def train_step(state: AdversarialTrainState,
                   batch: Dict[str, jax.Array]
                   ) -> Tuple[AdversarialTrainState, Dict[str, jax.Array]]:
        images, labels = batch["image"], batch["label"]
        real_theta = batch["real_theta"]
        B, T = images.shape[:2]
        flat_images = images.reshape((B * T,) + images.shape[2:])
        rng, new_rng = jax.random.split(state.rng)

        def gen_loss_fn(gen_params):
            variables = {"params": gen_params,
                         "batch_stats": state.gen_batch_stats}
            (feat, thetas_flat), mutated = encoder.apply(
                variables, flat_images, train=True,
                mutable=["batch_stats"])
            joints_flat, j2d_flat = _decode_thetas(mano_model,
                                                   thetas_flat)
            thetas = thetas_flat.reshape(B, T, 61)
            pred_j3d = joints_flat.reshape(B, T, 21, 3)
            pred_j2d = j2d_flat.reshape(B, T, 21, 2)
            real_3d = labels[..., 61:124].reshape(B, T, 21, 3)
            real_2d = labels[..., 124:].reshape(B, T, 21, 2)
            gt_theta = jnp.concatenate(
                [jnp.zeros((B, T, 3)), labels[..., 3:51],
                 jnp.zeros((B, T, 10))], axis=-1)
            disc_fake = discriminator.apply(
                {"params": state.disc_params},
                thetas[:, :, 3:51])
            total, parts = vl.vibe_generator_loss(
                cfg, thetas, pred_j2d, pred_j3d, real_2d, real_3d,
                gt_theta, disc_fake_value=disc_fake)
            return total, (mutated["batch_stats"], thetas, parts)

        (gen_loss, (new_bs, thetas, parts)), gen_grads = \
            jax.value_and_grad(gen_loss_fn, has_aux=True)(state.gen_params)
        gen_updates, new_gen_opt = gen_tx.update(
            gen_grads, state.gen_opt_state, state.gen_params)
        new_gen_params = optax.apply_updates(state.gen_params,
                                             gen_updates)

        fake_motion = jax.lax.stop_gradient(thetas)  # ref loss.py:200

        def disc_loss_fn(disc_params):
            fake_val = discriminator.apply({"params": disc_params},
                                           fake_motion[:, :, 3:51])
            real_val = discriminator.apply({"params": disc_params},
                                           real_theta[:, :, 3:51])
            la, lb, total = vl.vibe_discriminator_loss(cfg, real_val,
                                                       fake_val)
            return total, (la, lb)

        (disc_loss, (d_real, d_fake)), disc_grads = \
            jax.value_and_grad(disc_loss_fn, has_aux=True)(
                state.disc_params)
        disc_updates, new_disc_opt = disc_tx.update(
            disc_grads, state.disc_opt_state, state.disc_params)
        new_disc_params = optax.apply_updates(state.disc_params,
                                              disc_updates)

        new_state = state.replace(
            step=state.step + 1, gen_params=new_gen_params,
            gen_batch_stats=new_bs, gen_opt_state=new_gen_opt,
            disc_params=new_disc_params, disc_opt_state=new_disc_opt,
            rng=new_rng)
        stats = {"gen_loss": gen_loss, "disc_loss": disc_loss,
                 "d_real": d_real, "d_fake": d_fake}
        stats.update({k: v for k, v in parts.items()})
        return new_state, stats

    return train_step
