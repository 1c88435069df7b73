"""Temporal/adversarial train-step smoke test (BASELINE config 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from scat_tpu import assets
from scat_tpu.models import mano as mano_lib
from scat_tpu.models.discriminator import MotionDiscriminator
from scat_tpu.models.hand_net import H3DWEncoder
from scat_tpu.training.adversarial import (AdversarialTrainState,
                                           make_adversarial_train_step)


@pytest.mark.slow
def test_adversarial_step_runs_and_updates(rng):
    B, T, S = 2, 4, 32
    mean61 = jnp.asarray(assets.load_mean_mano_pose())
    encoder = H3DWEncoder(mean_params=mean61, backbone="resnet18")
    disc = MotionDiscriminator(rnn_size=16, input_size=48, num_layers=1,
                               output_size=2)
    mano_model = mano_lib.ManoModel.from_data(assets.synthetic_mano(1))

    images = jnp.asarray(rng.rand(B, T, S, S, 3) * 2 - 1, jnp.float32)
    labels = jnp.asarray(rng.randn(B, T, 166) * 0.01, jnp.float32)
    real_theta = jnp.asarray(rng.randn(B, T, 61) * 0.01, jnp.float32)
    batch = {"image": images, "label": labels, "real_theta": real_theta}

    gen_vars = encoder.init(jax.random.key(0),
                            images.reshape(B * T, S, S, 3))
    disc_vars = disc.init(jax.random.key(1), real_theta[:, :, 3:51])
    gen_tx = optax.adam(1e-4)
    disc_tx = optax.adam(1e-4)
    state = AdversarialTrainState.create(gen_vars, disc_vars, gen_tx,
                                         disc_tx, jax.random.key(2))
    step = jax.jit(make_adversarial_train_step(
        encoder, disc, mano_model, gen_tx, disc_tx))
    new_state, stats = step(state, batch)
    for k in ("gen_loss", "disc_loss", "d_real", "d_fake", "loss_kp_2d",
              "loss_kp_3d", "loss_pose", "loss_shape"):
        assert np.isfinite(float(stats[k])), k
    # both sides actually updated
    g0 = jax.tree_util.tree_leaves(state.gen_params)[0]
    g1 = jax.tree_util.tree_leaves(new_state.gen_params)[0]
    assert np.abs(np.asarray(g0) - np.asarray(g1)).max() > 0
    d0 = jax.tree_util.tree_leaves(state.disc_params)[0]
    d1 = jax.tree_util.tree_leaves(new_state.disc_params)[0]
    assert np.abs(np.asarray(d0) - np.asarray(d1)).max() > 0
    # second step composes (state threading)
    _, stats2 = step(new_state, batch)
    assert np.isfinite(float(stats2["gen_loss"]))
