"""Motion discriminator + VIBE loss tests (SURVEY.md §2.7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scat_tpu.models.discriminator import MotionDiscriminator, SelfAttention
from scat_tpu.models import vibe_loss as vl


@pytest.mark.parametrize("pool", ["concat", "attention", "last"])
@pytest.mark.slow
def test_motion_discriminator_pools(rng, pool):
    model = MotionDiscriminator(rnn_size=32, input_size=48, num_layers=2,
                                output_size=2, feature_pool=pool,
                                attention_size=32)
    seq = jnp.asarray(rng.randn(3, 16, 48), jnp.float32)
    variables = model.init(jax.random.key(0), seq)
    out = model.apply(variables, seq)
    assert out.shape == (3, 2)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_motion_discriminator_spectral_norm(rng):
    model = MotionDiscriminator(rnn_size=16, input_size=48, num_layers=1,
                                use_spectral_norm=True)
    seq = jnp.asarray(rng.randn(2, 8, 48), jnp.float32)
    variables = model.init(jax.random.key(0), seq)
    out, _ = model.apply(variables, seq, update_sn_stats=True,
                         mutable=["batch_stats"])
    assert out.shape == (2, 2)


def test_self_attention_pooling(rng):
    model = SelfAttention(attention_size=16)
    x = jnp.asarray(rng.randn(2, 10, 16), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    pooled, scores = model.apply(variables, x)
    assert pooled.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(scores).sum(-1), 1.0, atol=1e-5)


def test_lsgan_losses_match_reference_formulas(rng):
    real = jnp.asarray(rng.randn(8, 2), jnp.float32)
    fake = jnp.asarray(rng.randn(6, 2), jnp.float32)
    la, lb, tot = vl.adv_disc_l2_loss(real, fake)
    # reference loss.py:325-333
    want_la = ((np.asarray(real) - 1) ** 2).sum() / 8
    want_lb = (np.asarray(fake) ** 2).sum() / 6
    np.testing.assert_allclose(float(la), want_la, rtol=1e-5)
    np.testing.assert_allclose(float(lb), want_lb, rtol=1e-5)
    np.testing.assert_allclose(float(tot), want_la + want_lb, rtol=1e-5)
    enc = vl.encoder_disc_l2_loss(fake)
    np.testing.assert_allclose(
        float(enc), ((np.asarray(fake) - 1) ** 2).sum() / 6, rtol=1e-5)


def test_wasserstein_losses(rng):
    real = jnp.asarray(rng.randn(8, 2), jnp.float32)
    fake = jnp.asarray(rng.randn(6, 2), jnp.float32)
    la, lb, tot = vl.adv_disc_wasserstein_loss(real, fake)
    np.testing.assert_allclose(float(la), -np.asarray(real).sum() / 8,
                               rtol=1e-5)
    np.testing.assert_allclose(float(lb), np.asarray(fake).sum() / 6,
                               rtol=1e-5)


def test_smoothness_losses(rng):
    theta = jnp.asarray(rng.randn(2, 16, 48), jnp.float32)
    t = np.asarray(theta)
    got = float(vl.batch_smooth_pose_loss(theta))
    want = (abs(np.mean(t[:, 1:, 3:] - t[:, :-1, 3:]))
            + abs(np.mean(t[:, 1:, :3] - t[:, :-1, :3])) * 10)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    joints = jnp.asarray(rng.randn(2, 16, 21, 3), jnp.float32)
    j = np.asarray(joints)
    np.testing.assert_allclose(
        float(vl.batch_smooth_joints_loss(joints)),
        np.mean((j[:, 1:] - j[:, :-1]) ** 2), rtol=1e-5)


def test_vibe_generator_loss_composes(rng):
    cfg = vl.VIBELossConfig()
    B, T = 2, 8
    pred_theta = jnp.asarray(rng.randn(B, T, 61) * 0.1, jnp.float32)
    pred_j2d = jnp.asarray(rng.randn(B, T, 21, 2), jnp.float32)
    pred_j3d = jnp.asarray(rng.randn(B, T, 21, 3), jnp.float32)
    gt_theta = jnp.asarray(rng.randn(B, T, 61) * 0.1, jnp.float32)
    disc_val = jnp.asarray(rng.randn(B, 2), jnp.float32)
    total, parts = vl.vibe_generator_loss(
        cfg, pred_theta, pred_j2d, pred_j3d,
        real_2d=pred_j2d + 0.1, real_3d=pred_j3d + 0.1,
        gt_theta=gt_theta, disc_fake_value=disc_val)
    assert np.isfinite(float(total))
    np.testing.assert_allclose(float(total),
                               sum(float(v) for v in parts.values()),
                               rtol=1e-5)
