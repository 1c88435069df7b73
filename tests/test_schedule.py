"""Optimizer schedule parity: the reference's GradualWarmupScheduler
(multiplier=1, total_epoch=15) stepped per-epoch with epoch+1 over a
StepLR(gamma=1) after_scheduler (reference train.py:60-63,134)."""

import numpy as np
import jax.numpy as jnp

from scat_tpu.training.schedule import make_optimizer, warmup_schedule


def test_warmup_matches_reference_semantics():
    base, spe = 5e-4, 100
    sched = warmup_schedule(base, steps_per_epoch=spe, warmup_epochs=15)
    # epoch e (0-based): reference lr = base * (e+1)/15, capped at base
    for epoch in [0, 1, 7, 14, 15, 20, 39]:
        step = epoch * spe + 3
        want = base * min((epoch + 1) / 15, 1.0)
        np.testing.assert_allclose(float(sched(jnp.asarray(step))), want,
                                   rtol=1e-6)


def test_lr_constant_within_epoch():
    sched = warmup_schedule(1e-3, steps_per_epoch=50, warmup_epochs=15)
    vals = {float(sched(jnp.asarray(s))) for s in range(50)}
    assert len(vals) == 1  # per-epoch staircase, not per-step ramp


def test_make_optimizer_steps():
    import jax
    import optax
    tx = make_optimizer(1e-3, steps_per_epoch=1, warmup_epochs=1)
    params = {"w": jnp.ones(4)}
    state = tx.init(params)
    g = {"w": jnp.ones(4)}
    updates, state = tx.update(g, state, params)
    # Adam first step: update magnitude == lr (within eps)
    np.testing.assert_allclose(np.asarray(updates["w"]), -1e-3,
                               rtol=1e-3)


def test_color_jitter_ranges(rng):
    import jax
    from scat_tpu.data.preprocess import color_jitter
    x = jnp.asarray(rng.rand(2, 16, 16, 3) * 2 - 1, jnp.float32)
    y = color_jitter(jax.random.key(0), x)
    assert y.shape == x.shape
    assert float(y.min()) >= -1.0 and float(y.max()) <= 1.0
    # zero strength == identity
    z = color_jitter(jax.random.key(0), x, 0, 0, 0, 0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-5)


def test_color_jitter_np_matches_semantics(rng):
    """Host-thread numpy jitter: same contract as the device one —
    range-preserving, identity at zero strength, per-sample factors."""
    from scat_tpu.data.preprocess import color_jitter_np
    x = (rng.rand(4, 16, 16, 3) * 2 - 1).astype(np.float32)
    y = color_jitter_np(np.random.RandomState(0), x.copy())
    assert y.shape == x.shape and y.dtype == np.float32
    assert y.min() >= -1.0 and y.max() <= 1.0
    z = color_jitter_np(np.random.RandomState(0), x.copy(), 0, 0, 0, 0)
    np.testing.assert_allclose(z, x, atol=1e-5)
    # per-sample (not per-batch) factors: two identical samples in one
    # batch must usually come out different
    same = np.stack([x[0], x[0]])
    j = color_jitter_np(np.random.RandomState(1), same)
    assert np.abs(j[0] - j[1]).max() > 1e-3


def test_freeze_backbone_zeroes_encoder_updates(rng):
    import jax
    from scat_tpu.training.schedule import make_optimizer
    tx = make_optimizer(1e-3, 1, freeze_backbone=True)
    params = {"main_encoder": {"conv1": {"kernel": jnp.ones((3, 3))}},
              "regressor": {"kernel": jnp.ones((4, 4))}}
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(g, state, params)
    np.testing.assert_array_equal(
        np.asarray(updates["main_encoder"]["conv1"]["kernel"]), 0.0)
    assert np.abs(np.asarray(updates["regressor"]["kernel"])).min() > 0


def test_jitter_core_identical_across_backends(rng):
    """color_jitter (device) and color_jitter_np (loader thread) share
    one _jitter_apply core; with the SAME injected draws the two array
    backends must agree to float tolerance."""
    import jax.numpy as jnp
    from scat_tpu.data.preprocess import _jitter_apply

    x = (rng.rand(2, 8, 8, 3) * 2 - 1).astype(np.float32)
    factors = {"brightness": 1.3, "contrast": 0.7, "saturation": 1.1}
    order = [2, 0, 3, 1]

    def np_factor(name, amt):
        return np.full((2, 1, 1, 1), factors[name], np.float32)

    def np_theta(amt):
        return np.full((2, 1, 1), 0.37, np.float32)

    def j_factor(name, amt):
        return jnp.full((2, 1, 1, 1), factors[name], jnp.float32)

    def j_theta(amt):
        return jnp.full((2, 1, 1), 0.37, jnp.float32)

    a = _jitter_apply(np, x, order, np_factor, np_theta,
                      0.5, 0.5, 0.5, 0.1)
    b = _jitter_apply(jnp, jnp.asarray(x), order, j_factor, j_theta,
                      0.5, 0.5, 0.5, 0.1)
    np.testing.assert_allclose(a, np.asarray(b), atol=1e-5)
