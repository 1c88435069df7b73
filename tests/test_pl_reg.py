"""Path-length regularization probe correctness.

The PL probe must equal d(sum feat_out)/d(feat_visual) — the quantity
the reference computes with ``autograd.grad(torch.sum(feat_out),
feat_visual)`` (reference hand_net.py:396).  Here the in-graph nn.vjp
result is checked against an independent jax.grad through the head
applied as a standalone method, and the PL loss math against the
reference formula (train.py:178-183)."""

import numpy as np
import jax
import jax.numpy as jnp

from scat_tpu import assets
from scat_tpu.models.hand_net import EncoderTransformer
from scat_tpu.models.losses import path_length_loss
import pytest


def _model_and_vars(rng):
    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, depth=3, backbone="resnet18",
                               mask_rate=0.0, pl_reg=True, token_dim=16)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
    return model, variables, x


@pytest.mark.slow
def test_pl_grad_matches_independent_jacobian(rng):
    model, variables, x = _model_and_vars(rng)
    (pred, fmap, pl_grad), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"])

    # independent computation: grad of sum(head(fv)) w.r.t. fv
    def head_sum(fv):
        out = model.apply(variables, fv, True,
                          method=EncoderTransformer._head)
        return jnp.sum(out)

    want = jax.grad(head_sum)(jax.lax.stop_gradient(fmap))
    np.testing.assert_allclose(np.asarray(pl_grad), np.asarray(want),
                               atol=1e-4)


def test_pl_loss_matches_reference_formula(rng):
    # reference train.py:179-183 re-executed (EMA-reset variant)
    pl_grad = rng.randn(3, 7, 7, 21).astype(np.float32)
    l_pl, _ = path_length_loss(jnp.asarray(pl_grad), jnp.zeros(()),
                               ema_reset_compat=True)
    g = pl_grad.astype(np.float64)
    pl_lengths = np.sqrt((g ** 2).sum(axis=(1, 2)).mean(axis=1))
    pl_mean = 0.01 * pl_lengths.mean()
    want = np.mean((pl_lengths - pl_mean) ** 2)
    np.testing.assert_allclose(float(l_pl), want, rtol=1e-4)


def test_pl_true_ema_threads_state(rng):
    pl_grad = jnp.asarray(rng.randn(3, 7, 7, 21), jnp.float32)
    state0 = jnp.asarray(0.0)
    l1, state1 = path_length_loss(pl_grad, state0,
                                  ema_reset_compat=False)
    l2, state2 = path_length_loss(pl_grad, state1,
                                  ema_reset_compat=False)
    # EMA converges toward the mean; state must move
    assert float(state1) != 0.0
    assert float(state2) > float(state1)


@pytest.mark.slow
def test_pl_double_backward_is_finite(rng):
    """grad of (PL loss of the vjp probe) w.r.t. params — the
    double-backward the training step performs — is finite."""
    model, variables, x = _model_and_vars(rng)

    def loss_fn(params):
        (pred, fmap, pl_grad), _ = model.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        l_pl, _ = path_length_loss(pl_grad, jnp.zeros(()))
        return l_pl

    grads = jax.grad(loss_fn)(variables["params"])
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_pl_reg_full_step_with_pallas_flag(rng):
    """--pl_reg + --use_pallas_attention must TRAIN (the canonical
    ablation config, script/ablation_pose.sh:5 [--pl_reg True]): the
    factory routes to the XLA attention because the Pallas kernel's
    custom VJP supports one reverse pass only — without the gate the
    jitted step dies with 'Linearization failed' (caught on-chip,
    round 3)."""
    import optax

    from scat_tpu.config import Options
    from scat_tpu.models import build_model
    from scat_tpu.training import steps
    from scat_tpu.training.state import TrainState

    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  mask_rate=0.2, pl_reg=True, use_pallas_attention=True,
                  compute_dtype="float32")
    model, _ = build_model(opt, 64)
    assert model.use_pallas is False  # the gate routed to XLA attention
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x,
        train=True)
    tx = optax.adam(1e-4)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.key(0))
    step = jax.jit(steps.make_train_step(model, tx, 1e5, 10.0,
                                         pl_reg=True))
    batch = {"image": x, "label": jnp.zeros((2, 105), jnp.float32),
             "valid": jnp.ones((2,), jnp.float32)}
    _, stats = step(state, batch)
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(float(stats["loss_pl"]))
