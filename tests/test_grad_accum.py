"""Gradient accumulation (``--grad_accum``) — SURVEY.md §5 extension.

The accumulated gradient weights each microbatch by its share of the
batch's valid samples (training/steps.py:_accum_grads), so a grad_accum
step must produce the SAME parameter update as the full-batch step —
exactly, not approximately — for any per-sample (batch-independent)
forward.  The reference has no accumulation (train.py steps once per
DataLoader batch); this is the TPU memory lever for effective batch
sizes whose activations don't fit HBM.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scat_tpu.data.synthetic import synth_batch
from scat_tpu.training import schedule, steps
from scat_tpu.training.state import TrainState


class _PerSampleHead(nn.Module):
    """Tiny batch-independent encoder with the (pred, feat) contract."""

    @nn.compact
    def __call__(self, x, train=False):
        # keep a batch_stats collection alive so the step's mutable
        # plumbing is exercised (real encoders carry BN running stats)
        self.variable("batch_stats", "dummy", lambda: jnp.zeros(()))
        h = x.reshape((x.shape[0], -1))
        h = nn.tanh(nn.Dense(32)(h))
        return nn.Dense(66)(h), h


def _make(batch_size=8, image_size=8, seed=0):
    batch = synth_batch(jax.random.key(seed), batch_size,
                        image_size=image_size)
    model = _PerSampleHead()
    variables = model.init(jax.random.key(1), batch["image"])
    tx = schedule.make_optimizer(1e-3, steps_per_epoch=1)

    def fresh_state():
        return TrainState.create(variables["params"],
                                 variables["batch_stats"], tx,
                                 jax.random.key(2))

    return model, tx, batch, fresh_state


def _run(model, tx, batch, state, accum):
    step = jax.jit(steps.make_train_step(model, tx, 1e5, 10.0,
                                         grad_accum=accum))
    return step(state, batch)


@pytest.mark.parametrize("accum", [2, 4])
def test_accum_matches_full_batch(accum):
    model, tx, batch, fresh = _make()
    s1, stats1 = _run(model, tx, batch, fresh(), 1)
    sa, statsa = _run(model, tx, batch, fresh(), accum)
    np.testing.assert_allclose(float(stats1["loss"]),
                               float(statsa["loss"]), rtol=1e-5)
    for path_leaf, (l1, la) in zip(
            jax.tree_util.tree_flatten_with_path(s1.params)[0],
            zip(jax.tree_util.tree_leaves(s1.params),
                jax.tree_util.tree_leaves(sa.params))):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(la),
                                   rtol=2e-5, atol=1e-7,
                                   err_msg=str(path_leaf[0]))


def test_accum_partial_valid_weighting_is_exact():
    """Mixed-validity batches: the sv_i/SV microbatch weighting must
    reproduce the full-batch valid-weighted mean exactly (a plain 1/A
    average would be wrong whenever microbatches have unequal valid
    counts)."""
    model, tx, batch, fresh = _make()
    valid = jnp.asarray([1, 1, 1, 0, 1, 0, 0, 1], jnp.float32)
    batch = dict(batch, valid=valid)  # microbatch counts 3 vs 2
    s1, stats1 = _run(model, tx, batch, fresh(), 1)
    sa, statsa = _run(model, tx, batch, fresh(), 2)
    np.testing.assert_allclose(float(stats1["loss"]),
                               float(statsa["loss"]), rtol=1e-5)
    for l1, la in zip(jax.tree_util.tree_leaves(s1.params),
                      jax.tree_util.tree_leaves(sa.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(la),
                                   rtol=2e-5, atol=1e-7)


def test_accum_requires_divisible_batch():
    model, tx, batch, fresh = _make(batch_size=6)
    with pytest.raises(ValueError, match="divisible"):
        _run(model, tx, batch, fresh(), 4)


def test_accum_stats_shapes_match_plain_step():
    """pred0 debug slices and loss components keep the plain-step
    contract (the trainer's debug grid and CSV logging consume them)."""
    model, tx, batch, fresh = _make()
    _, stats = _run(model, tx, batch, fresh(), 2)
    assert stats["pred0_3d"].shape == (21, 3)
    assert stats["pred0_2d"].shape == (21, 2)
    assert np.isfinite(float(stats["loss_3d"]))
    assert np.isfinite(float(stats["valid_frac"]))


@pytest.mark.slow
def test_accum_composes_with_pl_reg():
    """--pl_reg differentiates through the model's in-graph vjp probe;
    under accumulation that double-backward sits inside the lax.scan
    body — must still compile and the PL EMA state must thread through
    microbatches (the on-chip canonical ablation runs both flags)."""
    from scat_tpu import assets
    from scat_tpu.models.hand_net import EncoderTransformer

    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean),
                               iteration=1, heads=2, depth=3,
                               backbone="resnet18", mask_rate=0.2,
                               token_dim=16, pl_reg=True)
    batch = synth_batch(jax.random.key(0), 8, image_size=32,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"])
    tx = schedule.make_optimizer(1e-3, steps_per_epoch=1)
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx,
                              jax.random.key(2))
    step = jax.jit(steps.make_train_step(model, tx, 1e5, 10.0,
                                         pl_reg=True, grad_accum=2))
    new_state, stats = step(state, batch)
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(float(stats["loss_pl"]))
    # the EMA carry advanced (threading through both microbatches)
    assert float(new_state.pl_mean) != float(state.pl_mean)


@pytest.mark.slow
def test_accum_flagship_on_mesh():
    """grad_accum composes with the data-parallel mesh: the sharded
    batch reshapes to (accum, micro, ...) inside the jitted step and the
    full flagship step runs to a finite loss on 8 virtual devices."""
    from scat_tpu import assets
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.parallel import mesh as mesh_lib

    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean),
                               iteration=1, heads=2, depth=3,
                               backbone="resnet18", mask_rate=0.0,
                               token_dim=16)
    batch = synth_batch(jax.random.key(0), 16, image_size=32,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"])
    tx = schedule.make_optimizer(1e-3, steps_per_epoch=1)
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx,
                              jax.random.key(2))
    mesh = mesh_lib.make_mesh()
    step = mesh_lib.jit_train_step(
        steps.make_train_step(model, tx, 1e5, 10.0, grad_accum=2),
        mesh, donate_state=False)
    s8 = mesh_lib.replicate_state(mesh, state)
    b8 = mesh_lib.shard_batch(mesh, batch)
    _, stats = step(s8, b8)
    assert np.isfinite(float(stats["loss"]))
