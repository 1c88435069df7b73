"""Encoder-head shape/behavior tests (reference hand_net.py §2.5) and the
end-to-end train-step smoke test on the synthetic dataset."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scat_tpu import assets
from scat_tpu.models.hand_net import (EncoderTransformer,
                                      EncoderTransformerCoarse, H3DWEncoder)
from scat_tpu.training import schedule, steps
from scat_tpu.training.state import TrainState
from scat_tpu.data.synthetic import synth_batch

IMG = 64  # small images keep the conv stack cheap; x2 map scales with input


def _mean():
    return jnp.asarray(assets.load_mean_params())


TOKEN_DIM = (IMG // 8) ** 2  # x2 stage spatial size squared


def _small_encoder(**kw):
    # resnet18 backbone + tiny transformer for fast CPU tests
    defaults = dict(mean_params=_mean(), iteration=3, heads=2, depth=3,
                    backbone="resnet18", token_dim=TOKEN_DIM)
    defaults.update(kw)
    return EncoderTransformer(**defaults)


@pytest.mark.slow
def test_encoder_transformer_shapes(rng):
    model = _small_encoder()
    x = jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
    (pred, fmap), _ = model.apply(variables, x, train=True,
                                  rngs={"mask": jax.random.key(2)},
                                  mutable=["batch_stats"])
    assert pred.shape == (2, 66)
    assert fmap.shape[0] == 2 and fmap.shape[-1] == 21
    # root-centered: joint index 1 is zero (reference hand_net.py:389-393)
    j3d = np.asarray(pred[:, 3:66]).reshape(2, 21, 3)
    np.testing.assert_allclose(j3d[:, 1], 0.0, atol=1e-5)


@pytest.mark.slow
def test_encoder_transformer_pl_reg(rng):
    model = _small_encoder(pl_reg=True, mask_rate=0.2)
    x = jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
    (pred, fmap, pl_grad), _ = model.apply(
        variables, x, train=True, rngs={"mask": jax.random.key(2)},
        mutable=["batch_stats"])
    assert pl_grad.shape == fmap.shape
    assert np.abs(np.asarray(pl_grad)).sum() > 0  # probe actually flows


@pytest.mark.slow
def test_masking_changes_output_only_in_train(rng):
    model = _small_encoder(mask_rate=0.5)
    x = jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
    out1, _ = model.apply(variables, x, train=True,
                          rngs={"mask": jax.random.key(2)},
                          mutable=["batch_stats"])
    out2, _ = model.apply(variables, x, train=True,
                          rngs={"mask": jax.random.key(3)},
                          mutable=["batch_stats"])
    # different masks -> different predictions
    assert np.abs(np.asarray(out1[0]) - np.asarray(out2[0])).max() > 1e-6
    # eval mode: deterministic, no mask rng needed
    e1 = model.apply(variables, x, train=False)
    e2 = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(e1[0]), np.asarray(e2[0]))


def test_encoder_coarse_outputs(rng):
    model = EncoderTransformerCoarse(mean_params=_mean(), heads=2,
                                     backbone="resnet18",
                                     token_dim=TOKEN_DIM)
    x = jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
    (pred, fmap, attn), _ = model.apply(variables, x, train=True,
                                        rngs={"mask": jax.random.key(2)},
                                        mutable=["batch_stats"])
    assert pred.shape == (2, 66)
    assert attn.shape[-2:] == (21, 21)


def test_h3dw_encoder(rng):
    model = H3DWEncoder(mean_params=jnp.asarray(
        assets.load_mean_mano_pose()), backbone="resnet18")
    x = jnp.asarray(rng.randn(2, IMG, IMG, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    (feat, pred), _ = model.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
    assert feat.shape == (2, 1024)
    assert pred.shape == (2, 61)


@pytest.mark.slow
def test_train_step_overfits_synthetic():
    """End-to-end: jitted train step drives the loss down on one batch
    (the SURVEY.md §4 'fake dataset' oracle)."""
    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, depth=3, backbone="resnet18",
                               mask_rate=0.0, token_dim=TOKEN_DIM)
    batch = synth_batch(jax.random.key(0), 4, image_size=IMG,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"])
    tx = schedule.make_optimizer(1e-3, steps_per_epoch=1, warmup_epochs=1)
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx,
                              jax.random.key(2))
    step = jax.jit(steps.make_train_step(model, tx, l_weight_3d=1e5,
                                         l_weight_2d=10.0))
    _, first = step(state, batch)
    for _ in range(15):
        state, stats = step(state, batch)
    assert float(stats["loss"]) < float(first["loss"])
    assert np.isfinite(float(stats["loss"]))


@pytest.mark.slow
def test_train_step_with_pl_reg_runs():
    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, depth=3, backbone="resnet18",
                               mask_rate=0.2, pl_reg=True,
                               token_dim=TOKEN_DIM)
    batch = synth_batch(jax.random.key(0), 2, image_size=IMG,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"])
    tx = schedule.make_optimizer(1e-4, steps_per_epoch=1)
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx,
                              jax.random.key(2))
    step = jax.jit(steps.make_train_step(model, tx, 1e5, 10.0,
                                         pl_reg=True))
    state, stats = step(state, batch)
    assert np.isfinite(float(stats["loss"]))
    assert float(stats["loss_pl"]) >= 0.0


@pytest.mark.slow
def test_eval_step_metrics(rng):
    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, depth=3, backbone="resnet18",
                               token_dim=TOKEN_DIM)
    batch = synth_batch(jax.random.key(0), 4, image_size=IMG,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"])
    ev = jax.jit(steps.make_eval_step(model))
    out = ev(variables["params"], variables["batch_stats"], batch)
    assert out["pck"].shape == (7, 22)
    assert out["mpjpe_per_sample"].shape == (4,)
    assert np.all(np.isfinite(np.asarray(out["mpjpe_per_sample"])))


@pytest.mark.slow
def test_fused_preprocess_train_step(rng):
    """Raw frames + affines in, one XLA program does warp+train; output
    matches preprocessing outside the step."""
    from scat_tpu.data import preprocess
    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, depth=3, backbone="resnet18",
                               mask_rate=0.0, token_dim=TOKEN_DIM)
    B, H, W = 2, 96, 128
    raw = (rng.rand(B, H, W, 3) * 255).astype(np.uint8)
    j2d = jnp.asarray(rng.rand(B, 21, 2) * jnp.asarray([W, H]),
                      jnp.float32)
    M, j2d_out = preprocess.crop_hand_affine(j2d, W, H, IMG)
    labels = jnp.concatenate(
        [jnp.asarray(rng.randn(B, 63) * 0.01, jnp.float32),
         j2d_out.reshape(B, 42)], axis=1)
    batch_raw = {"raw_image": jnp.asarray(raw), "affine": M,
                 "label": labels,
                 "valid": jnp.ones((B,), jnp.float32)}
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.zeros((B, IMG, IMG, 3), jnp.float32))
    tx = schedule.make_optimizer(1e-4, 1)

    def fresh():
        return TrainState.create(variables["params"],
                                 variables["batch_stats"], tx,
                                 jax.random.key(2))

    fused = jax.jit(steps.make_fused_preprocess_train_step(
        model, tx, 1e5, 10.0, out_size=IMG))
    _, stats_fused = fused(fresh(), batch_raw)

    # reference: preprocess outside, standard step inside
    images = preprocess.affine_sample(
        preprocess.normalize_to_unit(jnp.asarray(raw, jnp.float32)), M,
        IMG, IMG, fill=-1.0)
    plain = jax.jit(steps.make_train_step(model, tx, 1e5, 10.0))
    _, stats_plain = plain(fresh(), {"image": images, "label": labels,
                                     "valid": jnp.ones((B,))})
    np.testing.assert_allclose(float(stats_fused["loss"]),
                               float(stats_plain["loss"]), rtol=1e-4)
