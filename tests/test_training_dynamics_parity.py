"""Cross-framework TRAINING-dynamics parity (the last dataset-free
accuracy rung): the full torch reference stack — EncoderTransformer +
Adam + the GradualWarmupScheduler ramp (reference train.py:60-63,134) +
the 3D-MSE/2D-L1 loss (train.py:176-203) — trained for several epochs on
identical synthetic batches from IDENTICAL ported initial weights, vs
scat_tpu's jitted train step + optax schedule.  Loss trajectories and
updated parameters must track step by step, proving the two frameworks
are interchangeable for *training*, not just inference.

BN momentum (torch 0.1 == flax 0.9), Adam moments (b1/b2/eps layout),
warmup staircase, loss weighting, and projection math all feed these
trajectories — a drift in any of them shows up here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import flax

import torch_oracles
from scat_tpu.models.hand_net import EncoderTransformer
from scat_tpu.training import schedule, steps
from scat_tpu.training.state import TrainState
from scat_tpu.utils.torch_import import import_torch_encoder_transformer

BASE_LR = 5e-4          # canonical run (script/ablation_pose.sh:5)
W3D, W2D = 1e5, 10.0    # canonical loss weights
STEPS_PER_EPOCH = 4
EPOCHS = 3              # 12 steps, inside the 15-epoch warmup ramp
BS = 2


def _make_batches(rng, mean_params):
    """Identical synthetic batches for both frameworks: plausible
    root-centered 3D targets near the mean template, pixel-space 2D."""
    batches = []
    offsets = np.asarray(mean_params)[3:66].reshape(21, 3)
    for _ in range(STEPS_PER_EPOCH * EPOCHS):
        img = (rng.randn(BS, 224, 224, 3) * 0.5).astype(np.float32)
        j3d = (offsets[None] + rng.randn(BS, 21, 3) * 0.02
               ).astype(np.float32)
        j3d -= j3d[:, 1:2]
        j2d = (rng.rand(BS, 21, 2) * 180 + 22).astype(np.float32)
        lab = np.concatenate([j3d.reshape(BS, 63),
                              j2d.reshape(BS, 42)], 1)
        batches.append((img, lab))
    return batches


def _torch_loss(pred_params, labels):
    """Reference train.py:164-203 re-executed: split cam/joints,
    weak-perspective project (train.py:112-120), 3D MSE + 2D L1."""
    cam = pred_params[:, :3]
    j3d = pred_params[:, 3:66].reshape(-1, 21, 3)
    trans = j3d[:, :, :2] + cam[:, None, 1:]
    j2d = cam[:, None, 0:1] * trans * 112.0 + 112.0
    gt3 = labels[:, :63].reshape(-1, 21, 3)
    gt2 = labels[:, 63:].reshape(-1, 21, 2)
    l3 = torch.mean((j3d - gt3) ** 2)
    l2 = torch.mean(torch.abs(j2d - gt2))
    return W3D * l3 + W2D * l2


@pytest.mark.slow
def test_training_dynamics_match_torch(rng):
    torch.manual_seed(0)
    mean = torch.randn(1, 66) * 0.1
    mean[0, 0] = 5.0
    tm = torch_oracles.EncoderTransformer(mean, iteration=1, heads=2)
    tm.train()

    model = EncoderTransformer(
        mean_params=jnp.asarray(mean.numpy()[0]), iteration=1, heads=2,
        mask_rate=0.0, token_dim=784, use_pallas=False)
    x0 = (rng.randn(BS, 224, 224, 3) * 0.5).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.asarray(x0), train=False)
    params = flax.core.unfreeze(variables["params"])
    batch_stats = flax.core.unfreeze(variables["batch_stats"])
    merged = import_torch_encoder_transformer(
        tm.state_dict(), params, batch_stats)
    assert merged > 300  # the whole net ported, not a subtree

    batches = _make_batches(rng, mean.numpy()[0])

    # --- torch training run (reference protocol) ---
    opt_t = torch.optim.Adam(tm.parameters(), lr=BASE_LR)
    torch_losses = []
    for step, (img, lab) in enumerate(batches):
        epoch = step // STEPS_PER_EPOCH
        # GradualWarmupScheduler(multiplier=1, total_epoch=15) stepped
        # with epoch+1 at each epoch start (train.py:60-63,134)
        lr = BASE_LR * min((epoch + 1.0) / 15.0, 1.0)
        for g in opt_t.param_groups:
            g["lr"] = lr
        x = torch.from_numpy(img.transpose(0, 3, 1, 2))
        pred, _ = tm(x)
        loss = _torch_loss(pred, torch.from_numpy(lab))
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        torch_losses.append(float(loss.detach()))

    # --- scat_tpu training run (same weights, same batches) ---
    tx = schedule.make_optimizer(BASE_LR, STEPS_PER_EPOCH,
                                 warmup_epochs=15)
    state = TrainState.create(params, batch_stats, tx, jax.random.key(1))
    step_fn = jax.jit(steps.make_train_step(model, tx, W3D, W2D))
    jax_losses = []
    for img, lab in batches:
        batch = {"image": jnp.asarray(img), "label": jnp.asarray(lab),
                 "valid": jnp.ones((BS,), jnp.float32)}
        state, stats = step_fn(state, batch)
        jax_losses.append(float(stats["loss"]))

    torch_losses = np.asarray(torch_losses)
    jax_losses = np.asarray(jax_losses)
    # Step-by-step agreement with a widening ladder: float32 round-off
    # compounds ~geometrically through the 1e5-weighted loss, Adam state
    # and bs-2 BN statistics (measured growth ~x5/step from 1e-5), so a
    # SYSTEMATIC mismatch (lr staircase, BN momentum, Adam layout, loss
    # weighting) shows up as O(1) error in the FIRST steps while benign
    # round-off stays under the ladder.
    rel = np.abs(jax_losses - torch_losses) / np.abs(torch_losses)
    assert rel[0] < 1e-3, (torch_losses[0], jax_losses[0])
    assert rel[1] < 5e-3, rel[:2]
    assert np.all(rel[:4] < 3e-2), rel[:4]
    assert np.all(rel < 0.3), rel
    # both runs actually learned (loss fell substantially)
    assert jax_losses[-1] < 0.5 * jax_losses[0]
    assert torch_losses[-1] < 0.5 * torch_losses[0]

    # updated parameters still track: export-free spot check on the
    # regressor (last layer touched every step) and the conv1 stem
    sd = tm.state_dict()
    # per-step Adam updates are <= lr ~ 6.7e-5, so 12 steps move a
    # weight <= ~8e-4; agreement at 1e-3 means the frameworks applied
    # essentially the same updates
    reg_w = np.asarray(state.params["regressor"]["kernel"])
    np.testing.assert_allclose(
        reg_w, sd["regressor.weight"].numpy().T, atol=1e-3)
    stem = np.asarray(
        state.params["main_encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        stem, sd["main_encoder.conv1.weight"].numpy().transpose(
            2, 3, 1, 0), atol=1e-3)
    # BN running stats updated with the same momentum on both sides
    bn_mean = np.asarray(
        state.batch_stats["main_encoder"]["bn1"]["mean"])
    np.testing.assert_allclose(
        bn_mean, sd["main_encoder.bn1.running_mean"].numpy(), atol=1e-3)
