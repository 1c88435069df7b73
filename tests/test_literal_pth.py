"""De-circularized .pth interchange (round-4 review, Weak #2).

``test_pth_eval.py`` proves the checkpoint-compat machinery against
state_dicts emitted by ``torch_oracles`` — the builder's own torch
re-implementation.  Here the emitter/consumer is the LITERAL reference
model (``/root/reference/models/hand_net.py`` via literal_ref), so
"a reference user's checkpoint loads here" and "weights trained here
load into the reference" are proven against upstream code itself:

  * literal ``EncoderTransformer.state_dict()`` -> torch.save -> our
    Evaluator restores it (--checkpoint_path_eval auto-detect) and
    reproduces the literal forward (reference eval.py:393-402);
  * ``export_torch_encoder_transformer`` output -> literal
    ``load_state_dict`` (strict modulo the deterministic PE buffer)
    -> the literal forward reproduces our Flax forward (reference
    train.py:66-75 resume direction);
  * same round-trip for the resnet50 backbone state_dict.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import literal_ref
from scat_tpu import assets
from scat_tpu.config import Options
from scat_tpu.data.synthetic import synth_batch


@pytest.fixture(scope="module")
def hand_net():
    return literal_ref.load("models.hand_net")


@pytest.mark.slow
def test_evaluator_loads_literal_pth(hand_net, tmp_path):
    """A checkpoint saved from the LITERAL reference model evaluates in
    this framework unchanged."""
    torch.manual_seed(0)
    mean = assets.load_mean_params()
    lm = hand_net.EncoderTransformer(
        literal_ref.make_opt(iteration=1),
        torch.from_numpy(mean[None].astype(np.float32)))
    lm.eval()
    pth = tmp_path / "hand_net_final.pth"
    torch.save(lm.state_dict(), pth)

    opt = Options(net="reg_transformer", vit_heads=8, iteration=1,
                  batch_size=2, compute_dtype="float32",
                  use_pallas_attention=False, mask_rate=0.0,
                  result_dir=str(tmp_path / "out"),
                  checkpoint_path_eval=str(pth))
    from scat_tpu.evaluation.evaluator import Evaluator
    ds = [synth_batch(jax.random.key(i), 2, 224,
                      mean) for i in range(1)]
    ev = Evaluator(opt, image_size=224, dataset=ds)
    img = np.asarray(ds[0]["image"], np.float32)
    pred, _ = ev.model.apply(
        {"params": ev.params, "batch_stats": ev.batch_stats},
        jnp.asarray(img), train=False)
    with torch.no_grad():
        want, _ = lm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(pred), want.numpy(),
                               atol=2e-3)
    res = ev.eval()
    assert np.isfinite(res["mpjpe_mm"]) and np.isfinite(res["auc"])


@pytest.mark.slow
def test_flax_export_loads_into_literal(hand_net, rng):
    """The reverse direction: weights trained HERE render as a
    reference-keyed state_dict that the LITERAL model consumes with
    nothing unexpected, and its forward reproduces ours."""
    import flax
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.utils.torch_import import (
        export_torch_encoder_transformer)

    torch.manual_seed(1)
    mean = torch.randn(1, 66) * 0.1
    mean[0, 0] = 5.0
    model = EncoderTransformer(
        mean_params=jnp.asarray(mean.numpy()[0]), iteration=2, heads=8,
        mask_rate=0.0, token_dim=784, use_pallas=False)
    # batch 2: the literal forward's root-centering write-back
    # (hand_net.py:393) trips torch>=2's overlap check at batch 1
    # (see test_literal_reference.py's pl-branch witness)
    x_np = (rng.randn(2, 224, 224, 3) * 0.5).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(7), "mask": jax.random.key(8)},
        jnp.asarray(x_np), train=False)
    sd = export_torch_encoder_transformer(
        flax.core.unfreeze(variables["params"]),
        flax.core.unfreeze(variables["batch_stats"]))

    lm = hand_net.EncoderTransformer(
        literal_ref.make_opt(iteration=2), mean)
    missing, unexpected = lm.load_state_dict(
        {k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
        strict=False)
    assert all("positionalEncoding" in k for k in missing), missing
    assert not unexpected, unexpected
    lm.eval()

    pred, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x_np), train=False)
    with torch.no_grad():
        want, _ = lm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(pred), want.numpy(),
                               atol=1e-3)


@pytest.mark.slow
def test_resnet_roundtrip_with_literal(rng, tmp_path):
    """export_torch_resnet -> literal resnet50 (strict modulo BN
    bookkeeping) -> forward parity; and the literal state_dict restores
    into a TrainState via the nonstrict path (train.py:66-75)."""
    import flax
    rn = literal_ref.load("models.resnet")
    from scat_tpu.models.resnet import resnet50
    from scat_tpu.training import schedule
    from scat_tpu.training.state import TrainState
    from scat_tpu.utils import checkpoint as ckpt_lib
    from scat_tpu.utils.torch_import import export_torch_resnet

    net = resnet50()
    # 224 input: the literal forward hardcodes AvgPool2d(7)
    # (resnet.py:113,148-151)
    v = net.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                 train=False)
    sd = export_torch_resnet(flax.core.unfreeze(v["params"]),
                             flax.core.unfreeze(v["batch_stats"]))
    lm = rn.resnet50(pretrained=False, num_classes=512)
    missing, unexpected = lm.load_state_dict(
        {k: torch.as_tensor(np.array(w)) for k, w in sd.items()},
        strict=False)
    assert all(k.endswith("num_batches_tracked") for k in missing), (
        missing)
    assert not unexpected, unexpected
    lm.eval()
    x_np = (rng.randn(1, 224, 224, 3) * 0.5).astype(np.float32)
    ours = net.apply({"params": v["params"],
                      "batch_stats": v["batch_stats"]},
                     jnp.asarray(x_np), train=False)
    with torch.no_grad():
        theirs = lm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours[0]), theirs[0].numpy(),
                               atol=1e-4)

    # literal -> TrainState resume
    pth = str(tmp_path / "hand_net.pth")
    torch.manual_seed(3)
    lm2 = rn.resnet50(pretrained=False, num_classes=512)
    torch.save(lm2.state_dict(), pth)
    tx = schedule.make_optimizer(1e-3, steps_per_epoch=1)
    state = TrainState.create(v["params"], v["batch_stats"], tx,
                              jax.random.key(1))
    restored = ckpt_lib.restore_state(pth, state)
    np.testing.assert_allclose(
        np.asarray(restored.params["conv1"]["kernel"]),
        lm2.state_dict()["conv1.weight"].numpy().transpose(
            2, 3, 1, 0), rtol=1e-6)
