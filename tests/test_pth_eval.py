"""Reference-user migration path: a torch ``hand_net_final.pth`` dropped
into ``--checkpoint_path_eval`` evaluates in this framework unchanged —
the Evaluator auto-detects the torch layout and merges it
(utils/checkpoint.py -> torch_import.import_torch_auto)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import torch_oracles
from scat_tpu import assets
from scat_tpu.config import Options
from scat_tpu.data.synthetic import synth_batch
from scat_tpu.utils import checkpoint as ckpt_lib


@pytest.mark.slow
def test_evaluator_loads_reference_pth(tmp_path, rng):
    torch.manual_seed(0)
    mean = assets.load_mean_params()
    tm = torch_oracles.EncoderTransformer(
        torch.from_numpy(mean[None].astype(np.float32)), iteration=1,
        heads=2)
    # heads=2 to keep the test cheap; qkv widths shrink on both sides
    tm.transformer = torch_oracles.Transformer(784, 3, 2, 64, 392)
    tm.eval()
    pth = tmp_path / "hand_net_final.pth"
    torch.save(tm.state_dict(), pth)

    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  batch_size=2, compute_dtype="float32",
                  use_pallas_attention=False, mask_rate=0.0,
                  result_dir=str(tmp_path / "out"),
                  checkpoint_path_eval=str(pth))
    from scat_tpu.evaluation.evaluator import Evaluator
    ds = [synth_batch(jax.random.key(i), 2, 224, mean) for i in range(1)]
    ev = Evaluator(opt, image_size=224, dataset=ds)

    # the Evaluator's restored params must reproduce the torch forward
    img = np.asarray(ds[0]["image"], np.float32)
    pred, _ = ev.model.apply(
        {"params": ev.params, "batch_stats": ev.batch_stats},
        jnp.asarray(img), train=False)
    with torch.no_grad():
        want, _ = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(pred), want.numpy(),
                               atol=2e-3)
    res = ev.eval()
    assert np.isfinite(res["mpjpe_mm"]) and np.isfinite(res["auc"])


def test_pth_depth_inferred_and_mismatch_guarded(tmp_path, capsys):
    """Non-default --vit_depth checkpoints import fully (depth inferred
    from the keys, not hard-coded 3); architecture mismatches are loud:
    zero merges raise, partial merges warn."""
    import flax
    import torch_oracles as to
    from scat_tpu.models.hand_net import EncoderTransformer

    torch.manual_seed(5)
    mean_t = torch.randn(1, 66) * 0.1
    tm = to.EncoderTransformer(mean_t, iteration=1, heads=2)
    tm.transformer = to.Transformer(64, 4, 2, 64, 48)  # depth 4!
    pth = tmp_path / "hand_net.pth"
    torch.save(tm.state_dict(), pth)

    model = EncoderTransformer(mean_params=jnp.asarray(mean_t[0].numpy()),
                               iteration=1, heads=2, depth=4,
                               token_dim=64, use_pallas=False)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    p = flax.core.unfreeze(variables["params"])
    b = flax.core.unfreeze(variables["batch_stats"])
    from scat_tpu.utils.torch_import import import_torch_auto
    merged = import_torch_auto(tm.state_dict(), p, b)
    # every transformer.layers.3 tensor must have landed
    l3 = [k for k in tm.state_dict() if k.startswith(
        "transformer.layers.3")]
    assert l3, "oracle has no depth-4 layer?"
    # to_qkv of layer 3 merged => shapes matched at inferred depth
    got = np.asarray(p["transformer"]["attn_3"]["to_qkv"]["kernel"])
    want = tm.state_dict()["transformer.layers.3.0.fn.fn.to_qkv.weight"]
    np.testing.assert_allclose(got, want.numpy().T, rtol=1e-6)

    # zero-merge raises; partial merge warns
    from scat_tpu.utils import checkpoint as ck
    bogus = tmp_path / "bogus.pth"
    torch.save({"decoder.weight": torch.zeros(3, 3)}, bogus)
    with pytest.raises(ValueError, match="unrecognized"):
        ck.restore_variables_nonstrict(str(bogus), p, b)
    # recognized layout but zero-overlap model: merged==0 raises too
    from test_torch_import import TorchResNet50
    rn = tmp_path / "rn.pth"
    torch.save(TorchResNet50().state_dict(), rn)
    with pytest.raises(ValueError, match="no tensor"):
        # an encoder-model tree has no top-level layer1 — nothing merges
        ck.restore_variables_nonstrict(str(rn), p, b)
    with pytest.raises(FileNotFoundError):
        ck.restore_variables_nonstrict(str(tmp_path / "typo.pth"), p, b)
    # heads mismatch: qkv shapes skip -> warning
    tm8 = to.EncoderTransformer(mean_t, iteration=1, heads=8)
    tm8.transformer = to.Transformer(64, 4, 8, 64, 48)
    pth8 = tmp_path / "h8.pth"
    torch.save(tm8.state_dict(), pth8)
    ck.restore_variables_nonstrict(str(pth8), p, b)
    outerr = capsys.readouterr().out
    assert "WARNING" in outerr and "matched the model" in outerr


def test_restore_state_pth_resume(tmp_path):
    """--resume --checkpoint_hand hand_net.pth merges params+BN stats
    and restarts the optimizer — the reference's resume semantics
    (train.py:66-75)."""
    from test_torch_import import TorchResNet50
    from scat_tpu.models.resnet import resnet50
    from scat_tpu.training import schedule
    from scat_tpu.training.state import TrainState

    torch.manual_seed(1)
    pth = tmp_path / "hand_net.pth"
    torch.save(TorchResNet50().state_dict(), pth)
    net = resnet50()
    v = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                 train=False)
    tx = schedule.make_optimizer(1e-3, steps_per_epoch=1)
    state = TrainState.create(v["params"], v["batch_stats"], tx,
                              jax.random.key(1))
    restored = ckpt_lib.restore_state(str(pth), state)
    assert restored is not None
    sd = torch.load(pth, weights_only=False)
    np.testing.assert_allclose(
        np.asarray(restored.params["conv1"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored.batch_stats["bn1"]["mean"]),
        sd["bn1.running_mean"].numpy(), rtol=1e-6)
    assert restored.step == state.step
