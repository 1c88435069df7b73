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
    res = ev.eval("STB")
    assert np.isfinite(res["mpjpe_mm"]) and np.isfinite(res["auc"])


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
