"""Train/eval driver wiring added in round 2: the every-100-steps debug
grid (reference train.py:211-222), structured CSV metrics, the coarse
head honoring --vit_heads (reference hand_net.py:236), attention out of
the jitted eval step, and the --hand_choice gate (reference eval.py:368).
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scat_tpu import assets
from scat_tpu.config import Options
from scat_tpu.models.hand_net import EncoderTransformerCoarse
from scat_tpu.training import steps


def _coarse_opt(**kw):
    base = dict(net="reg_transformer_coarse", vit_heads=2, iteration=1,
                batch_size=2, compute_dtype="float32",
                use_pallas_attention=False, mesh_shape="data:1")
    base.update(kw)
    return Options(**base)


def test_coarse_head_honors_vit_heads():
    """--vit_heads must change the coarse transformer's QKV widths
    (reference hand_net.py:236 passes opt.vit_heads; round-1 hardcoded
    heads=8)."""
    mean = jnp.asarray(assets.load_mean_params())
    shapes = {}
    for heads in (2, 8):
        model = EncoderTransformerCoarse(mean_params=mean, heads=heads,
                                         token_dim=64)
        var_shapes = jax.eval_shape(
            lambda m=model: m.init(
                {"params": jax.random.key(0), "mask": jax.random.key(1)},
                jnp.zeros((1, 64, 64, 3), jnp.float32)))
        qkv = var_shapes["params"]["transformer"]["attn_0"]["to_qkv"][
            "kernel"]
        shapes[heads] = qkv.shape
    assert shapes[2] == (64, 2 * 64 * 3)
    assert shapes[8] == (64, 8 * 64 * 3)


@pytest.mark.slow
def test_eval_step_returns_attention():
    """The jitted eval step emits the last layer's attention when asked —
    no second eager forward (round-1 evaluator re-ran the model)."""
    mean = jnp.asarray(assets.load_mean_params())
    model = EncoderTransformerCoarse(mean_params=mean, heads=2,
                                     token_dim=64)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
    step = jax.jit(steps.make_eval_step(model, return_attn=True))
    batch = {"image": jnp.ones((2, 64, 64, 3), jnp.float32) * 0.1,
             "label": jnp.zeros((2, 105), jnp.float32),
             "valid": jnp.ones((2,), jnp.float32)}
    out = step(variables["params"], variables.get("batch_stats", {}),
               batch)
    assert out["attn"].shape == (2, 2, 21, 21)
    # rows are softmax distributions
    np.testing.assert_allclose(np.asarray(out["attn"]).sum(-1), 1.0,
                               atol=1e-5)


def test_hand_choice_gate(tmp_path):
    """--hand_choice smplx fails loudly (the reference's smplx decode is
    commented out at test.py:343 and crashes as shipped)."""
    from scat_tpu.evaluation.tester import Tester
    opt = _coarse_opt(hand_choice="smplx", result_dir=str(tmp_path))
    with pytest.raises(ValueError, match="hand_choice"):
        Tester(opt)


def test_pretrained_backbone_load(tmp_path):
    """--pretrained_resnet_pth merges a torchvision-style .pth into the
    backbone subtree with strict=False semantics (reference
    resnet.py:186-196 always starts from ImageNet weights)."""
    import torch
    from test_torch_import import TorchResNet50
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.training.trainer import _load_pretrained_backbone

    torch.manual_seed(0)
    pth = tmp_path / "resnet50.pth"
    torch.save(TorchResNet50().state_dict(), pth)

    mean = jnp.asarray(assets.load_mean_params())
    model = EncoderTransformer(mean_params=mean, heads=2, token_dim=64,
                               use_pallas=False)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    before = np.asarray(
        variables["params"]["main_encoder"]["conv1"]["kernel"]).copy()
    head_before = np.asarray(
        variables["params"]["regressor"]["kernel"]).copy()
    params, bstats = _load_pretrained_backbone(
        str(pth), variables["params"], variables["batch_stats"])
    after = np.asarray(params["main_encoder"]["conv1"]["kernel"])
    assert np.abs(after - before).max() > 1e-4, "backbone not updated"
    np.testing.assert_array_equal(
        np.asarray(params["regressor"]["kernel"]), head_before)
    sd = torch.load(pth, weights_only=False)
    np.testing.assert_allclose(
        after, sd["conv1.weight"].numpy().transpose(2, 3, 1, 0),
        rtol=1e-6)


@pytest.mark.slow
def test_trainer_debug_grid_and_csv(tmp_path, monkeypatch):
    """One synthetic epoch with --debug: the GT/pred grid named by
    --debug_img appears (reference train.py:211-222) and metrics.csv is
    written with the printed quantities."""
    monkeypatch.chdir(tmp_path)
    from scat_tpu.training.trainer import Trainer
    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  batch_size=8, epoch=1, steps_per_epoch=2,
                  compute_dtype="float32", use_pallas_attention=False,
                  synthetic_data=True, debug=True,
                  debug_img="unittest", log_every=1,
                  checkpoint_folder=str(tmp_path / "ckpt"))
    Trainer(opt, image_size=64).train()
    assert os.path.exists("debug_img/debug_gt_pred_unittest.png")
    csv_path = tmp_path / "ckpt" / "metrics.csv"
    assert csv_path.exists()
    header = csv_path.read_text().splitlines()[0]
    for col in ("loss", "loss_3d", "loss_2d", "loss_pl",
                "samples_per_sec"):
        assert col in header
    # both the async periodic save and the blocking final save must be
    # restorable full train states
    from scat_tpu.utils import checkpoint as ckpt_lib
    trainer = Trainer(opt, image_size=64)
    for name in (ckpt_lib.PERIODIC_NAME, ckpt_lib.FINAL_NAME):
        restored = ckpt_lib.restore_state(
            str(tmp_path / "ckpt" / name), trainer.state)
        assert restored is not None
        assert int(restored.step) == 2  # 1 epoch x 2 steps


@pytest.mark.slow
def test_profile_trace_capture(tmp_path):
    """--profile_trace_dir captures a steady-state jax.profiler trace
    (TensorBoard/XProf layout under plugins/profile/)."""
    from scat_tpu.training.trainer import Trainer
    trace_dir = tmp_path / "trace"
    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  batch_size=8, epoch=2, steps_per_epoch=3,
                  compute_dtype="float32", use_pallas_attention=False,
                  synthetic_data=True, log_every=10,
                  profile_trace_dir=str(trace_dir),
                  profile_trace_steps=2,
                  checkpoint_folder=str(tmp_path / "ckpt"))
    Trainer(opt, image_size=64).train()
    dumps = list(trace_dir.glob("plugins/profile/*/*"))
    assert dumps, f"no profiler dump under {trace_dir}"


@pytest.mark.slow
def test_multi_dataset_csv_logs_per_step_mean(tmp_path, monkeypatch):
    """With a ConcatDataset tuple the CSV 'loss' must be the PER-STEP
    mean (divide by steps in the window), not the reference's
    print-quirk of dividing by log_every (which inflates by the member
    count, train.py:224-234).  Stub the train step to a fixed loss so
    the expected mean is exact."""
    monkeypatch.chdir(tmp_path)
    from scat_tpu.data.multi import ConcatDataset
    from scat_tpu.data.synthetic import SyntheticDataset
    from scat_tpu.training.trainer import Trainer
    members = [SyntheticDataset(4, num_batches=2, seed=s, image_size=64)
               for s in (0, 1)]
    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  batch_size=4, epoch=1, steps_per_epoch=2,
                  compute_dtype="float32", use_pallas_attention=False,
                  log_every=1, synthetic_data=True,
                  checkpoint_folder=str(tmp_path / "ckpt"))
    trainer = Trainer(opt, image_size=64, dataset=ConcatDataset(*members))

    def fixed_step(state, batch):
        return state, {"loss": jnp.asarray(3.0),
                       "loss_3d": jnp.asarray(2.0),
                       "loss_2d": jnp.asarray(1.0),
                       "loss_pl": jnp.asarray(0.0),
                       "valid_frac": jnp.asarray(1.0),
                       "pred0_3d": jnp.zeros((21, 3)),
                       "pred0_2d": jnp.zeros((21, 2))}

    trainer.train_step = fixed_step
    trainer.train()
    lines = (tmp_path / "ckpt" / "metrics.csv").read_text().splitlines()
    header = lines[0].split(",")
    row = dict(zip(header, lines[1].split(",")))
    # 2 members x fixed loss 3.0 in a 1-outer-iteration window: the
    # honest per-step mean is 3.0; the log_every divisor would say 6.0
    assert abs(float(row["loss"]) - 3.0) < 1e-6, row
    assert abs(float(row["loss_3d"]) - 2.0) < 1e-6, row
