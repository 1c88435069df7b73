"""Evaluator aggregation parity: the batch-accumulated PCK/AUC/MPJPE
protocol (reference eval.py:998,1026-1029) re-executed end to end, plus
the 166-wide label path."""

import numpy as np
import jax
import jax.numpy as jnp

from scat_tpu import assets
from scat_tpu.config import Options
from scat_tpu.data.synthetic import synth_batch
from scat_tpu.evaluation.evaluator import Evaluator, RNGE
from scat_tpu.models.hand_net import EncoderTransformer
from scat_tpu.ops import metrics as metrics_lib
from scat_tpu.training import steps
import pytest


class _Labels166Dataset:
    """Wrap synthetic batches into the FreiHAND/HO-3D 166-float layout
    (reference train.py:193-196)."""

    def __init__(self, n=2, bs=4, img=64):
        self.batches = []
        mean = assets.load_mean_params()
        for i in range(n):
            b = synth_batch(jax.random.key(i), bs, img, mean)
            lab = np.zeros((bs, 166), np.float32)
            l105 = np.asarray(b["label"])
            lab[:, 61:124] = l105[:, :63]
            lab[:, 124:] = l105[:, 63:]
            self.batches.append({"image": b["image"],
                                 "label": jnp.asarray(lab),
                                 "valid": b["valid"]})

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


@pytest.mark.slow
def test_evaluator_aggregation_matches_manual(tmp_path, rng):
    mean = assets.load_mean_params()
    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  batch_size=4, compute_dtype="float32",
                  use_pallas_attention=False,
                  result_dir=str(tmp_path))
    ds = [synth_batch(jax.random.key(i), 4, 64, mean) for i in range(3)]
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, token_dim=64,
                               use_pallas=False)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        ds[0]["image"])
    ev = Evaluator(opt, image_size=64, dataset=ds, variables=variables)
    # monkeypatch the evaluator's model to the matching token_dim one
    ev.model = model
    ev.eval_step = jax.jit(steps.make_eval_step(
        model, pck_range=tuple(int(r) for r in RNGE)))
    res = ev.eval()

    # manual re-execution of the aggregation protocol
    step = jax.jit(steps.make_eval_step(
        model, pck_range=tuple(int(r) for r in RNGE)))
    pck_all = np.zeros((len(RNGE), 22))
    errs = []
    for b in ds:
        out = step(variables["params"], variables["batch_stats"], b)
        pck_all += np.asarray(out["pck"])
        errs.append(np.asarray(out["mpjpe_per_sample"]))
    pck_all /= len(ds)
    want_auc = float(metrics_lib.area_under_curve(
        jnp.asarray(RNGE / RNGE.max(), jnp.float32),
        jnp.asarray(pck_all[:, -1], jnp.float32)))
    want_mpjpe = 1000 * np.concatenate(errs).mean()
    np.testing.assert_allclose(res["auc"], want_auc, rtol=1e-5)
    np.testing.assert_allclose(res["mpjpe_mm"], want_mpjpe, rtol=1e-5)
    # PCK.png written (reference eval.py:1031-1047)
    assert (tmp_path / "PCK.png").exists()


@pytest.mark.slow
def test_eval_step_166_labels(rng):
    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, token_dim=64, use_pallas=False)
    ds = _Labels166Dataset()
    b = next(iter(ds))
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        b["image"])
    step = jax.jit(steps.make_eval_step(model))
    out = step(variables["params"], variables["batch_stats"], b)
    assert np.all(np.isfinite(np.asarray(out["mpjpe_per_sample"])))


def test_injected_dataset_rejects_name(tmp_path):
    """eval(eval_dataset=...) with an injected dataset would be silently
    ignored — it must raise instead (the argument is honored now)."""
    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  batch_size=4, compute_dtype="float32",
                  use_pallas_attention=False,
                  checkpoint_path_eval="/nonexistent",
                  result_dir=str(tmp_path / "res"))
    ds = _Labels166Dataset(n=1, bs=4, img=64)
    ev = Evaluator(opt, image_size=64, dataset=ds)
    with pytest.raises(ValueError, match="injected dataset"):
        ev.eval("STB")
