"""The 166-wide (FreiHAND/HO-3D) label layout end-to-end on synthetic
data.

The fixture-tree tests exercise the REAL frei/ho3d loaders; this file
exercises the 166 branch of the label dispatch (losses.split_labels,
reference train.py:188-196) through the full train->eval drivers, which
previously only ever saw 105-wide synthetic labels.
"""
import dataclasses

import jax
import numpy as np
import pytest

from scat_tpu.config import Options
from scat_tpu.data.synthetic import synth_batch
from scat_tpu.models import losses


def test_frei_layout_matches_stb_views():
    """Same key => identical images and identical 3D/2D views; the frei
    layout only re-packs them at the [cam|pose|shape|3D|2D] offsets
    (freihand.pack_label_166)."""
    key = jax.random.key(7)
    stb = synth_batch(key, 4, image_size=64, layout="stb")
    frei = synth_batch(key, 4, image_size=64, layout="frei")
    assert stb["label"].shape == (4, 105)
    assert frei["label"].shape == (4, 166)
    np.testing.assert_array_equal(np.asarray(stb["image"]),
                                  np.asarray(frei["image"]))
    sv = losses.split_labels(stb["label"])
    fv = losses.split_labels(frei["label"])
    np.testing.assert_array_equal(np.asarray(sv.joints_3d),
                                  np.asarray(fv.joints_3d))
    np.testing.assert_array_equal(np.asarray(sv.joints_2d),
                                  np.asarray(fv.joints_2d))
    assert sv.pose is None
    # global-orient dofs carry the actual rotation; local pose is zero
    pose = np.asarray(fv.pose)
    assert pose.shape == (4, 48)
    assert np.abs(pose[:, :3]).max() > 0
    np.testing.assert_array_equal(pose[:, 3:], 0)


def test_bad_layout_rejected():
    with pytest.raises(ValueError, match="layout"):
        synth_batch(jax.random.key(0), 2, image_size=32, layout="ho3d")


def test_train_then_eval_on_166_labels(tmp_path, monkeypatch):
    """Short flagship training run on 166-wide labels learns (loss
    drops) and the evaluator consumes the same layout (finite MPJPE,
    PCK curve populated)."""
    monkeypatch.chdir(tmp_path)
    from scat_tpu.training.trainer import Trainer
    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  batch_size=8, epoch=2, steps_per_epoch=4,
                  compute_dtype="float32", use_pallas_attention=False,
                  synthetic_data=True, synthetic_layout="frei",
                  l_weight_3d=1e5, l_weight_2d=10.0, lr=1e-3,
                  log_every=1,
                  checkpoint_folder=str(tmp_path / "ckpt"),
                  result_dir=str(tmp_path / "out"))
    trainer = Trainer(opt, image_size=64)
    trainer.train()
    csv_rows = (tmp_path / "ckpt" / "metrics.csv").read_text().splitlines()
    header = csv_rows[0].split(",")
    li = header.index("loss")
    first, last = float(csv_rows[1].split(",")[li]), \
        float(csv_rows[-1].split(",")[li])
    assert last < first, (first, last)

    from scat_tpu.evaluation.evaluator import Evaluator
    from scat_tpu.data.synthetic import SyntheticDataset
    eval_opt = dataclasses.replace(opt, seed=123)
    ev = Evaluator(eval_opt, image_size=64,
                   dataset=SyntheticDataset(8, num_batches=2, seed=123,
                                            image_size=64,
                                            layout="frei"),
                   variables={"params": trainer.state.params,
                              "batch_stats": trainer.state.batch_stats,
                              "constants": trainer.state.constants})
    res = ev.eval()
    assert np.isfinite(res["mpjpe_mm"]) and res["mpjpe_mm"] > 0
    assert 0 < res["auc"] <= 100
