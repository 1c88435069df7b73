"""HO-3D loader end-to-end on a synthetic v2 fixture tree (closes the
round-2 gap of the one untested dataset path).  Label math sources:
reference load_test_dataset.py:33-53 (OpenGL-coords projection with the
y/z sign flip), :91-103 (bone-pinned rescale), :23-28 (MANO->Simple
joint reorder), train.py:193-196 (166-float layout); disk layout is the
public HO-3D v2 tree (train/{seq}/rgb + meta/*.pkl with handJoints3D /
handPose / handBeta / camMat)."""

import os
import pickle

import numpy as np
import pytest

from scat_tpu.config import Options
from scat_tpu.data import ho3d

CAM_K = np.array([[614.6, 0., 320.], [0., 614.6, 240.], [0., 0., 1.]])


def _write_synthetic_ho3d(tmp_path, seqs=("ABF10",), frames=6,
                          img_w=640, img_h=480, labeled=True,
                          split="train"):
    """Tiny HO-3D v2 tree.  Joints are authored in OpenGL camera coords
    (y up, z toward viewer -> negative depth), like the real dataset."""
    rng = np.random.RandomState(42)
    root = tmp_path / "HO3D"
    metas = {}
    from PIL import Image
    for seq in seqs:
        rgb = root / split / seq / "rgb"
        meta_d = root / split / seq / "meta"
        rgb.mkdir(parents=True)
        meta_d.mkdir(parents=True)
        for i in range(frames):
            # MANO-order joints in front of the OpenGL camera
            xyz = (rng.rand(21, 3) * 0.12 - 0.06
                   + np.array([0.0, 0.0, -0.55]))
            meta = {
                "handJoints3D": xyz if labeled else None,
                "handPose": rng.randn(48) * 0.1,
                "handBeta": rng.randn(10) * 0.05,
                "camMat": CAM_K,
            }
            metas[(seq, i)] = meta
            with open(meta_d / f"{i:04d}.pkl", "wb") as f:
                pickle.dump(meta, f)
            img = (rng.rand(img_h, img_w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(rgb / f"{i:04d}.png")
    return root, metas


def _reference_label_f64(meta):
    """Float64 re-execution of the reference label chain:
    project_3D_points with is_OpenGL_coords=True
    (load_test_dataset.py:33-53) and rescale_3d_joints (:91-103), after
    the MANO->Simple reorder (:23-28)."""
    xyz = np.asarray(meta["handJoints3D"], np.float64)[
        ho3d.jointsMapManoToSimple]
    coord_change = np.array([[1., 0., 0.], [0., -1., 0.], [0., 0., -1.]])
    cam = np.asarray(meta["camMat"], np.float64)
    pts = xyz.dot(coord_change.T).dot(cam.T)
    j2d = np.stack([pts[:, 0] / pts[:, 2], pts[:, 1] / pts[:, 2]], 1)
    ref_len = 0.03058954
    l = np.linalg.norm(xyz[4] - xyz[5])
    j3d = xyz * (ref_len / l)
    j3d = j3d - j3d[1]
    j3d = j3d * np.array([1., -1., -1.])
    return j3d, j2d


def test_sample_labels_match_reference_f64(tmp_path):
    root, metas = _write_synthetic_ho3d(tmp_path)
    ds = ho3d.HO3DDataset(str(root), "train", batch_size=2,
                          shuffle=False)
    assert len(ds.samples) == 6
    for (rgb_path, meta_path) in ds.samples[:3]:
        with open(meta_path, "rb") as f:
            meta = pickle.load(f)
        label, j2d = ds.sample_labels(meta_path)
        assert label.shape == (166,)
        want_3d, want_2d = _reference_label_f64(meta)
        np.testing.assert_allclose(
            label[61:124].reshape(21, 3), want_3d, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(j2d, want_2d, rtol=1e-4)
        # pose/shape pass through raw (no 180deg x-rotation here: HO-3D
        # pose already lives in the OpenCV-style frame the reorder maps
        # into; the sign handling is in the projection, not the pose)
        np.testing.assert_allclose(label[3:51], meta["handPose"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(label[51:61], meta["handBeta"],
                                   rtol=1e-5, atol=1e-6)


def test_reorder_is_mano_to_simple(tmp_path):
    """The wrist stays put and e.g. Simple slot 1 takes MANO joint 13
    (thumb MCP) — a wrong or identity reorder would corrupt every
    stage-1/2/5 training label silently."""
    root, metas = _write_synthetic_ho3d(tmp_path, frames=1)
    ds = ho3d.HO3DDataset(str(root), "train", batch_size=1,
                          shuffle=False)
    meta_path = ds.samples[0][1]
    with open(meta_path, "rb") as f:
        meta = pickle.load(f)
    xyz = np.asarray(meta["handJoints3D"])
    label, _ = ds.sample_labels(meta_path)
    j3d = label[61:124].reshape(21, 3)
    # undo the rescale to compare orderings: ratios of bone directions
    # are order-sensitive, so check the root-centered direction of
    # Simple slot k against MANO joint map[k]
    centered = (xyz - xyz[ho3d.jointsMapManoToSimple][1])
    for k, m in enumerate(ho3d.jointsMapManoToSimple):
        a = j3d[k] * np.array([1., -1., -1.])
        b = centered[m]
        if np.linalg.norm(a) < 1e-9:
            continue
        cos = a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.9999, (k, m, cos)


@pytest.mark.slow
def test_ho3d_batch_end_to_end(tmp_path):
    root, metas = _write_synthetic_ho3d(tmp_path, frames=4)
    ds = ho3d.HO3DDataset(str(root), "train", batch_size=2,
                          shuffle=False)
    assert len(ds) == 2
    batch = next(iter(ds))
    assert batch["image"].shape == (2, 224, 224, 3)
    assert batch["label"].shape == (2, 166)
    img = np.asarray(batch["image"])
    assert img.min() >= -1.0 and img.max() <= 1.0
    lab = np.asarray(batch["label"])
    j3d = lab[:, 61:124].reshape(2, 21, 3)
    np.testing.assert_allclose(j3d[:, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(j3d[:, 4] - j3d[:, 5], axis=1), 0.03058954,
        rtol=1e-4)
    # 2D labels live in CROP pixels (the fused pipeline remaps them);
    # all joints must land inside the 224 crop
    j2d = lab[:, 124:].reshape(2, 21, 2)
    assert (j2d >= -1.0).all() and (j2d <= 225.0).all()


def test_eval_split_probe_labeled_vs_unlabeled(tmp_path, capsys):
    """get_loader_ho3d: a labeled evaluation split is selected; an
    unlabeled one (handJoints3D=None, the public release) falls back to
    train with a warning instead of swallowing the error."""
    root, _ = _write_synthetic_ho3d(tmp_path, frames=2, split="train")
    _write_synthetic_ho3d(tmp_path, seqs=("SM1",), frames=2,
                          split="evaluation", labeled=True)
    opt = Options(data_dir=str(root), batch_size=2)
    ds = ho3d.get_loader_ho3d("val", 2, opt)
    assert ds.split == "evaluation"

    # now an unlabeled evaluation tree
    import shutil
    shutil.rmtree(root / "evaluation")
    _write_synthetic_ho3d(tmp_path, seqs=("SM1",), frames=2,
                          split="evaluation", labeled=False)
    ds = ho3d.get_loader_ho3d("val", 2, opt)
    out = capsys.readouterr().out
    assert ds.split == "train"
    assert "unlabeled" in out


def test_factory_training_stage_uses_train_split(tmp_path):
    root, _ = _write_synthetic_ho3d(tmp_path, frames=2)
    opt = Options(data_dir=str(root), batch_size=2)
    ds = ho3d.get_loader_ho3d("training", 2, opt)
    assert ds.split == "train"
    assert ds.shuffle
