"""Fixture-tree tests for the re-derived MHP and RHD loaders
(scat_tpu/data/mhp.py, scat_tpu/data/rhd.py) — the reference imports
both modules but ships neither (SURVEY.md "Missing modules").

Synthetic trees follow each dataset's public release layout; the tests
drive the full loader path (decode -> extrinsics/projection or
annotation parse -> fused crop -> 105-label pack) exactly like
tests/test_stb.py and tests/test_freihand.py do for their datasets.
"""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from scat_tpu.data.mhp import (MHPDataset, mhp_eval, normalize_3d_joints,
                               project_points, read_joints_txt,
                               world_to_camera)
from scat_tpu.data.rhd import RHD_TO_SNAP, RHDDataset, get_loader_RHD


# ----------------------------------------------------------------------
# fixtures
# ----------------------------------------------------------------------

def _hand_points(rng, depth=600.0):
    """21 world-frame points (mm) loosely shaped like a hand in front of
    the default camera."""
    pts = rng.randn(21, 3).astype(np.float32) * 30.0
    pts[:, 2] += depth
    return pts


def _write_mhp_tree(root, rng, n_frames=5, cams=(1, 2)):
    seq = "data_3"
    frames = os.path.join(root, "annotated_frames", seq)
    os.makedirs(frames)
    for cam in cams:
        calib = os.path.join(root, "calibrations", seq, f"webcam_{cam}")
        os.makedirs(calib)
        rvec = rng.randn(3).astype(np.float32) * 0.05
        tvec = np.array([0, 0, 50.0 * cam], np.float32)
        with open(os.path.join(calib, "rvec.pkl"), "wb") as f:
            pickle.dump(rvec, f)
        with open(os.path.join(calib, "tvec.pkl"), "wb") as f:
            pickle.dump(tvec, f)
    for i in range(n_frames):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        for cam in cams:
            Image.fromarray(img).save(
                os.path.join(frames, f"{i}_webcam_{cam}.jpg"))
        joints = _hand_points(rng)
        with open(os.path.join(frames, f"{i}_joints.txt"), "w") as f:
            for j, (x, y, z) in enumerate(joints):
                f.write(f"{j} {x} {y} {z}\n")
    return seq


def _write_rhd_tree(root, rng, n=6):
    split = "training"
    color = os.path.join(root, split, "color")
    os.makedirs(color)
    anno = {}
    for i in range(n):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(
            np.uint8)).save(os.path.join(color, f"{i:05d}.png"))
        xyz = np.concatenate([_hand_points(rng), _hand_points(rng)]) \
            / 1000.0
        uv = rng.rand(42, 2).astype(np.float32) * 64
        vis = np.ones((42, 1), np.float32)
        if i % 2:       # odd frames: only the right hand visible
            vis[:21] = 0.0
        anno[i] = {"xyz": xyz.astype(np.float32),
                   "uv_vis": np.concatenate([uv, vis], 1),
                   "K": np.eye(3, dtype=np.float32)}
    with open(os.path.join(root, split, f"anno_{split}.pickle"),
              "wb") as f:
        pickle.dump(anno, f)


# ----------------------------------------------------------------------
# MHP
# ----------------------------------------------------------------------

def test_mhp_joints_txt_parsing(tmp_path, rng):
    pts = _hand_points(rng)
    p = tmp_path / "j.txt"
    with open(p, "w") as f:
        for x, y, z in pts:       # bare x y z rows also accepted
            f.write(f"{x} {y} {z}\n")
    np.testing.assert_allclose(read_joints_txt(str(p)), pts, rtol=1e-5)


def test_mhp_world_to_camera_projection(rng):
    """Extrinsics follow the cv2 convention: X_cam = R X_w + t."""
    from scipy.spatial.transform import Rotation
    rvec = rng.randn(3).astype(np.float32) * 0.3
    tvec = rng.randn(3).astype(np.float32) * 10
    pts = _hand_points(rng)
    want = pts @ Rotation.from_rotvec(rvec).as_matrix().T.astype(
        np.float32) + tvec
    got = world_to_camera(pts, rvec, tvec)
    np.testing.assert_allclose(got, want, atol=1e-3)
    uv = project_points(np.array([[100.0, 0, 32], [0, 100.0, 32],
                                  [0, 0, 1]], np.float32), want)
    np.testing.assert_allclose(
        uv[:, 0], 100 * want[:, 0] / want[:, 2] + 32, rtol=1e-5)


def test_mhp_sequence_protocol(tmp_path, rng):
    _write_mhp_tree(str(tmp_path), rng)
    loader = mhp_eval("data_3_cam_1", data_dir=str(tmp_path))
    assert loader.seq_len() == 5
    img, kp2d, kp3d = loader.get_sample(0)
    assert img.shape == (64, 64, 3) and kp2d.shape == (21, 2)
    assert kp3d.shape == (21, 3)
    # 3D labels are normalized: root (joint 1) at origin, bone 4-5
    # pinned to the STB constant (reference load_STB.py:107)
    np.testing.assert_allclose(kp3d[1], 0.0, atol=1e-7)
    np.testing.assert_allclose(np.linalg.norm(kp3d[4] - kp3d[5]),
                               0.03058954, rtol=1e-5)


def test_mhp_dataset_batches(tmp_path, rng):
    _write_mhp_tree(str(tmp_path), rng)
    ds = MHPDataset(str(tmp_path), batch_size=4, shuffle=True, seed=0)
    assert len(ds.index) == 10      # 5 frames x 2 cameras
    batch = next(iter(ds))
    assert batch["image"].shape == (4, 224, 224, 3)
    assert batch["label"].shape == (4, 105)
    assert np.isfinite(np.asarray(batch["label"])).all()
    # crops are normalized to [-1, 1] (reference transform semantics)
    assert float(np.abs(np.asarray(batch["image"])).max()) <= 1.0 + 1e-5


def test_mhp_stage6_mix(tmp_path, rng, monkeypatch):
    _write_mhp_tree(str(tmp_path), rng)
    from scat_tpu.config import Options
    from scat_tpu.data.multi import concat_dataset
    opt = Options()
    opt.stage = 6
    opt.data_dir = os.path.join(str(tmp_path), "x")  # parent fallback
    monkeypatch.setattr("scat_tpu.data.mhp._mhp_root",
                        lambda o: str(tmp_path))
    ds = concat_dataset(4, opt)
    (batch,) = next(iter(ds))       # tuple-of-batches semantics
    assert batch["label"].shape == (4, 105)


# ----------------------------------------------------------------------
# RHD
# ----------------------------------------------------------------------

def test_rhd_reorder_is_permutation():
    assert sorted(RHD_TO_SNAP) == list(range(21))
    assert RHD_TO_SNAP[0] == 0                   # wrist stays first
    assert RHD_TO_SNAP[1:5] == [4, 3, 2, 1]      # thumb tip->palm flip


def test_rhd_dataset_and_left_hand_mirror(tmp_path, rng):
    _write_rhd_tree(str(tmp_path), rng)
    ds = RHDDataset(str(tmp_path), "training", batch_size=3,
                    shuffle=False, min_visible=11)
    # 6 frames: even ones contribute both hands, odd only the right
    assert len(ds.samples) == 9
    img_r, kp2d_r, kp3d_r = ds.get_sample(
        ds.samples.index((0, 1)))
    img_l, kp2d_l, kp3d_l = ds.get_sample(
        ds.samples.index((0, 0)))
    assert img_l.shape == img_r.shape == (64, 64, 3)
    # the left-hand image is u-mirrored relative to the frame
    raw = np.asarray(Image.open(
        os.path.join(str(tmp_path), "training", "color", "00000.png")))
    np.testing.assert_array_equal(img_l, raw[:, ::-1])
    np.testing.assert_array_equal(img_r, raw)
    # normalization invariants hold for both hands
    for kp3d in (kp3d_r, kp3d_l):
        np.testing.assert_allclose(kp3d[1], 0.0, atol=1e-7)
        np.testing.assert_allclose(np.linalg.norm(kp3d[4] - kp3d[5]),
                                   0.03058954, rtol=1e-5)
    batch = next(iter(ds))
    assert batch["image"].shape == (3, 224, 224, 3)
    assert batch["label"].shape == (3, 105)
    assert np.isfinite(np.asarray(batch["label"])).all()


@pytest.mark.slow
def test_mhp_demo_runner_end_to_end(tmp_path, rng):
    """The full temporal demo flow (reference eval.py:587-786) over an
    MHP fixture sequence: fixed-window crop, forward, feature-map tiles,
    3-panel plots, PCK/AUC/MPJPE aggregation, video export."""
    import jax
    import jax.numpy as jnp
    from scat_tpu.config import Options
    from scat_tpu.evaluation.demo import DemoRunner

    _write_mhp_tree(str(tmp_path / "mhp"), rng, n_frames=3, cams=(1,))
    loader = mhp_eval("data_3_cam_1",
                      data_dir=str(tmp_path / "mhp"))
    opt = Options()
    opt.net = "reg_transformer"
    opt.vit_heads = 2
    opt.compute_dtype = "float32"
    opt.result_dir = str(tmp_path / "out")
    os.makedirs(opt.result_dir, exist_ok=True)

    from scat_tpu.models import build_model
    model, _ = build_model(opt, 64)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1),
         "dropout": jax.random.key(2)}, sample, train=False)
    runner = DemoRunner(opt, variables=variables, loader=loader,
                        image_size=64)
    runner.demo()
    out = tmp_path / "out"
    assert (out / "fm" / "001.png").exists()          # feature tiles
    assert (out / "3d" / "gt_pred_001.png").exists()  # 3-panel plot
    assert (out / "PCK.png").exists()


def test_mhp_stage6_empty_tree_fails_loudly(tmp_path, monkeypatch):
    """An absent MHP tree must raise, not hand the trainer a
    zero-length dataset that 'finishes' untrained."""
    from scat_tpu.config import Options
    from scat_tpu.data.multi import concat_dataset
    opt = Options()
    opt.stage = 6
    opt.data_dir = str(tmp_path / "nothing")
    monkeypatch.setattr("scat_tpu.data.mhp._mhp_root",
                        lambda o: str(tmp_path / "nothing"))
    with pytest.raises(FileNotFoundError):
        concat_dataset(4, opt)


def test_rhd_missing_tree_is_empty(tmp_path):
    from scat_tpu.config import Options
    opt = Options()
    opt.data_dir = str(tmp_path)
    ds = get_loader_RHD("training", 4, opt)
    assert len(ds) == 0


def test_demo_unknown_eval_set_fails_loudly(tmp_path):
    """--eval_dataset frei is legal for the Evaluator but has no demo
    sequence (reference eval.py:601-614); demo() must say so instead of
    dying with a bare KeyError."""
    import jax
    import jax.numpy as jnp
    from scat_tpu.config import Options
    from scat_tpu.evaluation.demo import DemoRunner
    from scat_tpu.models import build_model

    opt = Options()
    opt.net = "reg_transformer"
    opt.vit_heads = 2
    opt.compute_dtype = "float32"
    opt.eval_dataset = "frei"
    opt.result_dir = str(tmp_path / "out")
    model, _ = build_model(opt, 64)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1),
         "dropout": jax.random.key(2)}, sample, train=False)
    runner = DemoRunner(opt, variables=variables, image_size=64)
    with pytest.raises(ValueError, match="no demo sequence"):
        runner.demo()
