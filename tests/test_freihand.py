"""FreiHAND loader end-to-end on a synthetic fixture tree (mirrors
tests/test_stb.py's STB fixture; fixes the round-1 gap of an untested
image path).  Label math sources: reference load_test_dataset.py:33-53
(projection), :91-103 (rescale), :159-167 (pose rotation);
train.py:193-196 (166-float layout)."""

import json
import os

import numpy as np
import pytest

from scat_tpu.config import Options
from scat_tpu.data import freihand


def _write_synthetic_frei(tmp_path, n=8, img_size=128):
    rng = np.random.RandomState(0)
    root = tmp_path / "FreiHAND"
    rgb = root / "training" / "rgb"
    rgb.mkdir(parents=True)
    K = np.tile(np.array([[480., 0, 112], [0, 480., 112], [0, 0, 1]]),
                (n, 1, 1))
    xyz = rng.rand(n, 21, 3) * 0.08 + np.array([0, 0, 0.5])
    mano = rng.randn(n, 1, 58).astype(np.float64) * 0.1
    with open(root / "training_K.json", "w") as f:
        json.dump(K.tolist(), f)
    with open(root / "training_xyz.json", "w") as f:
        json.dump(xyz.tolist(), f)
    with open(root / "training_mano.json", "w") as f:
        json.dump(mano.tolist(), f)
    from PIL import Image
    for i in range(n):
        img = (rng.rand(img_size, img_size, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(rgb / f"{i:08d}.jpg")
    return root, K, xyz, mano


def test_freihand_dataset_end_to_end(tmp_path):
    root, K, xyz, mano = _write_synthetic_frei(tmp_path)
    ds = freihand.FreiHANDDataset(str(root), "training", batch_size=4,
                                  shuffle=False, color_jitter=False)
    assert len(ds) == 2
    batch = next(iter(ds))
    assert batch["image"].shape == (4, 224, 224, 3)
    assert batch["label"].shape == (4, 166)
    img = np.asarray(batch["image"])
    assert img.min() >= -1.0 and img.max() <= 1.0

    lab = np.asarray(batch["label"])
    # 3D block: root-centered at joint 1, bone 4-5 pinned
    j3d = lab[:, 61:124].reshape(4, 21, 3)
    np.testing.assert_allclose(j3d[:, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(j3d[:, 4] - j3d[:, 5], axis=1), 0.03058954,
        rtol=1e-4)
    # 2D block: pinhole projection of the raw (unrescaled) xyz with K,
    # rescaled with the image when the loader resizes to 224 (labels
    # must track the pixels they annotate)
    scale = 224.0 / 128  # fixture img_size
    for b in range(4):
        proj = xyz[b].dot(K[b].T)
        want = proj[:, :2] / proj[:, 2:] * scale
        np.testing.assert_allclose(lab[b, 124:].reshape(21, 2), want,
                                   rtol=1e-4)
    # pose block: global orient is the MANO rotvec composed with a
    # 180deg x rotation; hand pose body passes through
    np.testing.assert_allclose(lab[0, 3:51][3:],
                               mano[0, 0, 3:48], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        lab[0, 3:51][:3],
        freihand.rotate_pose(mano[0, 0, :48].astype(np.float32))[:3],
        rtol=1e-4)
    np.testing.assert_allclose(lab[0, 51:61], mano[0, 0, 48:58],
                               rtol=1e-4, atol=1e-6)


def test_freihand_resize_is_bilinear(tmp_path):
    """The upsample to 224 must match torchvision Resize's bilinear
    filter, not PIL's bicubic default."""
    root, *_ = _write_synthetic_frei(tmp_path, n=1, img_size=64)
    ds = freihand.FreiHANDDataset(str(root), "training", batch_size=1,
                                  shuffle=False, color_jitter=False)
    from PIL import Image
    src = Image.open(root / "training" / "rgb" / "00000000.jpg"
                     ).convert("RGB")
    want = np.asarray(src.resize((224, 224), Image.BILINEAR))
    got = ds._load_image(0)
    np.testing.assert_array_equal(got, want)
    bad = np.asarray(src.resize((224, 224), Image.BICUBIC))
    assert np.abs(got.astype(int) - bad.astype(int)).max() > 0


def test_get_loader_frei_factory(tmp_path):
    root, *_ = _write_synthetic_frei(tmp_path)
    opt = Options(data_dir=str(tmp_path / "STB"), batch_size=4)
    ds = freihand.get_loader_frei("training", 4, opt)
    assert isinstance(ds, freihand.FreiHANDDataset)
    assert ds.data_dir == str(root)
    # training stage augments + shuffles
    assert ds.color_jitter and ds.shuffle


def test_eval_loader_is_deterministic_and_unaugmented(tmp_path):
    """The eval path reads the TRAINING split (reference quirk,
    eval.py:793) but must not jitter or shuffle — round 3 caught eval
    batches going through color_jitter_np, inflating MPJPE and making
    eval numbers vary with the epoch counter (reference eval transform
    is plain, load_test_dataset.py:81-89; DataLoader shuffle=False)."""
    _write_synthetic_frei(tmp_path)
    opt = Options(data_dir=str(tmp_path / "STB"), batch_size=4,
                  eval_dataset="frei")
    from scat_tpu.training.trainer import make_dataset
    ds = make_dataset(opt, 224, training=False)
    assert isinstance(ds, freihand.FreiHANDDataset)
    assert not ds.color_jitter and not ds.shuffle
    # non-training stages (the _eval factory) default the same way
    ds2 = freihand.get_loader_frei("val", 4, opt)
    assert not ds2.color_jitter and not ds2.shuffle


def test_rotate_pose_param_quaternion_reexec():
    """float64 re-execution of reference rotation.py:61-91: rotvec ->
    [w,x,y,z] quaternion, Hamilton-product with the z-axis quaternion of
    angle (360-angle)deg, back to rotvec via the canonical branch."""
    rng = np.random.RandomState(3)

    def quat_from_rotvec(v):
        th = np.linalg.norm(v)
        if th < 1e-12:
            return np.array([1.0, 0, 0, 0])
        ax = v / th
        return np.concatenate([[np.cos(th / 2)], np.sin(th / 2) * ax])

    def hamilton(q1, q2):
        w1, x1, y1, z1 = q1
        w2, x2, y2, z2 = q2
        return np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])

    def rotvec_from_quat(q):
        if q[0] < 0:
            q = -q  # canonical branch (theta <= pi), scipy's convention
        s = np.linalg.norm(q[1:])
        if s < 1e-12:
            return np.zeros(3)
        th = 2.0 * np.arctan2(s, q[0])
        return q[1:] / s * th

    for angle in (0.0, 17.5, 90.0, 180.0, 273.0, 360.0):
        pose = rng.randn(48).astype(np.float64) * 0.7
        got = freihand.rotate_pose_param(pose.copy(), angle)
        # oracle: q1 (z-axis, (360-angle) rad-converted) * q(pose[:3])
        a = np.pi * (360.0 - angle) / 180.0
        q1 = quat_from_rotvec(np.array([0.0, 0.0, a]))
        want3 = rotvec_from_quat(hamilton(q1, quat_from_rotvec(pose[:3])))
        np.testing.assert_allclose(got[:3], want3, rtol=1e-9, atol=1e-9)
        # the hand-pose body must pass through untouched
        np.testing.assert_array_equal(got[3:], pose[3:])


def test_freihand_native_path_matches_pil(tmp_path):
    """224x224 trees (the real dataset's frame size) ride the native
    C++ decode pool; output must match the PIL path exactly — identity
    warp at integer sample points, same normalize constant
    (2/255 == 1/127.5), same shuffle and jitter streams."""
    from scat_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip("native library unavailable")
    root, *_ = _write_synthetic_frei(tmp_path, n=8, img_size=224)
    kw = dict(batch_size=4, shuffle=True, seed=3)
    ds_n = freihand.FreiHANDDataset(str(root), "training",
                                    use_native=True, **kw)
    ds_p = freihand.FreiHANDDataset(str(root), "training",
                                    use_native=False, **kw)
    assert ds_n.use_native and not ds_p.use_native
    n_batches = 0
    for bn, bp in zip(ds_n, ds_p):
        np.testing.assert_allclose(np.asarray(bn["image"]),
                                   np.asarray(bp["image"]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(bn["label"]),
                                      np.asarray(bp["label"]))
        np.testing.assert_array_equal(np.asarray(bn["valid"]),
                                      np.ones(4, np.float32))
        n_batches += 1
    assert n_batches == 2


def test_freihand_non224_keeps_pil_resize_parity(tmp_path):
    """Non-224 trees must NOT take the native path: the torchvision
    Resize(BILINEAR) contract (test_freihand_resize_is_bilinear) only
    holds on the PIL path — the native warp zero-fills borders where
    PIL's resize clamps."""
    root, *_ = _write_synthetic_frei(tmp_path, n=4, img_size=128)
    ds = freihand.FreiHANDDataset(str(root), "training", batch_size=2)
    assert not ds.use_native
