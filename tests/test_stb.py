"""STB label-math golden tests against the reference formulas
(reference dataset/load_STB.py) using a synthetic annotation pickle."""

import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from scat_tpu.config import Options
from scat_tpu.data import stb


def test_sk_rot_matches_reference_formula():
    # reference load_STB.py:112-131 re-executed
    import math
    rot_vec = [0.00531, -0.01196, 0.00301]
    theta = np.linalg.norm(rot_vec)
    vector = np.array(rot_vec) * math.sin(theta / 2.0) / theta
    a = math.cos(theta / 2.0)
    b, c, d = -vector
    want = np.array([
        [a*a+b*b-c*c-d*d, 2*(b*c+a*d), 2*(b*d-a*c)],
        [2*(b*c-a*d), a*a+c*c-b*b-d*d, 2*(c*d+a*b)],
        [2*(b*d+a*c), 2*(c*d-a*b), a*a+d*d-b*b-c*c]])
    np.testing.assert_allclose(stb.SK_ROT, want, atol=1e-12)


def test_depth2color_transform(rng):
    xyz = rng.rand(4, 21, 3) * 500
    got = stb.sk_xyz_depth2color(xyz)
    want = (xyz - np.tile(stb.SK_TRANS_VEC, (4, 21, 1))).dot(stb.SK_ROT)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_palm2wrist(rng):
    pose = rng.rand(3, 21, 3)
    got = stb.palm2wrist(pose.copy())
    root, ring = 0, 13  # palm_L, ring_L_01 in Snap order
    want = pose.copy()
    want[:, root] = pose[:, ring] + 2.0 * (pose[:, root] - pose[:, ring])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_stb_to_snap_reorder():
    # STB lists fingers pinky->thumb; Snap thumb->pinky.  Round trip:
    snap = np.asarray(stb.STB_TO_SNAP_ID)
    assert sorted(snap.tolist()) == list(range(21))
    assert snap[0] == 0           # palm stays root
    assert snap[1] == 17          # STB pinky_01 -> Snap index 17


def test_joint_order_maps():
    assert sorted(stb.jointsMapSimpleToSMPLX) == list(range(21))
    assert sorted(stb.jointsMapSMPLXToMano) == list(range(21))


def _write_synthetic_stb(tmp_path, n=8):
    rng = np.random.RandomState(0)
    for seq in ["B2Counting", "B2Random", "B3Counting", "B3Random",
                "B4Counting", "B4Random", "B5Counting", "B5Random",
                "B6Counting", "B6Random", "B1Counting", "B1Random"]:
        d = tmp_path / seq
        d.mkdir(exist_ok=True)
        labels = tmp_path / "labels"
        labels.mkdir(exist_ok=True)
        # plausible camera-frame hand positions (mm, in front of camera)
        hand = (rng.rand(3, 21, n) * 100
                + np.array([0, 0, 500])[:, None, None])
        with open(labels / f"{seq}_SK.pkl", "wb") as f:
            pickle.dump({"handPara": hand}, f)
        from PIL import Image
        for i in range(n):
            img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"SK_color_{i}.png")
    return tmp_path


@pytest.mark.slow
def test_stb_dataset_end_to_end(tmp_path):
    data_dir = str(_write_synthetic_stb(tmp_path))
    opt = Options(data_dir=data_dir, batch_size=4)
    ds = stb.get_loader_STB("training", bs=4, opt=opt)
    assert len(ds) > 0
    batch = next(iter(ds))
    assert batch["image"].shape == (4, 224, 224, 3)
    assert batch["label"].shape == (4, 105)
    img = np.asarray(batch["image"])
    assert img.min() >= -1.0 and img.max() <= 1.0
    # 3D label invariants from rescale_3d_joints_flip
    j3d = np.asarray(batch["label"])[:, :63].reshape(4, 21, 3)
    np.testing.assert_allclose(j3d[:, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(j3d[:, 4] - j3d[:, 5], axis=1), 0.03058954,
        rtol=1e-4)
    # eval loader hits B1 sequences
    ev = stb.get_loader_STB_eval(opt)
    b2 = next(iter(ev))
    assert b2["label"].shape[1] == 105


def test_concat_dataset_zips():
    from scat_tpu.data.multi import ConcatDataset

    a = [1, 2, 3]
    b = ["x", "y"]
    cd = ConcatDataset(a, b)
    assert len(cd) == 2
    assert list(cd) == [(1, "x"), (2, "y")]


def test_stb_dataset_rotation_batched(tmp_path):
    """rotation=True with batch_size > 1 exercises the batched [B,2,3]
    affine against [B,21,3] joints (regression: rotate_joints_3d
    broadcast crash)."""
    data_dir = str(_write_synthetic_stb(tmp_path))
    opt = Options(data_dir=data_dir, batch_size=4)
    ds = stb.STBDataset("STB_train", data_dir=data_dir, batch_size=4,
                        rotation=True, shuffle=False, opt=opt,
                        use_native=False)
    batch = next(iter(ds))
    assert batch["image"].shape == (4, 224, 224, 3)
    assert batch["label"].shape == (4, 105)
    assert np.isfinite(np.asarray(batch["label"])).all()
