"""Literal-source oracles for the STB label/augmentation math
(dataset/load_STB.py, dataset/rotation.py).

These modules never imported here before because of three missing
third-party deps, none of which touches the math under test: ``oss2``
(remote storage, unused), ``torchvision.transforms`` (only inside
get_transform, never called here), and ``pyquaternion`` (backed by
literal_ref.ScipyQuaternion — the plain Hamilton product — so the
literal quaternion code RUNS).  With those stubbed, the central STB
functions run literally as oracles for our fused-affine formulations:
hand_flip, crop_hand, rescale_3d_joints_flip, rotate_img,
rotate_pose_param, motion_blur, and the joint-order tables.
"""

import random as random_mod

import numpy as np
import pytest
import torch  # noqa: F401

import jax.numpy as jnp

import literal_ref


@pytest.fixture(scope="module")
def lstb():
    return literal_ref.load("dataset.load_STB")


@pytest.fixture(scope="module")
def lrot():
    return literal_ref.load("dataset.rotation")


def test_literal_joint_tables_and_intrinsics(lstb):
    from scat_tpu.data import stb
    np.testing.assert_array_equal(stb.jointsMapSimpleToSMPLX,
                                  lstb.jointsMapSimpleToSMPLX)
    np.testing.assert_array_equal(stb.jointsMapSMPLXToMano,
                                  lstb.jointsMapSMPLXToMano)
    assert stb.SK_FX_COLOR == lstb.SK_fx_color
    assert stb.SK_FY_COLOR == lstb.SK_fy_color
    assert stb.SK_TX_COLOR == lstb.SK_tx_color
    assert stb.SK_TY_COLOR == lstb.SK_ty_color


def test_literal_hand_flip(lstb):
    """load_STB.py:69-74 vs preprocess.flip_affine: the [w,0]+(-x,y)
    joint map and the mirrored pixels."""
    from PIL import Image
    from scat_tpu.data import preprocess
    r = np.random.RandomState(0)
    img = Image.fromarray((r.rand(48, 64, 3) * 255).astype(np.uint8))
    j2d = (r.rand(21, 2) * [64, 48]).astype(np.float64)
    limg, lj = lstb.hand_flip(img.copy(), j2d.copy())
    M = np.asarray(preprocess.flip_affine(64.0, xp=np))
    ours = np.concatenate([j2d, np.ones((21, 1))], 1) @ M.T
    np.testing.assert_allclose(ours, lj, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(limg),
                                  np.asarray(img)[:, ::-1])


def test_literal_crop_hand(lstb):
    """load_STB.py:76-96 vs preprocess.crop_hand_affine.  Joints are
    authored so the crop box lands on integers (PIL's crop floors the
    box), making the comparison exact."""
    from PIL import Image
    from scat_tpu.data import preprocess
    r = np.random.RandomState(1)
    img = Image.fromarray((r.rand(480, 640, 3) * 255).astype(np.uint8))
    j2d = np.tile(np.array([[200.0, 200.0]]), (21, 1))
    j2d[0] = (100, 150)   # mins
    j2d[1] = (280, 240)   # maxs
    j2d[4] = (200, 200)   # crop center joint
    _, lj = lstb.crop_hand(img.copy(), j2d.copy())
    M, joints_out = preprocess.crop_hand_affine(
        jnp.asarray(j2d[None], jnp.float32), 640, 480)
    M = np.asarray(M)[0]
    np.testing.assert_allclose(np.asarray(joints_out)[0], lj,
                               atol=1e-3)
    ours = np.concatenate([j2d, np.ones((21, 1))], 1) @ M.T
    np.testing.assert_allclose(ours, lj, atol=1e-3)


def test_literal_rescale_3d_joints_flip(lstb):
    from scat_tpu.ops import geometry
    r = np.random.RandomState(2)
    j3d = r.rand(21, 3) * 0.1 + [0, 0, 0.5]
    lit = lstb.rescale_3d_joints_flip(j3d.copy())
    ours = geometry.rescale_3d_joints_flip(j3d.copy(), xp=np)
    np.testing.assert_allclose(np.asarray(ours), lit, rtol=1e-6)


def test_literal_rotate_img(lrot):
    """rotation.py:7-55 vs rotate_affine_expand + rotate_joints_2d/3d:
    affine, canvas size, and both joint transforms."""
    from PIL import Image
    from scat_tpu.data import preprocess
    from scat_tpu.ops import geometry
    r = np.random.RandomState(3)
    img = Image.fromarray((r.rand(100, 140, 3) * 255).astype(np.uint8))
    j2d = (r.rand(21, 2) * [140, 100]).astype(np.float64)
    j3d = (r.rand(21, 3) * 0.1).astype(np.float64)
    angle = 37
    limg, lj2, lj3 = lrot.rotate_img(img, j2d.copy(), j3d.copy(),
                                     angle)
    M, nW, nH = preprocess.rotate_affine_expand(
        float(angle), 140, 100, xp=np)
    assert (int(nW), int(nH)) == tuple(np.asarray(limg).shape[:2][::-1])
    ours2 = np.asarray(geometry.rotate_joints_2d(
        jnp.asarray(j2d, jnp.float64), jnp.asarray(M, jnp.float64)))
    np.testing.assert_allclose(ours2, lj2, atol=1e-4)
    ours3 = np.asarray(geometry.rotate_joints_3d(
        j3d, np.asarray(M), xp=np))
    np.testing.assert_allclose(ours3, lj3, atol=1e-6)


def test_literal_rotate_pose_param(lrot):
    """rotation.py:61-91: the quaternion roundtrip (running literally
    on the Hamilton-product shim) vs our direct scipy composition."""
    from scat_tpu.data.freihand import rotate_pose_param
    r = np.random.RandomState(4)
    pose = (r.randn(48) * 0.4).astype(np.float64)
    for angle in (0, 37, 180, 271):
        lit = lrot.rotate_pose_param(pose.copy(), angle)
        ours = rotate_pose_param(pose.copy(), angle)
        np.testing.assert_allclose(ours, lit, atol=1e-8)


def test_literal_train_motion_blur(lstb):
    """load_STB.py:154-187 (the TRAINING-path blur, ksize 1..10
    including the even-k perpendicular shift) vs maybe_motion_blur."""
    from scat_tpu.data.stb import maybe_motion_blur

    img = (np.random.RandomState(5).rand(24, 24, 3) * 255).astype(
        np.uint8)

    class OurDraws:
        def __init__(self, ks, ax):
            self.vals = [1, ks, ax]

        def randint(self, lo, hi, size=None):
            return np.full(size, self.vals.pop(0))

    for ks in range(1, 11):
        for ax in (0, 1):
            # feed the literal's global-``random`` draws
            class LitDraws:
                def __init__(self, vals):
                    self.vals = vals

                def randint(self, a, b):
                    return self.vals.pop(0)

            saved = lstb.random
            lstb.random = LitDraws([ks, ax])
            try:
                lit = np.asarray(lstb.motion_blur(
                    img)).astype(np.float32)
            finally:
                lstb.random = saved
            ours = np.asarray(maybe_motion_blur(
                jnp.asarray(img[None]).astype(jnp.float32),
                OurDraws(ks, ax)))[0]
            assert np.abs(ours - lit).max() < 1.0, (ks, ax)
