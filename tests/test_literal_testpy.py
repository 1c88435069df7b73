"""Literal oracle for /root/reference/test.py (the FrankMocap
inference flow): the bbox<->image coordinate converters, the joint
remap tables, and the center-crop — plus an executable witness of the
dead-code indexing quirk in convert_smpl_to_bbox's default branch
(test.py:81 writes data3D[:,0:2] on a [B,N,3] array, shifting the
first two JOINTS; our implementation follows frankmocap's evident
intent, documented in utils/smplx_glue.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

import literal_ref
from scat_tpu import assets


@pytest.fixture(scope="session")
def ltest(tmp_path_factory):
    data = assets.synthetic_mano(seed=3)
    tree = tmp_path_factory.mktemp("mano_tree_testpy")
    literal_ref.write_mano_pkl(
        str(tree / "extra_data" / "MANO_RIGHT.pkl"), data)
    return literal_ref.load_reference_test(str(tree))


def test_literal_joint_remap_tables(ltest):
    from scat_tpu.data import ho3d
    from scat_tpu.viz import draw
    np.testing.assert_array_equal(ho3d.jointsMapManoToSimple,
                                  ltest.jointsMapManoToSimple)
    np.testing.assert_array_equal(draw.jointsMapSMPLXToSimple,
                                  ltest.jointsMapSMPLXToSimple)


def test_literal_convert_bbox_to_oriIm(ltest):
    from scat_tpu.utils import smplx_glue
    r = np.random.RandomState(0)
    d = (r.randn(2, 21, 3) * 50).astype(np.float64)
    lit = ltest.convert_bbox_to_oriIm(d.copy(), 0.7, (12.0, 30.0),
                                      640, 480)
    ours = smplx_glue.convert_bbox_to_oriIm(
        jnp.asarray(d), 0.7, np.array([12.0, 30.0]), 640, 480)
    np.testing.assert_allclose(np.asarray(ours), lit, rtol=2e-5)


def test_literal_convert_smpl_to_bbox(ltest):
    from scat_tpu.utils import smplx_glue
    r = np.random.RandomState(1)
    d = (r.randn(2, 21, 3) * 0.2).astype(np.float64)
    scale = np.array(1.7)
    trans = np.array([0.3, -0.2])
    # hand branch (bAppTransFirst=True, the one the callers use):
    # exact parity
    lit = ltest.convert_smpl_to_bbox(d.copy(), scale, trans,
                                     bAppTransFirst=True)
    ours = smplx_glue.convert_smpl_to_bbox(
        jnp.asarray(d), scale, trans, bAppTransFirst=True)
    np.testing.assert_allclose(np.asarray(ours), lit, rtol=2e-5)
    # default branch: the literal's joint-slice indexing
    # (test.py:82 ``data3D[:,0:2] += trans`` on [B,N,3]) doesn't even
    # broadcast — the shipped dead code CRASHES; ours implements
    # frankmocap's evident xy-shift intent (utils/smplx_glue.py note)
    with pytest.raises(ValueError, match="broadcast"):
        ltest.convert_smpl_to_bbox(d.copy(), scale, trans,
                                   bAppTransFirst=False)
    ours2 = np.asarray(smplx_glue.convert_smpl_to_bbox(
        jnp.asarray(d), scale, trans, bAppTransFirst=False))
    intent = d * scale
    intent[:, :, 0:2] += trans
    np.testing.assert_allclose(ours2, intent * 112.0, rtol=2e-5)


def test_literal_center_crop_resize(ltest):
    """test.py:33-53: center square crop + 224 resize, both
    orientations."""
    from PIL import Image
    r = np.random.RandomState(2)
    for w, h in ((320, 240), (240, 320), (224, 224)):
        img = Image.fromarray(
            (r.rand(h, w, 3) * 255).astype(np.uint8))
        lit = ltest.center_crop_resize(img)
        assert lit.size == (224, 224)
        # re-derive: the square crop box the literal takes
        if w > h:
            box = ((w - h) // 2, 0, w - (w - h) // 2, h)
        else:
            box = (0, (h - w) // 2, w, h - (h - w) // 2)
        want = img.crop(box).resize((224, 224))
        np.testing.assert_array_equal(np.asarray(lit),
                                      np.asarray(want))
