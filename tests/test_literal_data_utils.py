"""Literal-source oracles for the host-side data utilities
(round-4 review, Weak #6 and the oracle-grounding theme of Missing #1).

``/root/reference/dataset/utils.py`` and ``data_utils/*.py`` import
cleanly here (cv2 5.0 is installed), so the windowing / chunking /
heatmap-splat / heatmap-decode / acceleration-metric / motion-blur /
grabcut utilities are all compared against the reference's own code —
including two shipped-bug witnesses (motion_blur's missing imports) and
one genuine divergence this suite CAUGHT and fixed: the reference's
even-kernel motion blur also translates the image one pixel along the
perpendicular axis (box at int((k-1)/2) of a k x k kernel vs cv2's
k//2 anchor), which the round-1..4 device blur missed.
"""

import numpy as np
import pytest
import torch  # noqa: F401  (keeps torch import order uniform)

import jax.numpy as jnp

import literal_ref


@pytest.fixture(scope="module")
def du():
    return literal_ref.load("dataset.utils")


@pytest.fixture(scope="module")
def eu():
    return literal_ref.load("data_utils.eval_utils")


@pytest.fixture(scope="module")
def hc():
    return literal_ref.load("data_utils.heatmap_coord")


def test_literal_view_as_windows_and_chunks(du):
    """dataset/utils.py:6-178 vs data/testset.py — identical windows
    and chunk [start, end] lists over uneven video groups."""
    from scat_tpu.data import testset
    arr = np.arange(37)
    np.testing.assert_array_equal(
        du.view_as_windows(arr, (5,), step=3),
        testset.view_as_windows(arr, (5,), step=3))
    vids = np.array(["a"] * 11 + ["b"] * 4 + ["c"] * 9)
    assert (du.split_into_chunks(vids, 5, 5)
            == testset.split_into_chunks(vids, 5, 5))
    assert (du.split_into_chunks(vids, 5, 2)
            == testset.split_into_chunks(vids, 5, 2))


def test_literal_gaussian_splat(du):
    """dataset/utils.py:180-202 (gaussian2D + draw_umich_gaussian) vs
    ops/heatmap.draw_gaussian_heatmaps: per-joint channels max-combined
    equal the literal's in-place splats, including edge clipping."""
    from scat_tpu.ops import heatmap
    hm_l = np.zeros((32, 32), np.float32)
    pts = [(10.7, 20.2), (3.1, 2.9), (30.4, 0.6)]  # interior + 2 edges
    for p in pts:
        du.draw_umich_gaussian(hm_l, p, 4)
    centers = jnp.asarray([[list(p) for p in pts]])
    hm_o = np.asarray(heatmap.draw_gaussian_heatmaps(
        centers, 32, 32, radius=4))[0]
    np.testing.assert_allclose(hm_o.max(axis=0), hm_l, atol=1e-6)


def test_literal_accel_metrics(eu):
    """data_utils/eval_utils.py:6-48 vs ops/metrics: per-frame accel
    norms and the visibility-masked acceleration-error mean."""
    from scat_tpu.ops import metrics
    r = np.random.RandomState(0)
    J = r.randn(9, 21, 3).astype(np.float32)
    Jp = J + r.randn(9, 21, 3).astype(np.float32) * 0.1
    np.testing.assert_allclose(
        np.asarray(metrics.compute_accel(jnp.asarray(J))),
        eu.compute_accel(J), atol=1e-5)
    vis = np.array([1, 1, 0, 1, 1, 1, 1, 0, 1], bool)
    # the literal returns only visible entries; the mean over them must
    # equal our static-shape masked mean
    lit = eu.compute_error_accel(J, Jp, vis)
    ours = float(metrics.accel_error_mean(
        jnp.asarray(J), jnp.asarray(Jp), jnp.asarray(vis)))
    np.testing.assert_allclose(ours, float(np.mean(lit)), rtol=1e-5)
    # unmasked too
    lit_all = eu.compute_error_accel(J, Jp, None)
    ours_all = float(metrics.accel_error_mean(jnp.asarray(J),
                                              jnp.asarray(Jp)))
    np.testing.assert_allclose(ours_all, float(np.mean(lit_all)),
                               rtol=1e-5)


def test_literal_heatmap_decode(hc):
    """data_utils/heatmap_coord.py:10-84 vs ops/heatmap_coord: top-n
    weighted decode, the (-1,-1) sentinel, and the batched
    transfer_target layout."""
    from scat_tpu.ops import heatmap_coord
    r = np.random.RandomState(1)
    hm = np.clip(r.randn(16, 16, 4), 0, None)
    hm[:, :, 2] = 0.0  # all-zero channel -> sentinel on both sides
    assert (hc.transfer_xy_coord(hm.copy(), 6, 0.1)
            == heatmap_coord.transfer_xy_coord(hm, 6, 0.1))
    yp = np.clip(r.randn(3, 16, 16, 4), 0, None)
    np.testing.assert_allclose(
        np.asarray(hc.transfer_target(yp.copy(), 0.05, 6)),
        np.asarray(heatmap_coord.transfer_target(yp, 0.05, 6)))


def test_literal_motion_blur(du):
    """dataset/utils.py:204-241 (motion_blur v2): the shipped function
    can't run at all (``random`` and ``Image`` are never imported —
    witnessed), and once those two imports are injected, our device
    blur matches it for every kernel size INCLUDING the even-k
    perpendicular 1-px translation the anchor mismatch causes."""
    from PIL import Image
    import random as random_mod
    from scat_tpu.data.stb import maybe_motion_blur

    img = (np.random.RandomState(3).rand(24, 24, 3) * 255).astype(
        np.uint8)
    with pytest.raises(NameError):
        du.motion_blur(img)

    class LitDraws:
        """Feed motion_blur fixed (ksize, axis) draws."""

        def __init__(self, ks, ax):
            self.vals = [ks, ax]

        def randint(self, a, b):
            return self.vals.pop(0)

    class OurDraws:
        """Feed maybe_motion_blur (use=1, ksize, axis) batch draws."""

        def __init__(self, ks, ax):
            self.vals = [1, ks, ax]

        def randint(self, lo, hi, size=None):
            return np.full(size, self.vals.pop(0))

    du.Image = Image
    try:
        for ks in (2, 4, 9, 10):
            for ax in (0, 1):
                du.random = LitDraws(ks, ax)
                lit = np.asarray(du.motion_blur(img)).astype(np.float32)
                ours = np.asarray(maybe_motion_blur(
                    jnp.asarray(img[None]).astype(jnp.float32),
                    OurDraws(ks, ax)))[0]
                # literal output is truncated to uint8; ours is float
                assert np.abs(ours - lit).max() < 1.0, (ks, ax)
    finally:
        del du.random, du.Image


def test_literal_grabcut(du):
    """dataset/utils.py:243-322 vs data/segmentation.grabcut_reference:
    identical cv2 call sequence -> bit-identical background mask and
    inpainted plate (cv2's global RNG is pinned before each run)."""
    import cv2
    from PIL import Image
    from scat_tpu.data import segmentation

    r = np.random.RandomState(5)
    h = w = 64
    img = np.full((h, w, 3), 40, np.uint8)
    img += (r.rand(h, w, 3) * 20).astype(np.uint8)
    # a bright hand-ish blob under the joints
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - 32) ** 2 + (xx - 30) ** 2) < 18 ** 2
    img[blob] = np.array([200, 160, 140], np.uint8)
    # joints: wrist + 4-joint fingers fanning up from (30, 40)
    joints = np.zeros((21, 2), np.float32)
    joints[0] = (30, 44)
    k = 1
    for f, dx in enumerate((-10, -5, 0, 5, 10)):
        for seg in range(4):
            joints[k] = (30 + dx * (seg + 1) / 4.0,
                         40 - 5 * (seg + 1))
            k += 1
    pil = Image.fromarray(img)

    cv2.setRNGSeed(0)
    lit_mask, lit_plate = du.grabcut(pil, joints.copy())
    cv2.setRNGSeed(0)
    our_mask, our_plate = segmentation.grabcut_reference(
        pil, joints.copy())
    np.testing.assert_array_equal(our_mask, lit_mask)
    np.testing.assert_array_equal(our_plate, lit_plate)
    # sanity: the mask actually separates something
    assert 0 < lit_mask.mean() < 1
