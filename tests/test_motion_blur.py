"""Per-sample motion blur distribution + numerics
(reference load_STB.py:154-187,266-268: each sample independently draws
use_blur 1-in-6, kernel size 1..10, vertical/horizontal)."""

import numpy as np
import jax.numpy as jnp

from scat_tpu.data.stb import maybe_motion_blur


def _take_reflect(img, offset, axis):
    n = img.shape[axis]
    idx = np.arange(n) + offset
    idx = np.where(idx < 0, -idx, idx)                # reflect-101 low
    idx = np.where(idx > n - 1, 2 * (n - 1) - idx, idx)  # high
    return np.take(img, idx, axis=axis)


def _ref_blur(img, ksize, axis):
    """Reference motion_blur re-executed in numpy for one sample: a
    length-k box at column/row int((k-1)/2) of a k x k kernel,
    cv2.filter2D anchor k//2 and default BORDER_REFLECT_101 borders
    (load_STB.py:154-187).  For EVEN k the box row offset
    int((k-1)/2) - k//2 = -1 also translates the image one pixel along
    the PERPENDICULAR axis — pinned against the literal reference in
    test_literal_data_utils.py."""
    a = ksize // 2
    out = np.zeros_like(img, np.float64)
    for j in range(ksize):
        out += _take_reflect(img, j - a, axis) / ksize
    if ksize % 2 == 0:
        out = _take_reflect(out, -1, 1 - axis)
    return out


def test_blur_is_per_sample():
    rng = np.random.RandomState(3)
    imgs = rng.rand(512, 8, 8, 3).astype(np.float32)
    out = np.asarray(maybe_motion_blur(jnp.asarray(imgs),
                                       np.random.RandomState(7)))
    changed = np.abs(out - imgs).reshape(512, -1).max(1) > 1e-6
    frac = changed.mean()
    # 1-in-6 draw, minus ksize==1 identities (1/10 of blurred draws):
    # expected changed fraction ~ (1/6)*(9/10) = 0.15
    assert 0.08 < frac < 0.24, frac
    # unblurred samples pass through bit-exactly
    untouched = ~changed
    np.testing.assert_array_equal(out[untouched], imgs[untouched])


def test_blur_matches_reference_kernel():
    """Each blurred sample equals the reference's per-sample box filter
    for SOME (ksize, axis) in the reference's support — and the batch
    uses more than one distinct kernel (the round-1 version blurred the
    whole batch with one draw)."""
    rng_img = np.random.RandomState(0)
    imgs = rng_img.rand(64, 12, 12, 3).astype(np.float32)
    out = np.asarray(maybe_motion_blur(jnp.asarray(imgs),
                                       np.random.RandomState(1)))
    kinds = set()
    for b in range(64):
        if np.abs(out[b] - imgs[b]).max() <= 1e-6:
            continue
        matched = None
        for ksize in range(2, 11):
            for axis in (0, 1):
                want = _ref_blur(imgs[b], ksize, axis)
                if np.abs(out[b] - want).max() < 1e-5:
                    matched = (ksize, axis)
        assert matched, f"sample {b} matches no reference kernel"
        kinds.add(matched)
    assert len(kinds) >= 2, f"only one kernel across the batch: {kinds}"
