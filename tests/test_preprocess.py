"""On-device preprocessing vs the reference's PIL/cv2 label math
(reference load_STB.py:69-110, eval.py:89-108, rotation.py:7-55)."""

import numpy as np
import jax.numpy as jnp
import pytest

from scat_tpu.data import preprocess
from scat_tpu.ops.heatmap import draw_gaussian_heatmaps, heatmap_to_coords


def _np_crop_hand(joints_2d, img_w, img_h, expand=1.3, min_s=10,
                  max_s=500):
    """reference load_STB.py:76-96 re-executed (joints math only)."""
    crop_center = joints_2d[4]
    min_coord = np.maximum(joints_2d.min(0), [0, 0])
    max_coord = np.minimum(joints_2d.max(0), np.array([img_w, img_h]))
    crop_size_best = expand * np.maximum(max_coord - crop_center,
                                         crop_center - min_coord)
    crop_size_best = np.max(crop_size_best)
    crop_size_best = min(max(crop_size_best, min_s), max_s)
    left, top = crop_center - crop_size_best
    new_width = 2 * crop_size_best
    scale = 224 / new_width
    return (joints_2d + np.array([-left, 0]) + np.array([0, -top])) * scale


def test_crop_hand_affine_matches_reference(rng):
    joints = (rng.rand(4, 21, 2) * [640, 480]).astype(np.float64)
    _, got = preprocess.crop_hand_affine(
        jnp.asarray(joints, jnp.float32), 640, 480)
    for b in range(4):
        want = _np_crop_hand(joints[b], 640, 480)
        np.testing.assert_allclose(np.asarray(got)[b], want, atol=1e-2)


def test_crop_hand_ref_variant(rng):
    # eval.py:89-108: expand 1.5, min 20
    joints = (rng.rand(2, 21, 2) * [640, 480]).astype(np.float64)
    _, got = preprocess.crop_hand_affine(
        jnp.asarray(joints, jnp.float32), 640, 480, expand=1.5,
        min_size=20.0)
    for b in range(2):
        want = _np_crop_hand(joints[b], 640, 480, expand=1.5, min_s=20)
        np.testing.assert_allclose(np.asarray(got)[b], want, atol=1e-2)


def test_flip_affine_matches_hand_flip(rng):
    # reference load_STB.py:69-74: x' = width - x
    joints = (rng.rand(3, 21, 2) * [640, 480]).astype(np.float32)
    M = preprocess.flip_affine(jnp.full((3,), 640.0))
    ones = np.ones((3, 21, 1), np.float32)
    got = np.einsum("bij,bnj->bni", np.asarray(M),
                    np.concatenate([joints, ones], -1))
    want = joints.copy()
    want[..., 0] = 640 - want[..., 0]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_affine_compose_invert(rng):
    A = jnp.asarray(rng.randn(5, 2, 3), jnp.float32)
    I = preprocess.affine_compose(A, preprocess.affine_invert(A))
    want = np.tile(np.array([[1., 0, 0], [0, 1, 0]], np.float32),
                   (5, 1, 1))
    np.testing.assert_allclose(np.asarray(I), want, atol=1e-4)


def test_affine_sample_identity(rng):
    img = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    M = preprocess.identity_affine((2,))
    out = preprocess.affine_sample(img, M, 16, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               atol=1e-5)


def test_affine_sample_matches_scipy(rng):
    from scipy import ndimage
    img = rng.rand(20, 20).astype(np.float32)
    # scale by 2 about origin plus shift
    M = np.array([[2.0, 0.0, 3.0], [0.0, 2.0, 1.0]], np.float32)
    out = preprocess.affine_sample(
        jnp.asarray(img)[None, :, :, None], jnp.asarray(M)[None], 24, 24)
    # scipy: output[y,x] = input[Minv @ (x,y)]; build inverse mapping
    Minv = np.asarray(preprocess.affine_invert(jnp.asarray(M)[None]))[0]
    # ndimage uses (row, col) = (y, x) order
    mat = np.array([[Minv[1, 1], Minv[1, 0]], [Minv[0, 1], Minv[0, 0]]])
    off = np.array([Minv[1, 2], Minv[0, 2]])
    want = ndimage.affine_transform(img, mat, offset=off,
                                    output_shape=(24, 24), order=1,
                                    mode="constant", cval=0.0)
    # compare interior pixels only: scipy's constant-mode boundary
    # convention differs half a pixel from bilinear-with-zero-fill
    got = np.asarray(out)[0, :, :, 0]
    ys, xs = np.meshgrid(np.arange(24), np.arange(24), indexing="ij")
    sx = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]
    sy = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]
    interior = (sx >= 0) & (sx < 19) & (sy >= 0) & (sy < 19)
    np.testing.assert_allclose(got[interior], want[interior], atol=1e-4)


def test_fused_pipeline_shapes_and_range(rng):
    imgs = jnp.asarray(rng.randint(0, 255, (2, 480, 640, 3)), jnp.uint8)
    joints = jnp.asarray(rng.rand(2, 21, 2) * jnp.asarray([640., 480.]),
                         jnp.float32)
    out, j2d = preprocess.fused_crop_pipeline(imgs, joints)
    assert out.shape == (2, 224, 224, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
    assert j2d.shape == (2, 21, 2)


def _np_draw_umich(heatmap, center, radius, k=1):
    """reference dataset/utils.py:180-202 re-executed."""
    diameter = 2 * radius + 1
    m, n = (diameter - 1) / 2, (diameter - 1) / 2
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    gaussian = np.exp(-(x * x + y * y) / (2 * (diameter / 6) ** 2))
    gaussian[gaussian < np.finfo(gaussian.dtype).eps
             * gaussian.max()] = 0
    x, y = int(center[0]), int(center[1])
    width, height = heatmap.shape
    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    masked_heatmap = heatmap[y - top:y + bottom, x - left:x + right]
    masked_gaussian = gaussian[radius - top:radius + bottom,
                               radius - left:radius + right]
    if min(masked_gaussian.shape) > 0 and min(masked_heatmap.shape) > 0:
        np.maximum(masked_heatmap, masked_gaussian * k,
                   out=masked_heatmap)
    return heatmap


def test_heatmap_matches_reference_splat(rng):
    centers = rng.rand(5, 2) * 56
    got = np.asarray(draw_gaussian_heatmaps(
        jnp.asarray(centers, jnp.float32), 56, 56, radius=8))
    for j in range(5):
        want = _np_draw_umich(np.zeros((56, 56)), centers[j], 8)
        np.testing.assert_allclose(got[j], want, atol=1e-5)


def test_heatmap_splat_negative_fraction_center():
    """Centers in (-1, 0) — a joint just off the crop edge after
    rotation/flip — must anchor like the reference's int() truncation
    (toward zero), not floor: int(-0.3) == 0."""
    centers = np.array([[-0.3, 10.0], [10.0, -0.7]], np.float32)
    got = np.asarray(draw_gaussian_heatmaps(
        jnp.asarray(centers), 56, 56, radius=8))
    for j in range(2):
        want = _np_draw_umich(np.zeros((56, 56)), centers[j], 8)
        np.testing.assert_allclose(got[j], want, atol=1e-5)


def test_heatmap_decode_all_negative_map():
    """An untrained head's all-negative heatmap decodes to finite
    coordinates (negative weight sums divide normally; only a ~zero sum
    degenerates to the (-1,-1) sentinel)."""
    from scat_tpu.ops.heatmap import heatmap_to_coords
    hm = -1.0 - np.asarray(
        _np_draw_umich(np.zeros((56, 56)), (20, 30), 8))
    out = np.asarray(heatmap_to_coords(jnp.asarray(hm[None])))
    assert np.isfinite(out).all()
    assert np.abs(out).max() < 56  # sane crop-range coordinates
    zero = np.asarray(heatmap_to_coords(jnp.zeros((1, 56, 56))))
    np.testing.assert_allclose(zero, -1.0)


def test_heatmap_roundtrip_decode(rng):
    centers = (rng.rand(21, 2) * 40 + 8).astype(np.float32)
    maps = draw_gaussian_heatmaps(jnp.asarray(centers), 56, 56, radius=8)
    decoded = np.asarray(heatmap_to_coords(maps))
    # int-cast in the splat loses sub-pixel precision; within 1px
    np.testing.assert_allclose(decoded, np.floor(centers), atol=1.0)


def test_heatmap_coord_reference_api(rng):
    """get_ave_xy/transfer_target parity with reference
    data_utils/heatmap_coord.py:10-74 re-executed."""
    from scat_tpu.ops import heatmap_coord as hc

    def ref_get_ave_xy(hmi, n_points=1, thresh=0):
        if n_points < 1:
            hsum, n_points = np.sum(hmi), hmi.size
            h_, w_ = hmi.shape
            i1 = np.sum(np.tile(np.arange(w_), (h_, 1)) * hmi) / hsum
            i0 = np.sum(np.tile(np.arange(h_), (w_, 1)).T * hmi) / hsum
        else:
            ind = np.argsort(hmi, axis=None)[-n_points:]
            t0, t1 = np.unravel_index(ind, hmi.shape)
            i0 = i1 = hsum = 0
            for a, b in zip(t0, t1):
                h = hmi[a, b]
                hsum += h
                i0 += a * h
                i1 += b * h
            i0 /= hsum
            i1 /= hsum
        if hsum / n_points <= thresh:
            i0, i1 = -1, -1
        return [i1, i0]

    hm = rng.rand(56, 56)
    for n_points, thresh in [(1, 0), (64, 0.2), (0, 0), (64, 0.9)]:
        got = hc.get_ave_xy(hm, n_points, thresh)
        want = ref_get_ave_xy(hm, n_points, thresh)
        np.testing.assert_allclose(got, want, atol=1e-9)
    # sentinel on empty map
    assert hc.get_ave_xy(np.zeros((56, 56)), 64, 0.2) == [-1, -1]
    # batched layout [N,H,W,J] -> [N, J*2]
    batch = rng.rand(2, 56, 56, 3)
    out = hc.transfer_target(batch, thresh=0, n_points=4)
    assert out.shape == (2, 6)
