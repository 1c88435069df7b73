"""Native C++ host-pipeline tests: decode parity with PIL, warp parity
with the on-device affine_sample, batch loader failure semantics, and
the STB native fast path against the PIL+device path."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from scat_tpu.data import native_loader as nl
from scat_tpu.data import preprocess

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native library not built")


def _smooth(h, w, rng=None):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([x * 3 % 256, y * 5 % 256, (x + y) % 256],
                    -1).astype(np.uint8)


def test_png_decode_exact(tmp_path, rng):
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "t.png")
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(nl.decode_image(p, 48, 64), img)


def test_jpeg_decode_matches_pil(tmp_path):
    img = _smooth(48, 64)
    p = str(tmp_path / "t.jpg")
    Image.fromarray(img).save(p, quality=95)
    got = nl.decode_image(p, 48, 64)
    want = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_decode_wrong_size_fails(tmp_path):
    img = _smooth(10, 10)
    p = str(tmp_path / "t.png")
    Image.fromarray(img).save(p)
    with pytest.raises(IOError):
        nl.decode_image(p, 48, 64)


@pytest.mark.slow
def test_warp_matches_device_affine_sample(rng):
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    M = np.array([[1.7, 0.2, 3.0], [-0.1, 1.5, 1.0]], np.float32)
    Minv = np.asarray(preprocess.affine_invert(jnp.asarray(M)[None]))[0]
    native = nl.affine_warp(img, Minv, 32, 40)
    dev = np.asarray(preprocess.affine_sample(
        preprocess.normalize_to_unit(
            jnp.asarray(img, jnp.float32)[None]),
        jnp.asarray(M)[None], 32, 40, fill=-1.0))[0]
    np.testing.assert_allclose(native, dev, atol=1e-5)


def test_batch_loader_failure_semantics(tmp_path, rng):
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    good = str(tmp_path / "a.png")
    Image.fromarray(img).save(good)
    M = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32), (3, 1, 1))
    imgs, valid = nl.load_batch([good, str(tmp_path / "missing.png"),
                                 good], 48, 64, M, 48, 64)
    np.testing.assert_array_equal(valid, [1.0, 0.0, 1.0])
    assert np.all(imgs[1] == -1.0)
    ref = img.astype(np.float32) / 255 * 2 - 1
    np.testing.assert_allclose(imgs[0], ref, atol=1e-5)


@pytest.mark.slow
def test_stb_native_path_matches_device_path(tmp_path, rng):
    from tests.test_stb import _write_synthetic_stb
    from scat_tpu.config import Options
    from scat_tpu.data import stb

    # synthetic STB uses 640x480 frames like the real dataset
    data_dir = str(_write_synthetic_stb(tmp_path))
    opt = Options(data_dir=data_dir, batch_size=4)
    ds_native = stb.STBDataset("STB_eval", data_dir, 4, shuffle=False,
                               opt=opt, use_native=True)
    ds_device = stb.STBDataset("STB_eval", data_dir, 4, shuffle=False,
                               opt=opt, use_native=False)
    b_n = next(iter(ds_native))
    b_d = next(iter(ds_device))
    np.testing.assert_allclose(np.asarray(b_n["label"]),
                               np.asarray(b_d["label"]), atol=1e-2)
    np.testing.assert_allclose(np.asarray(b_n["image"]),
                               np.asarray(b_d["image"]), atol=1e-4)


def test_native_box_blur_matches_reference_math(tmp_path, rng):
    """1-sample blur through load_batch (identity warp) vs a float64
    re-execution of the cv2.filter2D-convention box blur (anchor k//2,
    REFLECT_101, and for EVEN k the perpendicular -1 sample the
    reference's int((k-1)/2) kernel placement implies — reference
    load_STB.py:154-187, pinned against the literal function in
    test_literal_data_utils.py)."""
    H, W = 32, 40
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "b.png")
    Image.fromarray(img).save(p)
    M = np.array([[[1, 0, 0], [0, 1, 0]]], np.float32)

    def take_reflect(a, off, ax):
        n = a.shape[ax]
        idx = np.arange(n) + off
        idx = np.where(idx < 0, -idx, idx)
        idx = np.where(idx >= n, 2 * n - 2 - idx, idx)
        return np.take(a, idx, axis=ax)

    for k, axis in [(4, 0), (7, 1), (10, 0)]:
        got, valid = nl.load_batch([p], H, W, M, H, W,
                                   blur_ksize=np.array([k]),
                                   blur_axis=np.array([axis]))
        assert valid[0] == 1.0
        anchor = k // 2
        x = img.astype(np.float64)
        acc = np.zeros_like(x)
        for t in range(-anchor, k - anchor):
            acc += take_reflect(x, t, axis)
        acc /= k
        if k % 2 == 0:
            acc = take_reflect(acc, -1, 1 - axis)
        want_u8 = np.floor(acc + 0.5)   # native rounds to uint8
        want = want_u8 / 255.0 * 2.0 - 1.0
        np.testing.assert_allclose(got[0], want, atol=1e-5)
    # ksize<=1 must be a no-op
    got, _ = nl.load_batch([p], H, W, M, H, W,
                           blur_ksize=np.array([1]),
                           blur_axis=np.array([0]))
    np.testing.assert_allclose(
        got[0], img.astype(np.float64) / 255 * 2 - 1, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("rotation,motion_blur",
                         [(True, False), (False, True), (True, True)])
def test_stb_native_augmented_matches_device_path(tmp_path, rng,
                                                  rotation, motion_blur):
    """--rotation/--motion_blur now ride the native fast path: same
    seed -> same augmentation draws -> native crops/labels match the
    PIL+device pipeline (images within blur-rounding tolerance)."""
    from tests.test_stb import _write_synthetic_stb
    from scat_tpu.config import Options
    from scat_tpu.data import stb

    data_dir = str(_write_synthetic_stb(tmp_path))
    opt = Options(data_dir=data_dir, batch_size=4)
    kw = dict(rotation=rotation, motion_blur=motion_blur,
              shuffle=False, seed=3, opt=opt)
    ds_native = stb.STBDataset("STB_train", data_dir, 4,
                               use_native=True, **kw)
    ds_device = stb.STBDataset("STB_train", data_dir, 4,
                               use_native=False, **kw)
    b_n = next(iter(ds_native))
    b_d = next(iter(ds_device))
    np.testing.assert_allclose(np.asarray(b_n["label"]),
                               np.asarray(b_d["label"]), atol=1e-2)
    # blur rounds to uint8 natively (device path blurs in float);
    # the warp then mixes 4 neighbours -> ~2/255 worst case
    np.testing.assert_allclose(np.asarray(b_n["image"]),
                               np.asarray(b_d["image"]), atol=2e-2)


def test_stale_library_falls_back(tmp_path, monkeypatch, capsys):
    """A pre-existing .so built from older source (missing a newer
    symbol) must demote to the PIL pipeline, not crash available()
    with AttributeError."""
    import subprocess
    stale = str(tmp_path / "libstale.so")
    src = tmp_path / "empty.cpp"
    src.write_text("extern \"C\" int scat_unrelated() { return 0; }\n")
    subprocess.run(["g++", "-shared", "-fPIC", str(src), "-o", stale],
                   check=True)
    monkeypatch.setattr(nl, "_SO_PATH", stale)
    monkeypatch.setattr(nl, "_lib", None)
    assert nl.load_library(auto_build=False) is None
    assert "PIL pipeline" in capsys.readouterr().out
