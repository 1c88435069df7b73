"""Serving predictor tests: bucketing, padding, dtype handling, frame
pipeline."""

import numpy as np
import jax

from scat_tpu.config import Options
from scat_tpu.serving import HandPosePredictor
import pytest

IMG = 64


def _predictor():
    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  compute_dtype="float32", use_pallas_attention=False,
                  checkpoint_path_eval="/nonexistent")
    return HandPosePredictor.from_checkpoint(opt, image_size=IMG)


@pytest.mark.slow
def test_predict_shapes_and_padding(rng):
    p = _predictor()
    out = p.predict((rng.rand(3, IMG, IMG, 3) * 255).astype(np.uint8))
    assert out["camera"].shape == (3, 3)
    assert out["joints_3d"].shape == (3, 21, 3)
    assert out["joints_2d"].shape == (3, 21, 2)
    # root-centered contract
    np.testing.assert_allclose(out["joints_3d"][:, 1], 0.0, atol=1e-5)


@pytest.mark.slow
def test_predict_bucketing_consistency(rng):
    p = _predictor()
    imgs = (rng.rand(5, IMG, IMG, 3) * 255).astype(np.uint8)
    # 5 pads to bucket 8; results must equal per-sample predictions
    full = p.predict(imgs)
    single = [p.predict(imgs[i:i + 1]) for i in range(5)]
    for i in range(5):
        np.testing.assert_allclose(full["joints_3d"][i],
                                   single[i]["joints_3d"][0], atol=1e-4)


@pytest.mark.slow
def test_predict_float_input(rng):
    p = _predictor()
    u8 = (rng.rand(2, IMG, IMG, 3) * 255).astype(np.uint8)
    f = u8.astype(np.float32) / 127.5 - 1.0
    a = p.predict(u8)
    b = p.predict(f)
    np.testing.assert_allclose(a["joints_3d"], b["joints_3d"], atol=1e-5)


@pytest.mark.slow
def test_predict_from_frames(rng):
    p = _predictor()
    frames = (rng.rand(2, 240, 320, 3) * 255).astype(np.uint8)
    hints = (rng.rand(2, 21, 2) * [320, 240] * 0.5 + [80, 60]
             ).astype(np.float32)
    out = p.predict_from_frames(frames, hints)
    assert out["joints_3d"].shape == (2, 21, 3)
    assert out["crop_affine"].shape == (2, 2, 3)


@pytest.mark.slow
def test_oversized_request_chunks(rng):
    p = _predictor()
    p.max_batch = 4
    p.__post_init__()
    imgs = (rng.rand(9, IMG, IMG, 3) * 255).astype(np.uint8)
    out = p.predict(imgs)
    assert out["joints_3d"].shape == (9, 21, 3)


def test_rejects_non_uint8_integers(rng):
    p = _predictor()
    with pytest.raises(ValueError, match="uint8"):
        p.predict((rng.rand(2, IMG, IMG, 3) * 255).astype(np.int32))


def test_bucket_clamp_respects_max_batch():
    """Bucket doubling must never exceed max_batch (the configured HBM
    cap) — including a non-power-of-two cap or mesh data axis, where
    plain doubling would overshoot (e.g. axis 6: ...48, 96 > 60)."""
    from scat_tpu.parallel import mesh as mesh_lib
    p = _predictor()
    p.max_batch = 6
    p.__post_init__()
    assert p._buckets == [1, 2, 4, 6]
    mesh = mesh_lib.make_mesh((("data", 6),),
                              devices=jax.devices()[:6])
    sharded = HandPosePredictor(
        model=p.model, params=p.params, batch_stats=p.batch_stats,
        image_size=IMG, mesh=mesh)
    assert sharded.max_batch == 60  # 64 rounded to the axis multiple
    assert sharded._buckets[0] == 6 and sharded._buckets[-1] == 60
    assert all(b % 6 == 0 and b <= 60 for b in sharded._buckets)


@pytest.mark.slow
def test_mesh_predict_matches_single_device(rng):
    """Data-parallel serving over the 8-device mesh must agree with the
    single-device predictor (and handle N that doesn't divide 8)."""
    from scat_tpu.parallel import mesh as mesh_lib
    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  compute_dtype="float32", use_pallas_attention=False,
                  checkpoint_path_eval="/nonexistent")
    single = HandPosePredictor.from_checkpoint(opt, image_size=IMG)
    mesh = mesh_lib.make_mesh()
    sharded = HandPosePredictor(
        model=single.model, params=single.params,
        batch_stats=single.batch_stats, image_size=IMG, mesh=mesh)
    assert sharded._buckets[0] == mesh.shape["data"]
    assert all(b % mesh.shape["data"] == 0 for b in sharded._buckets)
    # N=11: pads to 16 (two shards of 8), exercises padding + sharding
    imgs = (rng.rand(11, IMG, IMG, 3) * 255).astype(np.uint8)
    a = single.predict(imgs)
    b = sharded.predict(imgs)
    np.testing.assert_allclose(a["joints_3d"], b["joints_3d"], atol=1e-4)
    np.testing.assert_allclose(a["joints_2d"], b["joints_2d"], atol=1e-3)
    np.testing.assert_allclose(a["camera"], b["camera"], atol=1e-4)


@pytest.mark.slow
def test_predict_device_timing_mode(rng):
    """chunk_device_times measurement mode: one entry per chunk,
    outputs identical to the pipelined path (serving.run_bucketed)."""
    p = _predictor()
    req = (rng.rand(70, IMG, IMG, 3) * 255).astype(np.uint8)
    out_fast = p.predict(req)
    times = []
    out_timed = p.predict(req, chunk_device_times=times)
    # 70 crops over a max-bucket-64 ladder -> one 64-chunk + one 8-chunk
    assert len(times) == 2
    assert all(t > 0 for t in times)
    for k in ("camera", "joints_3d", "joints_2d"):
        np.testing.assert_allclose(out_timed[k], out_fast[k], atol=1e-6)
