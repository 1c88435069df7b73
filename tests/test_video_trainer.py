"""Temporal-stage driver test: chunking + adversarial updates end to end
(BASELINE config 5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from scat_tpu.config import Options
from scat_tpu.training.video_trainer import VideoChunkDataset, VideoTrainer


def _video_data(rng, n_frames=40, size=32):
    images = (rng.rand(n_frames, size, size, 3) * 2 - 1).astype(
        np.float32)
    labels = (rng.randn(n_frames, 166) * 0.01).astype(np.float32)
    vids = np.array(["vidA"] * 24 + ["vidB"] * 16)
    return images, labels, vids


def test_video_chunk_dataset_windows(rng):
    images, labels, vids = _video_data(rng)
    ds = VideoChunkDataset(images, labels, vids, seqlen=16, stride=8,
                           batch_size=2)
    # vidA(24 frames): windows [0,15],[8,23]; vidB(16): [24,39] -> 3
    assert len(ds.windows) == 3
    b = next(iter(ds))
    assert b["image"].shape == (2, 16, 32, 32, 3)
    assert b["label"].shape == (2, 16, 166)
    assert b["real_theta"].shape == (2, 16, 61)


def test_video_chunk_windows_match_reference(rng):
    # window indices equal reference split_into_chunks semantics
    images, labels, vids = _video_data(rng)
    ds = VideoChunkDataset(images, labels, vids, seqlen=16, stride=8)
    assert ds.windows == [[0, 15], [8, 23], [24, 39]]


@pytest.mark.slow
def test_video_trainer_epoch(rng):
    images, labels, vids = _video_data(rng, n_frames=32, size=32)
    ds = VideoChunkDataset(images, labels, vids, seqlen=8, stride=8,
                           batch_size=2)
    opt = Options(net="frankmocap", lr=1e-4, epoch=1,
                  compute_dtype="float32")
    trainer = VideoTrainer(opt, image_size=32)
    # small discriminator for CPU speed
    from scat_tpu.models.discriminator import MotionDiscriminator
    trainer.discriminator = MotionDiscriminator(
        rnn_size=32, input_size=48, num_layers=1, output_size=2,
        feature_pool="attention", attention_size=32)
    # small backbone
    from scat_tpu.models.hand_net import H3DWEncoder
    from scat_tpu import assets
    trainer.encoder = H3DWEncoder(
        mean_params=jnp.asarray(assets.load_mean_mano_pose()),
        backbone="resnet18")
    state = trainer.train(ds, epochs=1)
    assert state is not None
    assert int(state.step) == len(ds)


def test_view_as_windows_brute_force():
    """Direct re-exec of the vendored skimage routine
    (reference dataset/utils.py:6-156) against an index loop, 1-D and
    2-D, int and tuple steps."""
    from scat_tpu.data.testset import view_as_windows
    a = np.arange(17)
    for step in (1, 2, 3):
        w = view_as_windows(a, (5,), step=step)
        n = (17 - 5) // step + 1
        assert w.shape == (n, 5)
        for i in range(n):
            np.testing.assert_array_equal(w[i], a[i * step:i * step + 5])
    m = np.arange(6 * 7).reshape(6, 7)
    w = view_as_windows(m, (2, 3), step=(2, 2))
    assert w.shape == (3, 3, 2, 3)
    for i in range(3):
        for j in range(3):
            np.testing.assert_array_equal(
                w[i, j], m[2 * i:2 * i + 2, 2 * j:2 * j + 3])
