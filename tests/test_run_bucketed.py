"""Unit tests for the shared serving request loop (serving.run_bucketed)
with a fake forward — padding, chunking and ordering invariants without
compiling a model."""

import numpy as np

from scat_tpu.serving import bucket_ladder, pick_bucket, run_bucketed

BUCKETS = [1, 2, 4, 8]


def test_bucket_ladder_clamps_to_max_batch():
    """A non-power-of-two max_batch (the HBM cap) must clamp the top
    bucket, not overshoot it — and the export path shares this ladder
    (round 3 found ExportedPredictor's duplicate had drifted: a
    max_batch=60 artifact compiled a 64-wide program)."""
    assert bucket_ladder(64) == [1, 2, 4, 8, 16, 32, 64]
    assert bucket_ladder(60) == [1, 2, 4, 8, 16, 32, 60]
    assert bucket_ladder(60, base=6) == [6, 12, 24, 48, 60]
    assert bucket_ladder(1) == [1]
    # ExportedPredictor builds its ladder from the same helper
    import inspect
    from scat_tpu import export
    assert "bucket_ladder" in inspect.getsource(
        export.ExportedPredictor.__init__)


def _fake_forward(params, batch_stats, images):
    """Identity-traceable fake: camera row = the crop's top-left pixel
    value, so output order and padding slicing are checkable."""
    x = np.asarray(images, np.float32)
    n = x.shape[0]
    tag = x[:, 0, 0, 0:1]
    cam = np.concatenate([tag, np.zeros((n, 2), np.float32)], axis=1)
    return cam, np.zeros((n, 21, 3)), np.zeros((n, 21, 2))


def _request(n):
    x = np.zeros((n, 4, 4, 3), np.float32)
    x[:, 0, 0, 0] = np.arange(1, n + 1)
    return x


def test_pick_bucket():
    assert [pick_bucket(n, BUCKETS) for n in (1, 2, 3, 5, 8, 9, 100)] \
        == [1, 2, 4, 8, 8, 8, 8]


def test_exact_bucket_no_padding():
    out = run_bucketed(_fake_forward, None, None, _request(8), BUCKETS,
                       put=lambda a: a)
    np.testing.assert_array_equal(out["camera"][:, 0],
                                  np.arange(1, 9))


def test_padding_sliced_off():
    out = run_bucketed(_fake_forward, None, None, _request(3), BUCKETS,
                       put=lambda a: a)
    assert out["camera"].shape == (3, 3)
    np.testing.assert_array_equal(out["camera"][:, 0], [1, 2, 3])


def test_oversized_request_chunks_in_order():
    # 19 = 2 full chunks of 8 + remainder 3 -> bucket 4
    calls = []

    def forward(p, b, images):
        calls.append(np.asarray(images).shape[0])
        return _fake_forward(p, b, images)

    out = run_bucketed(forward, None, None, _request(19), BUCKETS,
                       put=lambda a: a)
    assert calls == [8, 8, 4]
    np.testing.assert_array_equal(out["camera"][:, 0],
                                  np.arange(1, 20))


def test_window_bounds_inflight():
    peak = {"now": 0, "max": 0}

    class Lazy:
        """Defers materialization so in-flight count is observable."""

        def __init__(self, images):
            peak["now"] += 1
            peak["max"] = max(peak["max"], peak["now"])
            self.images = images

        def __iter__(self):
            peak["now"] -= 1
            return iter(_fake_forward(None, None, self.images))

    run_bucketed(lambda p, b, x: Lazy(x), None, None, _request(64),
                 [1, 2], put=lambda a: a, window=2)
    assert peak["max"] <= 3  # window chunks + the one being drained
