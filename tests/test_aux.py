"""Aux subsystem tests: profiling, debugging checks, logging, renderer,
helpers, segmentation, train-coarse step contract."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scat_tpu.utils import debugging, logging as log_lib, profiling


def test_step_timer_counts():
    t = profiling.StepTimer(batch_size=4, warmup=1)
    import time
    for _ in range(4):
        time.sleep(0.01)
        t.tick()
    assert t.counted_steps == 3
    assert t.ms_per_step >= 9.0
    assert t.samples_per_sec > 0


def test_benchmark_fn():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((8, 8))
    res = profiling.benchmark_fn(f, x, iters=3, batch_size=8)
    assert res["ms_per_step"] > 0
    assert res["samples_per_sec_per_chip"] > 0


def test_jit_consistency_check(rng):
    debugging.check_jit_consistency(lambda x: jnp.sin(x) * 2,
                                    jnp.asarray(rng.randn(4), jnp.float32))


def test_assert_all_finite():
    debugging.assert_all_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        debugging.assert_all_finite({"a": jnp.asarray([1.0, np.nan])})


def test_determinism_check():
    debugging.check_determinism(
        lambda k: jax.random.normal(k, (4,)), jax.random.key(0))


def test_metrics_logger(tmp_path):
    lg = log_lib.MetricsLogger(str(tmp_path))
    lg.log(1, {"loss": 2.0, "loss_3d": 1.0})
    lg.log(2, {"loss": 1.5, "loss_3d": 0.7})
    lg.close()
    content = open(tmp_path / "metrics.csv").read().splitlines()
    assert content[0].startswith("step,time,loss")
    assert len(content) == 3


def test_metrics_logger_tensorboard(tmp_path):
    """--tensorboard mirrors the CSV scalars into TB event files (the
    reference's commented-out writer, train.py:233) and skips NaN
    points; absence of tensorboardX must degrade to CSV-only."""
    pytest.importorskip("tensorboardX")
    lg = log_lib.MetricsLogger(str(tmp_path), tensorboard=True)
    lg.log(1, {"loss": 2.0, "mpjpe_mm": float("nan")})
    lg.log(2, {"loss": 1.5, "mpjpe_mm": 11.0})
    lg.close()
    assert (tmp_path / "metrics.csv").exists()
    events = list((tmp_path / "tb" / "metrics").glob("events.out.*"))
    assert events and events[0].stat().st_size > 0
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    acc = EventAccumulator(str(tmp_path / "tb" / "metrics"))
    acc.Reload()
    losses = acc.Scalars("loss")
    assert [s.step for s in losses] == [1, 2]
    assert [s.value for s in losses] == [2.0, 1.5]
    assert len(acc.Scalars("mpjpe_mm")) == 1  # NaN point skipped


def test_software_renderer(rng):
    from scat_tpu import assets
    from scat_tpu.viz.render import Renderer
    verts = assets.load_obj_vertices()
    faces = assets.load_obj_faces()
    img = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
    out = Renderer()(verts, faces, np.array([5.0, 0.0, 0.0]), img)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.uint8
    # the mesh actually painted something
    assert np.abs(out.astype(int) - img.astype(int)).sum() > 0


@pytest.mark.slow
def test_truncated_resnet_and_spade(rng):
    from scat_tpu.models.helpers import SPADE, TruncatedResNet
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    m = TruncatedResNet()
    v = m.init(jax.random.key(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 8, 8, 512)  # stride-8, 512ch (layer2)
    sp = SPADE(norm_nc=16, label_nc=3)
    feat = jnp.asarray(rng.randn(1, 8, 8, 16), jnp.float32)
    seg = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    vs = sp.init(jax.random.key(0), feat, seg, train=False)
    out2, _ = sp.apply(vs, feat, seg, train=True,
                       mutable=["batch_stats"])
    assert out2.shape == feat.shape


def test_grabcut_runs(rng):
    from scat_tpu.data.segmentation import grabcut
    img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
    joints = rng.rand(21, 2) * [160, 120] * 0.5 + [40, 30]
    out, mask = grabcut(img, joints, iterations=1)
    assert out.shape == img.shape
    assert mask.shape == (120, 160)
    assert mask.max() <= 1


def test_save_obj_roundtrip(tmp_path, rng):
    from scat_tpu.models.mano import save_obj
    from scat_tpu import assets
    verts = rng.rand(10, 3)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    p = str(tmp_path / "m.obj")
    save_obj(verts, faces, p)
    v2 = assets.load_obj_vertices(p)
    f2 = assets.load_obj_faces(p)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


def test_get_dist_pck(rng):
    from scat_tpu.ops.metrics import get_dist_pck
    pred = jnp.asarray(rng.randn(4, 21, 3), jnp.float32)
    gt = jnp.asarray(rng.randn(4, 21, 3), jnp.float32)
    d = np.asarray(get_dist_pck(pred, gt))
    assert d.shape == (1, 21, 4)
    # re-execute reference eval.py:274-298
    p, g = np.asarray(pred), np.asarray(gt)
    for b in range(4):
        ref = np.linalg.norm(g[b, 4] - g[b, 5])
        want = np.sqrt(((p[b] - g[b]) ** 2).sum(-1)) / ref
        np.testing.assert_allclose(d[0, :, b], want, rtol=1e-5)


@pytest.mark.slow
def test_coarse_head_train_step(rng):
    """make_train_step handles the (pred, fmap, attn) contract."""
    from scat_tpu import assets
    from scat_tpu.data.synthetic import synth_batch
    from scat_tpu.models.hand_net import EncoderTransformerCoarse
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState

    mean = assets.load_mean_params()
    model = EncoderTransformerCoarse(mean_params=jnp.asarray(mean),
                                     heads=2, backbone="resnet18",
                                     token_dim=16)
    batch = synth_batch(jax.random.key(0), 2, image_size=32,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"])
    tx = schedule.make_optimizer(1e-4, 1)
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx,
                              jax.random.key(2))
    step = jax.jit(steps.make_train_step(model, tx, 1e5, 10.0))
    _, stats = step(state, batch)
    assert np.isfinite(float(stats["loss"]))


def test_prefetch_iterator_preserves_order_and_errors(rng):
    from scat_tpu.data.prefetch import PrefetchIterator

    data = [{"x": jnp.full((2,), i)} for i in range(10)]
    out = [int(b["x"][0]) for b in PrefetchIterator(data, depth=3)]
    assert out == list(range(10))
    # re-iterable
    out2 = [int(b["x"][0]) for b in PrefetchIterator(data, depth=3)]
    assert out2 == out

    class Boom:
        def __iter__(self):
            yield {"x": jnp.zeros(2)}
            raise RuntimeError("decode failed")

    it = PrefetchIterator(Boom(), depth=2)
    got = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for b in it:
            got.append(b)
    assert len(got) == 1


def test_prefetch_to_device_shards(rng):
    from scat_tpu.data.prefetch import prefetch_to_device
    from scat_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh()
    data = [{"image": jnp.zeros((8, 4, 4, 3)),
             "label": jnp.zeros((8, 105)),
             "valid": jnp.ones((8,))} for _ in range(3)]
    batches = list(prefetch_to_device(data, mesh))
    assert len(batches) == 3
    sh = batches[0]["image"].sharding
    assert sh.spec == jax.sharding.PartitionSpec("data")
