"""Shape/dtype tests for every encoder configuration in SURVEY.md §2.5,
driven through the --net factory (small image sizes for CPU speed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scat_tpu.config import Options
from scat_tpu.models import build_model

IMG = 64


def _run(opt, image_size=IMG, expect_pl=False):
    model, mean = build_model(opt, image_size=image_size)
    x = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
    out, _ = model.apply(variables, x, train=True,
                         rngs={"mask": jax.random.key(2)},
                         mutable=["batch_stats", "constants"])
    return out


@pytest.mark.slow
def test_reg_transformer_variant():
    opt = Options(net="reg_transformer", vit_heads=2, iteration=2,
                  mask_rate=0.2, use_pallas_attention=False,
                  compute_dtype="float32")
    out = _run(opt)
    assert out[0].shape == (2, 66)


@pytest.mark.slow
def test_reg_transformer_coarse_variant():
    opt = Options(net="reg_transformer_coarse", vit_heads=2,
                  compute_dtype="float32")
    out = _run(opt)
    pred, fmap, attn = out
    assert pred.shape == (2, 66)
    assert attn.shape[-2:] == (21, 21)


@pytest.mark.slow
def test_backbone_hrnet_variant():
    opt = Options(net="backbone_hrnet", vit_heads=2,
                  compute_dtype="float32")
    # HRNet reinterpret requires the 224-layout (56x56x128 -> 512x28x28)
    out = _run(opt, image_size=224)
    assert out.shape == (2, 61)


@pytest.mark.slow
def test_backbone_incepv3_variant():
    opt = Options(net="backbone_incepv3", vit_heads=2,
                  compute_dtype="float32")
    out = _run(opt, image_size=224)
    assert out.shape == (2, 61)


def test_frankmocap_variant():
    opt = Options(net="frankmocap", compute_dtype="float32")
    out = _run(opt)
    feat, pred = out
    assert pred.shape == (2, 61)


@pytest.mark.slow
def test_vit_variant():
    opt = Options(net="ViT", vit_dim=64, vit_heads=2, iteration=2,
                  compute_dtype="float32")
    out = _run(opt)
    pred, feat = out
    assert pred.shape == (2, 66)


@pytest.mark.slow
def test_vip_variant():
    opt = Options(net="ViP", iteration=2, compute_dtype="float32")
    model, mean = build_model(opt, image_size=IMG)
    x = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1),
         "dropout": jax.random.key(2)}, x)
    (pred, feat), _ = model.apply(variables, x, train=True,
                                  rngs={"dropout": jax.random.key(3)},
                                  mutable=["batch_stats", "constants"])
    assert pred.shape == (2, 66)


def test_vip_remat_is_numerically_identical(rng):
    """``ViP(remat=True)`` (the measured train-speed/memory win for
    this activation-heavy head, benchmarks/probe_vip_remat.py) must be
    a pure scheduling change: same parameter tree, same forward, same
    gradients — checkpoints interchangeable across the flag."""
    from scat_tpu.models.performer import ViP
    mean = jnp.zeros((66,)).at[0].set(5.0)
    kw = dict(mean_params=mean, image_pix=32, patch_pix=4, emb_s=16,
              heads=2, depth=2, iteration=1)
    m0, m1 = ViP(**kw), ViP(**kw, remat=True)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    v = m0.init({"params": jax.random.key(0),
                 "dropout": jax.random.key(1)}, x, train=False)
    assert jax.tree.structure(v["params"]) == jax.tree.structure(
        m1.init({"params": jax.random.key(0),
                 "dropout": jax.random.key(1)}, x,
                train=False)["params"])
    p0, _ = m0.apply(v, x, train=False)
    p1, _ = m1.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                               atol=1e-6)

    def loss(params, model):
        out, _ = model.apply(
            {"params": params, "constants": v["constants"]}, x,
            train=True, rngs={"dropout": jax.random.key(2)})
        return jnp.sum(out ** 2)

    g0 = jax.grad(loss)(v["params"], m0)
    g1 = jax.grad(loss)(v["params"], m1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_vip_trains_and_checkpoints_constants(tmp_path):
    """ViP's frozen FAVOR+ projection (flax "constants" collection)
    must flow through the REAL train step and survive a checkpoint
    roundtrip — round 3 found the step dropped the collection entirely
    (ScopeCollectionNotFound on ``--net ViP``) and checkpoints lost the
    projection, so a re-seeded evaluator would decode with a different
    feature map."""
    import optax
    from scat_tpu.training import steps
    from scat_tpu.training.state import TrainState
    from scat_tpu.utils import checkpoint as ckpt_lib

    opt = Options(net="ViP", iteration=1, compute_dtype="float32")
    model, mean = build_model(opt, image_size=32)
    x = jnp.ones((2, 32, 32, 3), jnp.float32) * 0.1
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1),
         "dropout": jax.random.key(2)}, x, train=True)
    assert variables.get("constants"), "ViP should have frozen constants"

    tx = optax.adam(1e-4)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.key(3),
                              constants=variables["constants"])
    step = jax.jit(steps.make_train_step(model, tx, 1e5, 10.0))
    batch = {"image": x, "label": jnp.zeros((2, 105))}
    state2, stats = step(state, batch)
    assert np.isfinite(float(stats["loss"]))

    # the frozen projection is untouched by the update...
    w0 = jax.tree.leaves(state.constants)[0]
    w1 = jax.tree.leaves(state2.constants)[0]
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))

    # ...and survives a full-state checkpoint roundtrip
    ckpt_lib.save_state(str(tmp_path), state2, name="hand_net_final")
    blank = jax.tree.map(jnp.zeros_like, state2)
    restored = ckpt_lib.restore_state(
        str(tmp_path / "hand_net_final"), blank)
    wr = jax.tree.leaves(restored.constants)[0]
    np.testing.assert_array_equal(np.asarray(wr), np.asarray(w1))

    # eval step runs with the restored constants
    ev = jax.jit(steps.make_eval_step(
        model, constants=restored.constants))
    out = ev(restored.params, restored.batch_stats, batch)
    assert np.all(np.isfinite(np.asarray(out["mpjpe_per_sample"])))


def test_favor_attention_approximates_softmax(rng):
    """FAVOR+ with many features approximates softmax attention
    (reference vision_performer.py:34-53 math check)."""
    from scat_tpu.models.performer import favor_attention
    d, T, m = 16, 8, 4096
    q = jnp.asarray(rng.randn(1, T, d) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(1, T, d) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(1, T, d), jnp.float32)
    w = jnp.asarray(rng.randn(m, d), jnp.float32)
    got = np.asarray(favor_attention(q, k, v, w))[0]
    # exact softmax attention with the gaussian-kernel normalization
    s = np.asarray(q[0]) @ np.asarray(k[0]).T
    p = np.exp(s - s.max())
    p /= p.sum(-1, keepdims=True)
    want = p @ np.asarray(v[0])
    np.testing.assert_allclose(got, want, atol=0.15)


@pytest.mark.slow
def test_yunqian_transformer(rng):
    from scat_tpu.models.vit import YunqianTransformer
    model = YunqianTransformer(dim=64, depth=2, heads=2, out_dim=61)
    x = jnp.asarray(rng.randn(2, 10, 64), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 10, 61)


def test_check_eval_variables_guards_vip_constants():
    """Injected eval variables without ViP's frozen FAVOR+ 'constants'
    collection must fail loudly at construction, not deep inside flax
    at the first batch."""
    from scat_tpu.config import Options
    from scat_tpu.models import check_eval_variables
    opt = Options()
    opt.net = "ViP"
    with pytest.raises(ValueError, match="constants"):
        check_eval_variables(opt, {"params": {}})
    with pytest.raises(ValueError, match="constants"):
        check_eval_variables(opt, {"params": {}, "constants": {}})
    check_eval_variables(opt, {"params": {}, "constants": {"w": 1}})
    opt.net = "reg_transformer"   # non-ViP nets don't need the guard
    check_eval_variables(opt, {"params": {}})


@pytest.mark.slow
def test_demo_runner_restores_vip_constants(tmp_path):
    """DemoRunner(variables=None) must restore ViP's frozen FAVOR+
    'constants' from the checkpoint, not keep the init-drawn projection
    — check_eval_variables can't catch this (init constants exist, they
    are merely WRONG), so the demo would silently decode with a
    different feature map than training used."""
    import optax
    from scat_tpu.evaluation.demo import DemoRunner
    from scat_tpu.training.state import TrainState
    from scat_tpu.utils import checkpoint as ckpt_lib

    opt = Options(net="ViP", iteration=1, compute_dtype="float32",
                  result_dir=str(tmp_path / "out"))
    model, mean = build_model(opt, image_size=32)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    # a DIFFERENT rng than DemoRunner's own init (key(0)): the saved
    # projection must win over the re-drawn one
    variables = model.init(
        {"params": jax.random.key(7), "mask": jax.random.key(8),
         "dropout": jax.random.key(9)}, x, train=True)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}),
                              optax.adam(1e-4), jax.random.key(3),
                              constants=variables["constants"])
    ckpt_lib.save_state(str(tmp_path), state, name="hand_net_final")
    opt.checkpoint_path_eval = str(tmp_path / "hand_net_final")

    runner = DemoRunner(opt, image_size=32)
    saved = jax.tree.leaves(variables["constants"])
    got = jax.tree.leaves(runner.variables.get("constants", {}))
    assert got, "DemoRunner dropped the constants collection"
    for a, b in zip(saved, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_token_heads_pallas_matches_xla(rng):
    """The 128-token HRNet/Inception head CAN ride the flash kernel
    (SURVEY §2.10 reuse) — interpret-mode kernel output must match the
    XLA path exactly on the same params.  The factory keeps these heads
    on XLA by default because the kernel measures 1-3.5% slower at this
    scale on v5e (benchmarks/RESULTS.md, same verdict as FAVOR+)."""
    opt = Options(net="backbone_incepv3", vit_heads=2,
                  compute_dtype="float32")
    m_xla, _ = build_model(opt, image_size=224)
    assert not m_xla.use_pallas  # measured-faster default
    m_pl = m_xla.clone(use_pallas=True)
    x = jnp.asarray(rng.randn(2, 224, 224, 3), jnp.float32)
    variables = m_xla.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x,
        train=False)
    a = m_xla.apply(variables, x, train=False)
    b = m_pl.apply(variables, x, train=False)  # same param tree
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
