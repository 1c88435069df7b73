"""Fused FAVOR+ kernel vs the XLA performer path (interpret mode on the
CPU test platform; compiles via Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scat_tpu.ops.pallas_favor as pf
from scat_tpu.models.performer import favor_attention


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pf, "_INTERPRET", True)


def test_fused_favor_matches_reference(rng):
    b, h, t, e, m = 2, 4, 33, 128, 64
    q = jnp.asarray(rng.randn(b, h, t, e) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(b, h, t, e) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, e), jnp.float32)
    w = jnp.asarray(rng.randn(m, e), jnp.float32)
    got = pf.favor_attention_fused(q, k, v, w)
    want = favor_attention(q, k, v, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=1e-3)


def test_fused_favor_3d_input(rng):
    b, t, e, m = 3, 10, 64, 32
    q = jnp.asarray(rng.randn(b, t, e) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(b, t, e) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(b, t, e), jnp.float32)
    w = jnp.asarray(rng.randn(m, e), jnp.float32)
    got = pf.favor_attention_fused(q, k, v, w)
    want = favor_attention(q, k, v, w)
    assert got.shape == (b, t, e)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=1e-3)


@pytest.mark.slow
def test_fused_favor_grad_matches(rng):
    b, h, t, e, m = 1, 2, 9, 32, 16
    q = jnp.asarray(rng.randn(b, h, t, e) * 0.2, jnp.float32)
    k = jnp.asarray(rng.randn(b, h, t, e) * 0.2, jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, e), jnp.float32)
    w = jnp.asarray(rng.randn(m, e), jnp.float32)

    g1 = jax.grad(lambda q, k, v: jnp.sum(
        pf.favor_attention_fused(q, k, v, w) ** 2), argnums=(0, 1, 2))(
            q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(
        favor_attention(q, k, v, w) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-2,
                                   err_msg=f"d{name}")


def test_favor_precision_ladder_rungs(rng):
    """Every favor_precision rung computes the same attention (exactly,
    on CPU — precision hints only bind on TPU MXU lowering) and every
    rung name resolves (models/performer.py favor_precisions; measured
    on-chip in benchmarks/probe_vip_precision.py)."""
    from scat_tpu.models.performer import favor_precisions
    b, h, t, e, m = 1, 2, 9, 32, 16
    q = jnp.asarray(rng.randn(b, h, t, e) * 0.2, jnp.float32)
    k = jnp.asarray(rng.randn(b, h, t, e) * 0.2, jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, e), jnp.float32)
    w = jnp.asarray(rng.randn(m, e), jnp.float32)
    ref = favor_attention(q, k, v, w, precision="highest")
    for rung in ("highest", "high", "default", "mixed", "mixed_high"):
        favor_precisions(rung)  # resolves
        out = favor_attention(q, k, v, w, precision=rung)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, err_msg=rung)
    with pytest.raises(KeyError):
        favor_precisions("bogus")


def test_vip_favor_precision_field_threads(rng):
    """--favor_precision reaches the ViP blocks through the factory and
    is output-identical on CPU."""
    from scat_tpu.config import Options
    from scat_tpu.models import build_model
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    preds = {}
    for rung in ("highest", "mixed"):
        opt = Options(net="ViP", iteration=1, favor_precision=rung)
        model, _ = build_model(opt, 32)
        assert model.favor_precision == rung
        variables = model.init({"params": jax.random.key(0)}, x,
                               train=False)
        preds[rung] = model.apply(variables, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(preds["mixed"]),
                               np.asarray(preds["highest"]), atol=1e-6)
