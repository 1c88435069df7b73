"""Pallas fused attention vs the XLA reference path, forward and VJP.

Runs in interpreter mode on the CPU test platform; the same kernel
compiles via Mosaic on TPU (exercised by bench.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scat_tpu.ops.pallas_attention as pa
from scat_tpu.models.transformer import mha_reference


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pa, "_INTERPRET", True)


@pytest.mark.parametrize("b,h,n,d", [(2, 8, 21, 64), (1, 4, 128, 64),
                                     (3, 2, 21, 64)])
def test_flash_matches_reference_forward(rng, b, h, n, d):
    q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    scale = d ** -0.5
    got = pa.flash_attention(q, k, v, scale)
    want = mha_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_flash_vjp_matches_reference(rng):
    b, h, n, d = 2, 4, 21, 64
    q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    scale = d ** -0.5
    cot = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)

    def f_pallas(q, k, v):
        return pa.flash_attention(q, k, v, scale)

    def f_ref(q, k, v):
        return mha_reference(q, k, v, scale)

    _, vjp_p = jax.vjp(f_pallas, q, k, v)
    _, vjp_r = jax.vjp(f_ref, q, k, v)
    got = vjp_p(cot)
    want = vjp_r(cot)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=3e-5,
                                   err_msg=f"d{name} mismatch")


def test_flash_mask_fallback(rng):
    b, h, n, d = 2, 2, 21, 64
    q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    mask = jnp.asarray(rng.rand(b, n) > 0.3)
    got = pa.flash_attention(q, k, v, d ** -0.5, mask=mask)
    want = mha_reference(q, k, v, d ** -0.5, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_flash_in_jit(rng):
    b, h, n, d = 1, 2, 21, 64
    q = jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    got = jax.jit(lambda q: pa.flash_attention(q, q, q, d ** -0.5))(q)
    want = mha_reference(q, q, q, d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
