"""Pyramid-transformer parity tests against a torch re-execution of the
reference architecture (reference models/vision_transformer.py:13-101)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

import pytest

from scat_tpu.models.transformer import (
    PyramidTransformer, PyramidTransformerAttn, random_token_mask,
    sinusoidal_position_encoding)


def _torch_pyramid(dim, depth, heads, dim_head):
    """Reference vision_transformer.py:81-101 re-executed in torch."""

    class FF(tnn.Module):
        def __init__(self, d, hidden, out):
            super().__init__()
            self.net = tnn.Sequential(tnn.Linear(d, hidden), tnn.GELU(),
                                      tnn.Linear(hidden, out))

        def forward(self, x):
            return self.net(x)

    class Attn(tnn.Module):
        def __init__(self, d):
            super().__init__()
            inner = dim_head * heads
            self.h = heads
            self.scale = dim_head ** -0.5
            self.to_qkv = tnn.Linear(d, inner * 3, bias=False)
            self.to_out = tnn.Linear(inner, d)

        def forward(self, x):
            b, n, _ = x.shape
            qkv = self.to_qkv(x).chunk(3, dim=-1)
            q, k, v = [t.reshape(b, n, self.h, -1).permute(0, 2, 1, 3)
                       for t in qkv]
            dots = torch.einsum("bhid,bhjd->bhij", q, k) * self.scale
            attn = dots.softmax(dim=-1)
            out = torch.einsum("bhij,bhjd->bhid", attn, v)
            out = out.permute(0, 2, 1, 3).reshape(b, n, -1)
            return self.to_out(out)

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            d = dim
            self.layers = tnn.ModuleList()
            for i in range(depth):
                if i == depth - 1:
                    self.layers.append(tnn.ModuleList(
                        [tnn.LayerNorm(d), Attn(d),
                         FF(d, (d * 3) // 4, 3)]))
                else:
                    self.layers.append(tnn.ModuleList(
                        [tnn.LayerNorm(d), Attn(d), tnn.LayerNorm(d),
                         FF(d, (d * 3) // 4, d // 2)]))
                    d = d // 2

        def forward(self, x):
            for i, mods in enumerate(self.layers):
                if i == len(self.layers) - 1:
                    norm, attn, ff = mods
                    x = attn(norm(x)) + x
                    x = ff(x)
                else:
                    norm1, attn, norm2, ff = mods
                    x = attn(norm1(x)) + x
                    x = ff(norm2(x))
            return x

    return Model()


def _copy_params_to_flax(tm, params, depth):
    """Copy torch weights into the flax param tree (transposed kernels)."""
    import flax
    p = flax.core.unfreeze(params)
    for i, mods in enumerate(tm.layers):
        final = i == depth - 1
        if final:
            norm, attn, ff = mods
        else:
            norm, attn, norm2, ff = mods
            p[f"ff_norm_{i}"]["scale"] = norm2.weight.detach().numpy()
            p[f"ff_norm_{i}"]["bias"] = norm2.bias.detach().numpy()
        p[f"attn_norm_{i}"]["scale"] = norm.weight.detach().numpy()
        p[f"attn_norm_{i}"]["bias"] = norm.bias.detach().numpy()
        p[f"attn_{i}"]["to_qkv"]["kernel"] = \
            attn.to_qkv.weight.detach().numpy().T
        p[f"attn_{i}"]["to_out"]["kernel"] = \
            attn.to_out.weight.detach().numpy().T
        p[f"attn_{i}"]["to_out"]["bias"] = attn.to_out.bias.detach().numpy()
        p[f"ff_{i}"]["Dense_0"]["kernel"] = \
            ff.net[0].weight.detach().numpy().T
        p[f"ff_{i}"]["Dense_0"]["bias"] = ff.net[0].bias.detach().numpy()
        p[f"ff_{i}"]["Dense_1"]["kernel"] = \
            ff.net[2].weight.detach().numpy().T
        p[f"ff_{i}"]["Dense_1"]["bias"] = ff.net[2].bias.detach().numpy()
    return p


@pytest.mark.slow
def test_pyramid_output_shape_and_dims(rng):
    model = PyramidTransformer(dim=784, depth=3, heads=8, dim_head=64)
    x = jnp.asarray(rng.randn(2, 21, 784), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 21, 3)


def test_pyramid_matches_torch_reference(rng):
    torch.manual_seed(0)
    depth = 3
    tm = _torch_pyramid(784, depth, 8, 64).eval()
    model = PyramidTransformer(dim=784, depth=depth, heads=8, dim_head=64)
    x = rng.randn(2, 21, 784).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    params = _copy_params_to_flax(tm, params, depth)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_attn_variant_returns_last_attention(rng):
    model = PyramidTransformerAttn(dim=784, depth=3, heads=8, dim_head=64)
    x = jnp.asarray(rng.randn(2, 21, 784), jnp.float32)
    params = model.init(jax.random.key(0), x)
    out, attn = model.apply(params, x)
    assert out.shape == (2, 21, 3)
    assert attn.shape == (2, 8, 21, 21)
    np.testing.assert_allclose(np.asarray(attn).sum(-1),
                               np.ones((2, 8, 21)), atol=1e-5)


def test_sinusoidal_pe_matches_torch_formula():
    d, n = 784, 21
    pe = np.asarray(sinusoidal_position_encoding(n, d))
    position = np.arange(n)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d, 2) * (-np.log(10000.0) / d))
    want = np.zeros((n, d))
    want[:, 0::2] = np.sin(position * div)
    want[:, 1::2] = np.cos(position * div)
    np.testing.assert_allclose(pe, want, atol=1e-4)  # f32 sin/cos error


def test_random_token_mask_distribution():
    n, rate = 21, 0.2
    k = int(rate * n)
    counts = np.zeros(n)
    for i in range(200):
        flags = np.asarray(random_token_mask(jax.random.key(i), n, rate))
        assert flags.sum() == k
        counts += flags
    # uniform-ish coverage: every token masked sometimes
    assert counts.min() > 0
