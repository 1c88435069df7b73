"""Space-to-depth stem: exact equivalence with the canonical 7x7/s2
conv and unchanged parameter tree (scat_tpu/models/resnet.py Conv7S2D)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from scat_tpu.models.resnet import Conv7S2D


def test_s2d_equals_conv7x7(rng):
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    mod = Conv7S2D(16)
    v = mod.init(jax.random.key(0), x)
    k = v["params"]["kernel"]
    assert k.shape == (7, 7, 3, 16)
    got = mod.apply(v, x)
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert got.shape == want.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_s2d_gradient_matches(rng):
    """The kernel transform is differentiable, so wgrad lands on the
    canonical [7,7,3,F] param identically to the plain conv."""
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    mod = Conv7S2D(8)
    v = mod.init(jax.random.key(0), x)

    def loss_s2d(k):
        return jnp.sum(mod.apply({"params": {"kernel": k}}, x) ** 2)

    def loss_ref(k):
        y = jax.lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_s2d)(v["params"]["kernel"])
    g2 = jax.grad(loss_ref)(v["params"]["kernel"])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_resnet_tree_unchanged(rng):
    """resnet50's param tree keeps conv1/kernel [7,7,3,64] (torch import
    compatibility) and odd input sizes fall back to the plain conv."""
    from scat_tpu.models.resnet import resnet50
    net = resnet50()
    shapes = jax.eval_shape(
        lambda: net.init(jax.random.key(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32),
                         train=False))
    assert shapes["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    shapes_odd = jax.eval_shape(
        lambda: net.init(jax.random.key(0),
                         jnp.zeros((1, 63, 63, 3), jnp.float32),
                         train=False))
    assert shapes_odd["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
