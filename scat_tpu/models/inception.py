"""Inception-v3 backbone, truncated after Mixed_6e.

Reference models/inception.py:30-144: the torchvision Inception3 stem and
A/B/C blocks; ``_forward`` returns the 768-channel map after Mixed_6e
(12x12 at 224 input) — the D/E blocks, avgpool and fc are constructed
but never executed (inception.py:108-139), so they are omitted here.
Used with ``aux_logits=False`` (reference hand_net.py:92).

NHWC / flax.linen; BasicConv2d = conv(bias=False) + BN(eps 1e-3) + relu.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

Kernel = Union[int, Tuple[int, int]]


def _pair(k: Kernel) -> Tuple[int, int]:
    return (k, k) if isinstance(k, int) else k


class BasicConv2d(nn.Module):
    """torchvision BasicConv2d: conv + BN(eps=0.001) + relu."""

    features: int
    kernel: Kernel
    stride: int = 1
    padding: Kernel = 0
    dtype: Any = jnp.float32
    train: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel)
        ph, pw = _pair(self.padding)
        x = nn.Conv(self.features, (kh, kw), (self.stride, self.stride),
                    padding=[(ph, ph), (pw, pw)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    """reference inception.py:147-187."""

    pool_features: int
    dtype: Any = jnp.float32
    train: bool = True

    @nn.compact
    def __call__(self, x):
        conv = partial(BasicConv2d, dtype=self.dtype, train=self.train)
        b1 = conv(64, 1, name="branch1x1")(x)
        b5 = conv(48, 1, name="branch5x5_1")(x)
        b5 = conv(64, 5, padding=2, name="branch5x5_2")(b5)
        b3 = conv(64, 1, name="branch3x3dbl_1")(x)
        b3 = conv(96, 3, padding=1, name="branch3x3dbl_2")(b3)
        b3 = conv(96, 3, padding=1, name="branch3x3dbl_3")(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1),
                         padding=((1, 1), (1, 1)))
        bp = conv(self.pool_features, 1, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    """reference inception.py:190-220."""

    dtype: Any = jnp.float32
    train: bool = True

    @nn.compact
    def __call__(self, x):
        conv = partial(BasicConv2d, dtype=self.dtype, train=self.train)
        b3 = conv(384, 3, stride=2, name="branch3x3")(x)
        bd = conv(64, 1, name="branch3x3dbl_1")(x)
        bd = conv(96, 3, padding=1, name="branch3x3dbl_2")(bd)
        bd = conv(96, 3, stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    """reference inception.py:223-270."""

    channels_7x7: int
    dtype: Any = jnp.float32
    train: bool = True

    @nn.compact
    def __call__(self, x):
        conv = partial(BasicConv2d, dtype=self.dtype, train=self.train)
        c7 = self.channels_7x7
        b1 = conv(192, 1, name="branch1x1")(x)
        b7 = conv(c7, 1, name="branch7x7_1")(x)
        b7 = conv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = conv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = conv(c7, 1, name="branch7x7dbl_1")(x)
        bd = conv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = conv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = conv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = conv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1),
                         padding=((1, 1), (1, 1)))
        bp = conv(192, 1, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class Inception3(nn.Module):
    """Truncated Inception-v3 (stem through Mixed_6e); returns the
    768-channel NHWC map (reference inception.py:108-139)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = partial(BasicConv2d, dtype=self.dtype, train=train)
        x = conv(32, 3, stride=2, name="Conv2d_1a_3x3")(x)
        x = conv(32, 3, name="Conv2d_2a_3x3")(x)
        x = conv(64, 3, padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = conv(80, 1, name="Conv2d_3b_1x1")(x)
        x = conv(192, 3, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, self.dtype, train, name="Mixed_5b")(x)
        x = InceptionA(64, self.dtype, train, name="Mixed_5c")(x)
        x = InceptionA(64, self.dtype, train, name="Mixed_5d")(x)
        x = InceptionB(self.dtype, train, name="Mixed_6a")(x)
        x = InceptionC(128, self.dtype, train, name="Mixed_6b")(x)
        x = InceptionC(160, self.dtype, train, name="Mixed_6c")(x)
        x = InceptionC(160, self.dtype, train, name="Mixed_6d")(x)
        x = InceptionC(192, self.dtype, train, name="Mixed_6e")(x)
        return x
