"""ResNet backbone family with the reference's 5-output contract.

Reference models/resnet.py:101-162: a torchvision-style ResNet whose
forward returns ``(feat1024, x1, x2, x3, x4)`` — the 1024-dim FC feature
plus all four stage maps (x2 = [B,28,28,512] at 224 input feeds the
token head).  The classifier is replaced by ``fc1: 512*expansion -> 1024``
with a ReLU on both sides (resnet.py:115-116,155-160).

TPU-first: NHWC layout, flax.linen modules, BatchNorm with running
statistics (cross-replica stats come for free under jit+GSPMD because the
batch axis is one logical array).  Compute dtype is configurable
(bfloat16 default for speed; params stay float32).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


def make_norm(norm_layer: str, train: bool, dtype):
    """Normalization factory.  "batch" matches the reference
    (torch BN, momentum 0.1); "group" (32 groups) is the TPU-friendly
    swap — identical cost in train and eval modes (no batch-statistics
    passes, which cost ~2.8x on the training forward) and trivially
    correct under any sharding (SURVEY.md §2.10 parity flag)."""
    if norm_layer == "batch":
        return partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=dtype)

    def group_norm(name=None):
        # num_groups adapts to narrow stem widths
        class _GN(nn.Module):
            @nn.compact
            def __call__(self, x):
                groups = min(32, x.shape[-1])
                return nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                                    dtype=dtype)(x)
        return _GN(name=name)

    return group_norm


class Conv7S2D(nn.Module):
    """The stem's 7x7/stride-2 convolution executed in space-to-depth
    form — the classic TPU fix for C_in=3 convs (the MXU pads 3 input
    channels to a full register lane; measured ~2 ms/step at bs 96,
    benchmarks/profile_stages.py).

    Numerically EXACT and parameter-compatible: the stored param is the
    canonical ``conv1/kernel`` [7,7,3,F] (torchvision import untouched);
    at apply time the input is packed [B,H,W,3] -> [B,H/2,W/2,12] and the
    kernel is zero-padded to 8x8 and re-blocked to [4,4,12,F], turning
    the stride-2 conv into a stride-1 conv over 12 channels:
      out[o] = sum_k w7[k+3] x[2o+k]  ==  sum_{j,d} w8[2j+d] x2[o+j-2, d]
    with w8 = pad(w7, 1 leading zero per spatial axis).
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.features
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, 3, f))
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                  4 * c)
        k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        pk = k8.reshape(4, 2, 4, 2, 3, f).transpose(0, 2, 1, 3, 4, 5)
        pk = pk.reshape(4, 4, 12, f)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), pk.astype(self.dtype), (1, 1),
            [(2, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    """reference resnet.py:30-59."""

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int] = (1, 1)
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), self.strides,
                      padding=[(1, 1), (1, 1)])(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)])(y)
        y = self.norm()(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * self.expansion, (1, 1),
                                 self.strides, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """reference resnet.py:62-98."""

    filters: int
    conv: ModuleDef
    norm: ModuleDef
    strides: Tuple[int, int] = (1, 1)
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), self.strides,
                      padding=[(1, 1), (1, 1)])(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * self.expansion, (1, 1))(y)
        y = self.norm()(y)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * self.expansion, (1, 1),
                                 self.strides, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Five-output ResNet (reference resnet.py:101-162).

    ``__call__(x, train)`` with NHWC ``x`` returns
    ``(feat [B,1024], x1, x2, x3, x4)`` stage maps in NHWC.
    """

    block: ModuleDef
    stage_sizes: Sequence[int]
    num_features: int = 1024
    norm_layer: str = "batch"   # "batch" (reference parity) | "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = make_norm(self.norm_layer, train, self.dtype)

        # space-to-depth stem when shapes allow (exact + same param
        # tree, see Conv7S2D); plain 7x7 otherwise
        if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0 \
                and x.shape[3] == 3:
            x = Conv7S2D(64, dtype=self.dtype, name="conv1")(x)
        else:
            x = conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                     name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stages = []
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = self.block(64 * 2 ** i, conv=conv, norm=norm,
                               strides=strides,
                               name=f"layer{i + 1}_{j}")(x)
            stages.append(x)
        x1, x2, x3, x4 = stages

        # global average pool (reference avgpool 7x7) + relu + fc1 + relu
        feat = jnp.mean(x4, axis=(1, 2))
        feat = nn.relu(feat)
        feat = nn.Dense(self.num_features, dtype=self.dtype,
                        name="fc1")(feat)
        feat = nn.relu(feat)
        return feat.astype(jnp.float32), x1, x2, x3, x4


def resnet18(dtype=jnp.float32, norm_layer="batch"):
    return ResNet(block=BasicBlock, stage_sizes=[2, 2, 2, 2],
                  norm_layer=norm_layer, dtype=dtype)


def resnet34(dtype=jnp.float32, norm_layer="batch"):
    return ResNet(block=BasicBlock, stage_sizes=[3, 4, 6, 3],
                  norm_layer=norm_layer, dtype=dtype)


def resnet50(dtype=jnp.float32, norm_layer="batch"):
    return ResNet(block=Bottleneck, stage_sizes=[3, 4, 6, 3],
                  norm_layer=norm_layer, dtype=dtype)


def resnet101(dtype=jnp.float32, norm_layer="batch"):
    return ResNet(block=Bottleneck, stage_sizes=[3, 4, 23, 3],
                  norm_layer=norm_layer, dtype=dtype)


def resnet152(dtype=jnp.float32, norm_layer="batch"):
    return ResNet(block=Bottleneck, stage_sizes=[3, 8, 36, 3],
                  norm_layer=norm_layer, dtype=dtype)


_ARCHS = {
    "resnet18": resnet18, "resnet34": resnet34, "resnet50": resnet50,
    "resnet101": resnet101, "resnet152": resnet152,
}


def get_model(arch: str, dtype=jnp.float32,
              norm_layer: str = "batch") -> ResNet:
    """Backbone factory by name (reference hand_net.py:21-26)."""
    if arch not in _ARCHS:
        raise ValueError("Invalid Backbone Architecture")
    return _ARCHS[arch](dtype=dtype, norm_layer=norm_layer)
