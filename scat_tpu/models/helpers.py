"""Auxiliary model components kept for inventory parity.

* :class:`TruncatedResNet` — ResNet cut after layer2 returning the
  [B,28,28,512]-class map, zero-init'able residual path (reference
  models/helper/resnet_helper.py:101-158; exported but unused by the
  shipped encoders).
* :class:`SPADE` — spatially-adaptive denormalization (segmap-conditioned
  gamma/beta over a parameter-free BatchNorm/InstanceNorm, reference
  models/helper/spatial_norm.py:20-59; exported, unused).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from scat_tpu.models.resnet import Bottleneck


class TruncatedResNet(nn.Module):
    """ResNet-50-style trunk ending after layer2
    (reference resnet_helper.py:101-158): returns the stride-8 map."""

    stage_sizes: Sequence[int] = (3, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                 name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = Bottleneck(64 * 2 ** i, conv=conv, norm=norm,
                               strides=strides,
                               name=f"layer{i + 1}_{j}")(x)
        return x


class SPADE(nn.Module):
    """Spatially-adaptive denorm (reference spatial_norm.py:20-59):
    normalize x (parameter-free), then modulate with gamma/beta maps
    produced from a (resized) segmentation map."""

    norm_nc: int
    label_nc: int
    # "The dimension of the intermediate embedding space.  Yes,
    # hardcoded." — 32 in the reference (spatial_norm.py:35)
    nhidden: int = 32
    param_free_norm_type: str = "batch"
    ks: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, segmap, train: bool = True):
        if self.param_free_norm_type == "batch":
            normalized = nn.BatchNorm(
                use_running_average=not train, use_bias=False,
                use_scale=False, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="param_free_norm")(x)
        elif self.param_free_norm_type == "instance":
            mean = x.mean(axis=(1, 2), keepdims=True)
            var = x.var(axis=(1, 2), keepdims=True)
            normalized = (x - mean) / jnp.sqrt(var + 1e-5)
        else:
            raise ValueError(
                f"{self.param_free_norm_type} is not a recognized "
                "param-free norm type in SPADE")
        # nearest-resize segmap to x's spatial dims
        b, h, w, _ = x.shape
        sh, sw = segmap.shape[1:3]
        ys = (jnp.arange(h) * sh // h)
        xs = (jnp.arange(w) * sw // w)
        seg = segmap[:, ys][:, :, xs]
        pad = self.ks // 2
        actv = nn.Conv(self.nhidden, (self.ks, self.ks),
                       padding=[(pad, pad), (pad, pad)],
                       dtype=self.dtype, name="mlp_shared")(seg)
        actv = nn.relu(actv)
        gamma = nn.Conv(self.norm_nc, (self.ks, self.ks),
                        padding=[(pad, pad), (pad, pad)],
                        dtype=self.dtype, name="mlp_gamma")(actv)
        beta = nn.Conv(self.norm_nc, (self.ks, self.ks),
                       padding=[(pad, pad), (pad, pad)],
                       dtype=self.dtype, name="mlp_beta")(actv)
        return normalized * (1 + gamma) + beta
