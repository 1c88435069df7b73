"""Per-stage forward cost of the ResNet-50 backbone on the chip:
stem (C_in=3 conv, the classic TPU padding pathology), each residual
stage, and the head — train and eval modes, plus a space-to-depth stem
probe to size that optimization before building it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_stages.py
"""

import argparse
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import flax.linen as nn


def timed_loop(make_body, label, results, K=20):
    def prog(seed):
        def body(i, acc):
            return acc + make_body(i + seed)
        return jax.lax.fori_loop(0, K, body, 0.0)
    f = jax.jit(prog)
    jax.block_until_ready(f(jnp.int32(0)))
    t0 = time.perf_counter()
    jax.block_until_ready(f(jnp.int32(1)))
    dt = (time.perf_counter() - t0) / K * 1000
    results[label] = round(dt, 2)
    print(f"{label:46s} {dt:8.2f} ms")


class Stem(nn.Module):
    dtype: any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


class StemS2D(nn.Module):
    """Space-to-depth stem: [B,224,224,3] -> [B,112,112,12] blocks of
    2x2, then a 4x4 stride-1... equivalently the 7x7/s2 conv zero-padded
    to 8x8 and reshaped to operate on the 12-channel packed input."""
    dtype: any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=True):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.Conv(64, (4, 4), (1, 1), padding=[(2, 1), (2, 1)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=96)
    args = ap.parse_args()
    from scat_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    from scat_tpu.models import resnet as resnet_lib

    bs = args.bs
    results = {"bs": bs}
    dtype = jnp.bfloat16

    # full backbone, for reference
    net = resnet_lib.resnet50(dtype=dtype)
    variables = net.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                         train=False)

    def an(i, shape):
        base = jax.random.normal(jax.random.key(7), shape, jnp.float32)
        return base * (1.0 + 0.001 * jnp.float32(i))

    # --- stems
    for name, mod in (("stem 7x7 (conv1+bn+relu+pool)", Stem()),
                      ("stem space-to-depth", StemS2D())):
        v = mod.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                     train=False)
        for train in (False, True):
            def body(i, mod=mod, v=v, train=train):
                out = mod.apply(v, an(i, (bs, 224, 224, 3)), train=train,
                                mutable=["batch_stats"] if train else False)
                o = out[0] if train else out
                return jnp.sum(o.astype(jnp.float32))
            timed_loop(body, f"{name} {'train' if train else 'eval'}",
                       results)

    # --- per-stage: apply the full net but time cumulative prefixes via
    # intermediates capture is complex; instead time standalone stage
    # stacks with representative inputs
    from scat_tpu.models.resnet import Bottleneck
    stage_cfg = [  # (filters, blocks, stride, in_shape)
        (64, 3, 1, (bs, 56, 56, 64)),
        (128, 4, 2, (bs, 56, 56, 256)),
        (256, 6, 2, (bs, 28, 28, 512)),
        (512, 3, 2, (bs, 14, 14, 1024)),
    ]

    class StageStack(nn.Module):
        filters: int
        blocks: int
        stride: int
        dtype: any = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train=True):
            conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
            norm = resnet_lib.make_norm("batch", train, self.dtype)
            for j in range(self.blocks):
                strides = ((self.stride, self.stride) if j == 0
                           else (1, 1))
                x = Bottleneck(self.filters, conv=conv, norm=norm,
                               strides=strides, name=f"b{j}")(x)
            return x

    for si, (f, blocks, stride, shape) in enumerate(stage_cfg):
        mod = StageStack(f, blocks, stride)
        v = mod.init(jax.random.key(0), jnp.zeros((1,) + shape[1:]),
                     train=False)
        for train in (False, True):
            def body(i, mod=mod, v=v, shape=shape, train=train):
                out = mod.apply(v, an(i, shape).astype(dtype),
                                train=train,
                                mutable=["batch_stats"] if train else False)
                o = out[0] if train else out
                return jnp.sum(o.astype(jnp.float32))
            timed_loop(body, f"layer{si + 1} "
                       f"{'train' if train else 'eval'}", results)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
