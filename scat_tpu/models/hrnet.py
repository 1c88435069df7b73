"""HRNet-W{c} multi-resolution backbone.

Reference models/hrnet.py:10-261: stem (two stride-2 3x3 convs) ->
bottleneck layer1 -> progressive branch creation (transition1-3) with
parallel-resolution StageModules and full cross-resolution fuse layers
(1x1 conv + nearest upsample going up, strided 3x3 chains going down).
Used by the HRNet encoder head as ``HRNet(c=24, nof_joints=128)`` whose
56x56x128 output is reinterpreted as a 512-channel 28x28 map
(reference hand_net.py:187).

NHWC / flax.linen; BatchNorm momentum matches the reference's 0.1 (flax
convention: momentum = 1 - torch_momentum = 0.9).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class HRBottleneck(nn.Module):
    """reference hrnet.py:10-45 (expansion 4)."""

    planes: int
    conv: Any
    norm: Any
    project: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.planes, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)])(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.planes * 4, (1, 1))(y)
        y = self.norm()(y)
        if self.project:
            residual = self.conv(self.planes * 4, (1, 1),
                                 name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class HRBasicBlock(nn.Module):
    """reference hrnet.py:48-77 (expansion 1, same-width use only)."""

    planes: int
    conv: Any
    norm: Any

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)])(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)])(y)
        y = self.norm()(y)
        return nn.relu(y + residual)


def _nearest_upsample(x, factor: int):
    b, h, w, c = x.shape
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


class StageModule(nn.Module):
    """Parallel branches + full fuse (reference hrnet.py:79-144).

    ``fuse_mode``:
      * "sum" (default, reference parity): per-source 1x1 conv + BN +
        nearest-upsample going up, strided 3x3 chains going down, then
        an elementwise SUM over sources (ref :96-144).
      * "concat": traffic/MXU experiment (benchmarks/probe_hrnet.py) —
        upsample the RAW source maps, run the strided chains going
        down, CONCAT everything at the target resolution and fuse with
        ONE 1x1 conv (K = sum of source widths — one large matmul and
        one BN pass instead of per-source smalls).  Same asymptotic
        flops for the up path, different parameterization — a
        non-parity probe variant, not a checkpoint-compatible option.
    """

    stage: int
    output_branches: int
    c: int
    conv: Any
    norm: Any
    fuse_mode: str = "sum"

    @nn.compact
    def __call__(self, xs):
        assert len(xs) == self.stage
        assert self.fuse_mode in ("sum", "concat")
        # four BasicBlocks per branch (ref :88-93)
        ys = []
        for i, x in enumerate(xs):
            w = self.c * (2 ** i)
            for b in range(4):
                x = HRBasicBlock(w, self.conv, self.norm,
                                 name=f"branch{i}_block{b}")(x)
            ys.append(x)
        # fuse (ref :96-144)
        fused = []
        for i in range(self.output_branches):
            acc = None
            cat = []
            for j in range(self.stage):
                y = ys[j]
                if i == j:
                    pass
                elif i < j:
                    if self.fuse_mode == "sum":
                        y = self.conv(self.c * (2 ** i), (1, 1),
                                      name=f"fuse{i}_{j}_conv")(y)
                        y = self.norm(name=f"fuse{i}_{j}_bn")(y)
                        y = _nearest_upsample(y, 2 ** (j - i))
                    else:
                        y = _nearest_upsample(y, 2 ** (j - i))
                else:  # i > j: chain of stride-2 3x3 convs
                    for k in range(i - j - 1):
                        y = self.conv(self.c * (2 ** j), (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                                      name=f"fuse{i}_{j}_down{k}_conv")(y)
                        y = self.norm(name=f"fuse{i}_{j}_down{k}_bn")(y)
                        y = nn.relu(y)
                    y = self.conv(self.c * (2 ** i), (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                                  name=f"fuse{i}_{j}_final_conv")(y)
                    y = self.norm(name=f"fuse{i}_{j}_final_bn")(y)
                if self.fuse_mode == "sum":
                    acc = y if acc is None else acc + y
                else:
                    cat.append(y)
            if self.fuse_mode == "sum":
                fused.append(nn.relu(acc))
            else:
                y = jnp.concatenate(cat, axis=-1)
                y = self.conv(self.c * (2 ** i), (1, 1),
                              name=f"fuse{i}_cat_conv")(y)
                y = self.norm(name=f"fuse{i}_cat_bn")(y)
                fused.append(nn.relu(y))
        return fused


class HRNet(nn.Module):
    """reference hrnet.py:147-261; returns the nof_joints-channel
    highest-resolution map (56x56 at 224 input), NHWC."""

    c: int = 48
    nof_joints: int = 17
    dtype: Any = jnp.float32
    # probe-only knobs (benchmarks/probe_hrnet.py); defaults = parity
    fuse_mode: str = "sum"
    stop_after: str = "full"   # "layer1" | "stage2" | "stage3" | "full"

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.stop_after in ("layer1", "stage2", "stage3",
                                   "full"), self.stop_after
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        # stem
        x = conv(64, (3, 3), (2, 2), padding=[(1, 1), (1, 1)], name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = conv(64, (3, 3), (2, 2), padding=[(1, 1), (1, 1)], name="conv2")(x)
        x = norm(name="bn2")(x)
        x = nn.relu(x)
        # layer1: 4 bottlenecks, first projecting 64 -> 256
        x = HRBottleneck(64, conv, norm, project=True, name="layer1_0")(x)
        for i in range(1, 4):
            x = HRBottleneck(64, conv, norm, name=f"layer1_{i}")(x)
        if self.stop_after == "layer1":
            return x
        stage = partial(StageModule, c=self.c, conv=conv, norm=norm,
                        fuse_mode=self.fuse_mode)
        # transition1 -> 2 branches
        b0 = nn.relu(norm(name="t1_bn0")(conv(self.c, (3, 3), padding=[(1, 1), (1, 1)],
                                              name="t1_conv0")(x)))
        b1 = nn.relu(norm(name="t1_bn1")(conv(self.c * 2, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                                              name="t1_conv1")(x)))
        xs = [b0, b1]
        xs = stage(2, 2, name="stage2_0")(xs)
        if self.stop_after == "stage2":
            return xs[0]
        # transition2 -> new branch from the lowest-res branch
        b2 = nn.relu(norm(name="t2_bn")(conv(self.c * 4, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                                             name="t2_conv")(xs[-1])))
        xs = [xs[0], xs[1], b2]
        for m in range(4):
            xs = stage(3, 3, name=f"stage3_{m}")(xs)
        if self.stop_after == "stage3":
            return xs[0]
        b3 = nn.relu(norm(name="t3_bn")(conv(self.c * 8, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                                             name="t3_conv")(xs[-1])))
        xs = [xs[0], xs[1], xs[2], b3]
        xs = stage(4, 4, name="stage4_0")(xs)
        xs = stage(4, 4, name="stage4_1")(xs)
        xs = stage(4, 1, name="stage4_2")(xs)
        out = nn.Conv(self.nof_joints, (1, 1), dtype=self.dtype,
                      name="final_layer")(xs[0])
        return out
