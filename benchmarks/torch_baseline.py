"""Measure the reference (torch) training throughput in this
environment, for bench.py's ``vs_baseline`` denominator.

The reference repo can't run as shipped here (no CUDA, missing modules,
missing datasets — SURVEY.md), so this re-executes its exact
architecture and train step in torch on CPU: 5-output ResNet-50
(resnet.py:101-162), 1x1 conv to 21 tokens + sinusoidal PE + pyramid
transformer 784->392->196->3 (vision_transformer.py:81-101,
hand_net.py:315-398), 3-step iterative regressor, weak-perspective
projection, MSE-3D + L1-2D loss (train.py:164-203), Adam.

Usage: python benchmarks/torch_baseline.py [--batch_size 96 --iters 3]
Prints one JSON line {"torch_cpu_samples_per_sec": N}.
"""

import argparse
import json
import math
import time

import numpy as np
import torch
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


class ResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make(64, 3)
        self.layer2 = self._make(128, 4, 2)
        self.layer3 = self._make(256, 6, 2)
        self.layer4 = self._make(512, 3, 2)
        self.avgpool = nn.AvgPool2d(7, stride=1)
        self.fc1 = nn.Linear(2048, 1024)

    def _make(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        f = self.avgpool(x4).flatten(1)
        f = self.relu(self.fc1(self.relu(f)))
        return f, x1, x2, x3, x4


class Attention(nn.Module):
    def __init__(self, dim, heads=8, dim_head=64):
        super().__init__()
        inner = heads * dim_head
        self.h = heads
        self.scale = dim_head ** -0.5
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Linear(inner, dim)

    def forward(self, x):
        b, n, _ = x.shape
        q, k, v = [t.reshape(b, n, self.h, -1).permute(0, 2, 1, 3)
                   for t in self.to_qkv(x).chunk(3, -1)]
        attn = (torch.einsum("bhid,bhjd->bhij", q, k)
                * self.scale).softmax(-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        return self.to_out(out.permute(0, 2, 1, 3).reshape(b, n, -1))


class Pyramid(nn.Module):
    def __init__(self, dim=784, depth=3, heads=8):
        super().__init__()
        self.layers = nn.ModuleList()
        for i in range(depth):
            final = i == depth - 1
            ff_out = 3 if final else dim // 2
            self.layers.append(nn.ModuleList([
                nn.LayerNorm(dim), Attention(dim, heads),
                nn.Identity() if final else nn.LayerNorm(dim),
                nn.Sequential(nn.Linear(dim, (dim * 3) // 4), nn.GELU(),
                              nn.Linear((dim * 3) // 4, ff_out)),
                ]))
            if not final:
                dim //= 2

    def forward(self, x):
        for i, (norm, attn, norm2, ff) in enumerate(self.layers):
            x = attn(norm(x)) + x
            x = ff(x if i == len(self.layers) - 1 else norm2(x))
        return x


class EncoderTransformer(nn.Module):
    def __init__(self, mean_params, iteration=3, heads=8):
        super().__init__()
        self.backbone = ResNet50()
        self.conv1x1 = nn.Conv2d(512, 21, 1, bias=False)
        self.transformer = Pyramid(784, 3, heads)
        self.regressor = nn.Linear(1024 + 66, 66)
        self.register_buffer("mean_params", mean_params)
        self.mask_token = nn.Parameter(torch.randn(1, 1, 784))
        pe = torch.zeros(21, 784)
        pos = torch.arange(21).float().unsqueeze(1)
        div = torch.exp(torch.arange(0, 784, 2).float()
                        * (-math.log(10000.0) / 784))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe.unsqueeze(0))
        self.iteration = iteration

    def forward(self, x):
        import random
        feat_all, _, x2, _, _ = self.backbone(x)
        fv = self.conv1x1(x2)
        feat = fv.view(fv.size(0), 21, -1) + self.pe
        masked = list(range(21))
        random.shuffle(masked)
        feat[:, masked[:4], :] = self.mask_token
        out = self.transformer(feat).reshape(x.size(0), -1)
        pred = self.mean_params.repeat(x.size(0), 1).clone()
        pred[:, 3:] += out
        for _ in range(self.iteration):
            pred = pred + self.regressor(
                torch.cat([feat_all, pred], 1))
        p3 = pred[:, 3:66].view(-1, 21, 3)
        p3 = p3 - p3[:, 1:2]
        pred = torch.cat([pred[:, :3], p3.reshape(-1, 63)], 1)
        return pred, fv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=96)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)
    torch.manual_seed(0)
    mean = torch.zeros(1, 66)
    mean[0, 0] = 5.0
    net = EncoderTransformer(mean)
    opt = torch.optim.Adam(net.parameters(), lr=5e-4)
    x = torch.randn(args.batch_size, 3, 224, 224)
    gt = torch.randn(args.batch_size, 105) * 0.01

    def step():
        opt.zero_grad()
        pred, _ = net(x)
        cam = pred[:, :3].view(-1, 1, 3)
        j3 = pred[:, 3:66].view(-1, 21, 3)
        j2 = cam[:, :, 0:1] * (j3[:, :, :2] + cam[:, :, 1:]) * 112 + 112
        loss = (1e5 * nn.MSELoss()(j3.reshape(-1, 63), gt[:, :63])
                + 10 * nn.L1Loss()(j2.reshape(-1, 42), gt[:, 63:]))
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "torch_cpu_samples_per_sec":
            round(args.batch_size * args.iters / dt, 3),
        "ms_per_step": round(dt / args.iters * 1000, 1),
        "batch_size": args.batch_size,
        "device": "cpu",
        "torch_version": torch.__version__,
    }))


if __name__ == "__main__":
    main()
