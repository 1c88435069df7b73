"""ResNet backbone parity: build the reference's torch ResNet-50
(reference models/resnet.py:62-162 re-executed), import its state_dict
through torch_import, and check our flax forward matches stage-for-stage
— this validates both the weight converter and the conv/BN semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

import flax

from scat_tpu.models.resnet import resnet50
from scat_tpu.utils.torch_import import import_torch_resnet


class TorchBottleneck(tnn.Module):
    """reference resnet.py:62-98."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


class TorchResNet50(tnn.Module):
    """reference resnet.py:101-162 (torchvision-compatible names)."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride,
                                  downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        x4 = self.layer4(x3)
        return x1, x2, x3, x4


@pytest.mark.slow
def test_resnet50_matches_torch_reference(rng):
    torch.manual_seed(0)
    tm = TorchResNet50()
    # randomize BN stats so the eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    tm.eval()
    sd = tm.state_dict()

    model = resnet50()
    x_np = rng.randn(2, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np),
                           train=False)
    params = flax.core.unfreeze(variables["params"])
    batch_stats = flax.core.unfreeze(variables["batch_stats"])
    merged = import_torch_resnet(sd, params, batch_stats)
    assert merged > 200, f"only {merged} tensors merged"

    feat, x1, x2, x3, x4 = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x_np), train=False)
    with torch.no_grad():
        t1, t2, t3, t4 = tm(torch.from_numpy(
            x_np.transpose(0, 3, 1, 2)))

    for ours, theirs, name in [(x1, t1, "x1"), (x2, t2, "x2"),
                               (x3, t3, "x3"), (x4, t4, "x4")]:
        got = np.asarray(ours).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, theirs.numpy(), atol=2e-3,
                                   err_msg=f"stage {name}")
