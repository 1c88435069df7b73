"""Pretrained-weight import: torchvision ResNet state_dict -> flax params.

The reference downloads ImageNet ResNet weights from the torch model zoo
and merges them with ``strict=False`` (reference resnet.py:186-196).
Zero-egress TPU pods can't download, so this utility converts a local
``.pth``/state-dict into our flax parameter tree; anything that doesn't
match (fc1, the 5-output head) keeps its fresh initialization — the same
partial-load semantics.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


class _Merger:
    def __init__(self, params: Dict, batch_stats: Dict,
                 sd: Mapping[str, Any]):
        self.params = params
        self.batch_stats = batch_stats
        self.sd = sd
        self.merged = 0
        self.skipped = []

    def _set(self, tree: Dict, path: Tuple[str, ...], value: np.ndarray):
        node = tree
        for k in path[:-1]:
            if not isinstance(node, dict) or k not in node:
                self.skipped.append("/".join(path))
                return
            node = node[k]
        leaf = path[-1]
        if leaf not in node or np.shape(node[leaf]) != value.shape:
            self.skipped.append("/".join(path))
            return
        node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
        self.merged += 1

    def conv(self, flax_path: Tuple[str, ...], torch_name: str):
        key = torch_name + ".weight"
        if key in self.sd:
            self._set(self.params, flax_path + ("kernel",),
                      _conv_kernel(_np(self.sd[key])))

    def bn(self, flax_path: Tuple[str, ...], torch_name: str):
        table = [("scale", ".weight", self.params),
                 ("bias", ".bias", self.params),
                 ("mean", ".running_mean", self.batch_stats),
                 ("var", ".running_var", self.batch_stats)]
        for leaf, suffix, tree in table:
            key = torch_name + suffix
            if key in self.sd:
                self._set(tree, flax_path + (leaf,), _np(self.sd[key]))

    def dense(self, flax_path: Tuple[str, ...], torch_name: str):
        wkey, bkey = torch_name + ".weight", torch_name + ".bias"
        if wkey in self.sd:
            self._set(self.params, flax_path + ("kernel",),
                      _np(self.sd[wkey]).T)
        if bkey in self.sd:
            self._set(self.params, flax_path + ("bias",),
                      _np(self.sd[bkey]))


def import_torch_resnet(state_dict: Mapping[str, Any],
                        params: Dict, batch_stats: Dict,
                        stage_sizes=(3, 4, 6, 3)) -> int:
    """Merge a torchvision-style ResNet state_dict into (params,
    batch_stats) of scat_tpu.models.resnet.ResNet IN PLACE.  Returns the
    number of tensors merged; unmatched entries are skipped
    (``strict=False`` semantics, reference resnet.py:195)."""
    m = _Merger(params, batch_stats, state_dict)
    m.conv(("conv1",), "conv1")
    m.bn(("bn1",), "bn1")
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            fb = f"layer{stage + 1}_{b}"
            tb = f"layer{stage + 1}.{b}"
            for ci in range(1, 4):
                if f"{tb}.conv{ci}.weight" not in state_dict:
                    continue
                m.conv((fb, f"Conv_{ci - 1}"), f"{tb}.conv{ci}")
                m.bn((fb, f"BatchNorm_{ci - 1}"), f"{tb}.bn{ci}")
            if f"{tb}.downsample.0.weight" in state_dict:
                m.conv((fb, "downsample_conv"), f"{tb}.downsample.0")
                m.bn((fb, "downsample_bn"), f"{tb}.downsample.1")
    # the reference's replacement head (resnet.py:116): fc1 512*exp->1024
    m.dense(("fc1",), "fc1")
    return m.merged


def load_torch_checkpoint(path: str) -> Mapping[str, Any]:
    """Load a .pth state dict on CPU (torch is CPU-only in this image)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj.get("state_dict", obj) if isinstance(obj, dict) else obj
