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

    def ln(self, flax_path: Tuple[str, ...], torch_name: str):
        for leaf, suffix in (("scale", ".weight"), ("bias", ".bias")):
            key = torch_name + suffix
            if key in self.sd:
                self._set(self.params, flax_path + (leaf,),
                          _np(self.sd[key]))

    def raw(self, flax_path: Tuple[str, ...], torch_name: str):
        if torch_name in self.sd:
            self._set(self.params, flax_path, _np(self.sd[torch_name]))


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


def _pyramid_layers(m: _Merger, depth: int, coarse: bool) -> None:
    """Merge the pyramid transformer stack.

    Torch key layouts (from the reference module nesting):
      * plain (vision_transformer.py:82-101):
        ``transformer.layers.{i}.0`` = Residual(PreNorm(Attention)) ->
        ``.0.fn.norm`` / ``.0.fn.fn.to_qkv`` / ``.0.fn.fn.to_out.0``;
        ``.1`` = PreNorm(FeedForward) (non-final: ``.1.norm``,
        ``.1.fn.net.{0,2}``) or a bare FeedForward on the final layer
        (``.1.net.{0,2}``).
      * attn variant (vision_transformer_attn.py:89-113):
        ``.0`` = bare Attention, ``.1`` = PreNormAttn (post-norm LN),
        ``.2`` = PreNorm(FeedForward) / bare final FeedForward.
    """
    for i in range(depth):
        final = i == depth - 1
        L = f"transformer.layers.{i}"
        if coarse:
            attn_base, norm_name, ff_idx = f"{L}.0", f"{L}.1.norm", 2
        else:
            attn_base, norm_name, ff_idx = (f"{L}.0.fn.fn",
                                            f"{L}.0.fn.norm", 1)
        m.dense(("transformer", f"attn_{i}", "to_qkv"),
                attn_base + ".to_qkv")
        m.dense(("transformer", f"attn_{i}", "to_out"),
                attn_base + ".to_out.0")
        m.ln(("transformer", f"attn_norm_{i}"), norm_name)
        ff = f"{L}.{ff_idx}"
        if final:
            net = ff
        else:
            net = ff + ".fn"
            m.ln(("transformer", f"ff_norm_{i}"), ff + ".norm")
        m.dense(("transformer", f"ff_{i}", "Dense_0"), net + ".net.0")
        m.dense(("transformer", f"ff_{i}", "Dense_1"), net + ".net.2")


def import_torch_encoder_transformer(
        state_dict: Mapping[str, Any], params: Dict, batch_stats: Dict,
        depth: int = 3, coarse: bool = False) -> int:
    """Merge a complete reference ``EncoderTransformer``
    (hand_net.py:315-398) or ``EncoderTransformerCoarse`` (:216-311)
    state_dict into our flax (params, batch_stats) IN PLACE: ResNet-50
    backbone + fc1, conv1x1 reduction, the full pyramid transformer
    (QKV/out projections, LayerNorms, FFNs), the learned mask token and
    the iterative regressor.  ``strict=False`` semantics throughout;
    returns the number of tensors merged.

    The sinusoidal PE and mean_params are not ported: the PE is a
    deterministic buffer recomputed on our side (hand_net.py:61-77
    parity is asserted by tests), and the reference never registers
    mean_params in its state_dict.
    """
    sub = {k[len("main_encoder."):]: v for k, v in state_dict.items()
           if k.startswith("main_encoder.")}
    merged = import_torch_resnet(sub, params["main_encoder"],
                                 batch_stats.get("main_encoder", {}))
    m = _Merger(params, batch_stats, state_dict)
    m.conv(("conv1x1_channel_reduction",), "conv1x1_channel_reduction")
    m.raw(("mask_token",), "mask_token")
    m.dense(("regressor",), "regressor")
    _pyramid_layers(m, depth, coarse)
    return merged + m.merged


def import_torch_hrnet(state_dict: Mapping[str, Any], params: Dict,
                       batch_stats: Dict) -> int:
    """Merge a reference-structured HRNet state_dict (hrnet.py:147-261,
    official-weights key layout: transition double-Sequentials, per-stage
    branches/fuse_layers ModuleLists) into scat_tpu.models.hrnet.HRNet's
    flax trees IN PLACE.  strict=False; returns tensors merged."""
    m = _Merger(params, batch_stats, state_dict)
    for cv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
        m.conv((cv,), cv)
        m.bn((bn,), bn)
    for b in range(4):
        fb, tb = f"layer1_{b}", f"layer1.{b}"
        for ci in range(1, 4):
            m.conv((fb, f"Conv_{ci - 1}"), f"{tb}.conv{ci}")
            m.bn((fb, f"BatchNorm_{ci - 1}"), f"{tb}.bn{ci}")
        if f"{tb}.downsample.0.weight" in state_dict:
            m.conv((fb, "downsample_conv"), f"{tb}.downsample.0")
            m.bn((fb, "downsample_bn"), f"{tb}.downsample.1")
    for fl, tr in (("t1_conv0", "transition1.0"),
                   ("t1_conv1", "transition1.1.0"),
                   ("t2_conv", "transition2.2.0"),
                   ("t3_conv", "transition3.3.0")):
        m.conv((fl,), tr + ".0")
        m.bn((fl.replace("conv", "bn"),), tr + ".1")
    for s, nmod in ((2, 1), (3, 4), (4, 3)):
        for mod in range(nmod):
            fmod, tmod = f"stage{s}_{mod}", f"stage{s}.{mod}"
            out_b = 1 if (s == 4 and mod == 2) else s
            for i in range(s):
                for b in range(4):
                    tb = f"{tmod}.branches.{i}.{b}"
                    for ci in (1, 2):
                        m.conv((fmod, f"branch{i}_block{b}",
                                f"Conv_{ci - 1}"), f"{tb}.conv{ci}")
                        m.bn((fmod, f"branch{i}_block{b}",
                              f"BatchNorm_{ci - 1}"), f"{tb}.bn{ci}")
            for i in range(out_b):
                for j in range(s):
                    if i == j:
                        continue
                    base = f"{tmod}.fuse_layers.{i}.{j}"
                    if i < j:
                        m.conv((fmod, f"fuse{i}_{j}_conv"), f"{base}.0")
                        m.bn((fmod, f"fuse{i}_{j}_bn"), f"{base}.1")
                    else:
                        for k in range(i - j - 1):
                            m.conv((fmod, f"fuse{i}_{j}_down{k}_conv"),
                                   f"{base}.{k}.0")
                            m.bn((fmod, f"fuse{i}_{j}_down{k}_bn"),
                                 f"{base}.{k}.1")
                        m.conv((fmod, f"fuse{i}_{j}_final_conv"),
                               f"{base}.{i - j - 1}.0")
                        m.bn((fmod, f"fuse{i}_{j}_final_bn"),
                             f"{base}.{i - j - 1}.1")
    m.conv(("final_layer",), "final_layer")
    m.raw(("final_layer", "bias"), "final_layer.bias")
    return m.merged


def import_torch_inception(state_dict: Mapping[str, Any], params: Dict,
                           batch_stats: Dict) -> int:
    """Merge a torchvision-style (truncated) Inception-v3 state_dict
    into scat_tpu.models.inception.Inception3's trees IN PLACE.  The
    flax module names mirror torchvision's, so the walk is generic:
    every ``<prefix>.conv`` / ``<prefix>.bn`` pair maps by path."""
    m = _Merger(params, batch_stats, state_dict)
    seen = set()
    for key in state_dict:
        if key.endswith(".conv.weight"):
            prefix = key[: -len(".conv.weight")]
            m.conv(tuple(prefix.split(".")) + ("conv",),
                   prefix + ".conv")
        elif ".bn." in key:
            prefix = key.split(".bn.")[0]
            if prefix in seen:
                continue
            seen.add(prefix)
            m.bn(tuple(prefix.split(".")) + ("bn",), prefix + ".bn")
    return m.merged


def import_torch_auto(state_dict: Mapping[str, Any], params: Dict,
                      batch_stats: Dict) -> int:
    """Dispatch a torch state_dict to the right importer by its key
    layout: full EncoderTransformer heads (plain or attn-variant
    transformer), bare HRNet, truncated Inception, or a torchvision
    ResNet.  Used to load reference ``hand_net*.pth`` files directly in
    the eval/resume paths."""
    ks = list(state_dict.keys())
    if any(k.startswith("transformer.layers") for k in ks):
        coarse = "transformer.layers.0.0.to_qkv.weight" in state_dict
        return import_torch_encoder_transformer(
            state_dict, params, batch_stats, coarse=coarse)
    if any(k.startswith("stage2.") for k in ks):
        return import_torch_hrnet(state_dict, params, batch_stats)
    if any(k.startswith("Mixed_5b") for k in ks):
        return import_torch_inception(state_dict, params, batch_stats)
    if any(k.startswith("layer1.") for k in ks):
        return import_torch_resnet(state_dict, params, batch_stats)
    raise ValueError(
        "unrecognized torch checkpoint layout: "
        + ", ".join(sorted(ks)[:5]))


def load_torch_checkpoint(path: str) -> Mapping[str, Any]:
    """Load a .pth state dict on CPU (torch is CPU-only in this image)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj.get("state_dict", obj) if isinstance(obj, dict) else obj
