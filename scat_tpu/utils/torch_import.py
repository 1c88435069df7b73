"""Torch <-> flax weight interchange.

Import: the reference downloads ImageNet ResNet weights from the torch
model zoo and merges them with ``strict=False`` (reference
resnet.py:186-196); these utilities convert local ``.pth``/state-dicts
into our flax trees with the same partial-load semantics — for the
ImageNet backbone, for complete reference ``hand_net*.pth`` checkpoints
(EncoderTransformer plain/coarse), and for HRNet / truncated-Inception
backbones.

Export: the inverse — our flax (params, batch_stats) rendered as a
reference-keyed torch state_dict, so weights trained HERE load into the
reference with ``load_state_dict`` unchanged.  Both directions share one
path-mapping walk per architecture (a visitor pattern), so the mapping
cannot drift between them.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


class _Merger:
    """Visitor that copies torch state_dict tensors INTO flax trees."""

    def __init__(self, params: Dict, batch_stats: Dict,
                 sd: Mapping[str, Any]):
        self.params = params
        self.batch_stats = batch_stats
        self.sd = sd
        self.merged = 0
        self.skipped = []

    def has(self, flax_path: Tuple[str, ...], torch_name: str) -> bool:
        return torch_name + ".weight" in self.sd

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


class _Exporter:
    """Visitor that renders flax trees AS a torch-keyed state_dict
    (numpy values; wrap in torch.tensor before torch.save if desired —
    torch.load accepts either for load_state_dict after as_tensor)."""

    def __init__(self, params: Dict, batch_stats: Optional[Dict]):
        self.params = params
        self.batch_stats = batch_stats or {}
        self.out: Dict[str, np.ndarray] = {}

    def _leaf(self, tree, path):
        node = tree
        for k in path:
            if not isinstance(node, dict) or k not in node:
                return None
            node = node[k]
        return None if isinstance(node, dict) else np.asarray(node)

    def has(self, flax_path: Tuple[str, ...], torch_name: str) -> bool:
        node = self.params
        for k in flax_path:
            if not isinstance(node, dict) or k not in node:
                return False
            node = node[k]
        return True

    def conv(self, flax_path, torch_name):
        k = self._leaf(self.params, flax_path + ("kernel",))
        if k is not None:
            self.out[torch_name + ".weight"] = np.ascontiguousarray(
                np.transpose(k, (3, 2, 0, 1)))

    def bn(self, flax_path, torch_name):
        table = [("scale", ".weight", self.params),
                 ("bias", ".bias", self.params),
                 ("mean", ".running_mean", self.batch_stats),
                 ("var", ".running_var", self.batch_stats)]
        wrote = False
        for leaf, suffix, tree in table:
            v = self._leaf(tree, flax_path + (leaf,))
            if v is not None:
                self.out[torch_name + suffix] = v
                wrote = True
        if wrote:
            self.out[torch_name + ".num_batches_tracked"] = np.asarray(
                0, np.int64)

    def dense(self, flax_path, torch_name):
        w = self._leaf(self.params, flax_path + ("kernel",))
        if w is not None:
            self.out[torch_name + ".weight"] = np.ascontiguousarray(w.T)
        b = self._leaf(self.params, flax_path + ("bias",))
        if b is not None:
            self.out[torch_name + ".bias"] = b

    def ln(self, flax_path, torch_name):
        for leaf, suffix in (("scale", ".weight"), ("bias", ".bias")):
            v = self._leaf(self.params, flax_path + (leaf,))
            if v is not None:
                self.out[torch_name + suffix] = v

    def raw(self, flax_path, torch_name):
        v = self._leaf(self.params, flax_path)
        if v is not None:
            self.out[torch_name] = v


class _Scoped:
    """Visitor wrapper that prefixes both name spaces (e.g. the backbone
    living under ``main_encoder`` in a composed head)."""

    def __init__(self, v, flax_prefix: Tuple[str, ...],
                 torch_prefix: str):
        self._v = v
        self._fp = flax_prefix
        self._tp = torch_prefix

    def __getattr__(self, name):
        inner = getattr(self._v, name)

        def call(flax_path, torch_name):
            return inner(self._fp + tuple(flax_path),
                         self._tp + torch_name)
        return call


# ----------------------------------------------------------------------
# Architecture walks — ONE mapping per architecture, shared by both
# directions.
# ----------------------------------------------------------------------

def _walk_resnet(v, stage_sizes=(3, 4, 6, 3)) -> None:
    """5-output ResNet family (reference resnet.py:101-162 +
    torchvision key layout); fc1 is the reference's replacement head."""
    v.conv(("conv1",), "conv1")
    v.bn(("bn1",), "bn1")
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            fb = f"layer{stage + 1}_{b}"
            tb = f"layer{stage + 1}.{b}"
            for ci in range(1, 4):
                if not v.has((fb, f"Conv_{ci - 1}"), f"{tb}.conv{ci}"):
                    continue
                v.conv((fb, f"Conv_{ci - 1}"), f"{tb}.conv{ci}")
                v.bn((fb, f"BatchNorm_{ci - 1}"), f"{tb}.bn{ci}")
            if v.has((fb, "downsample_conv"), f"{tb}.downsample.0"):
                v.conv((fb, "downsample_conv"), f"{tb}.downsample.0")
                v.bn((fb, "downsample_bn"), f"{tb}.downsample.1")
    v.dense(("fc1",), "fc1")


def _walk_pyramid(v, depth: int, coarse: bool) -> None:
    """Pyramid transformer stack.

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
        v.dense(("transformer", f"attn_{i}", "to_qkv"),
                attn_base + ".to_qkv")
        v.dense(("transformer", f"attn_{i}", "to_out"),
                attn_base + ".to_out.0")
        v.ln(("transformer", f"attn_norm_{i}"), norm_name)
        ff = f"{L}.{ff_idx}"
        if final:
            net = ff
        else:
            net = ff + ".fn"
            v.ln(("transformer", f"ff_norm_{i}"), ff + ".norm")
        v.dense(("transformer", f"ff_{i}", "Dense_0"), net + ".net.0")
        v.dense(("transformer", f"ff_{i}", "Dense_1"), net + ".net.2")


def _walk_encoder(v, depth: int, coarse: bool) -> None:
    """Complete EncoderTransformer / EncoderTransformerCoarse
    (reference hand_net.py:315-398 / :216-311).  The sinusoidal PE and
    mean_params are deterministic/unregistered and never walked."""
    _walk_resnet(_Scoped(v, ("main_encoder",), "main_encoder."))
    v.conv(("conv1x1_channel_reduction",), "conv1x1_channel_reduction")
    v.raw(("mask_token",), "mask_token")
    v.dense(("regressor",), "regressor")
    _walk_pyramid(v, depth, coarse)


def _walk_hrnet(v) -> None:
    """HRNet (reference hrnet.py:147-261, official-weights key layout:
    transition double-Sequentials, per-stage branches/fuse_layers)."""
    for cv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
        v.conv((cv,), cv)
        v.bn((bn,), bn)
    for b in range(4):
        fb, tb = f"layer1_{b}", f"layer1.{b}"
        for ci in range(1, 4):
            v.conv((fb, f"Conv_{ci - 1}"), f"{tb}.conv{ci}")
            v.bn((fb, f"BatchNorm_{ci - 1}"), f"{tb}.bn{ci}")
        if v.has((fb, "downsample_conv"), f"{tb}.downsample.0"):
            v.conv((fb, "downsample_conv"), f"{tb}.downsample.0")
            v.bn((fb, "downsample_bn"), f"{tb}.downsample.1")
    for fl, tr in (("t1_conv0", "transition1.0"),
                   ("t1_conv1", "transition1.1.0"),
                   ("t2_conv", "transition2.2.0"),
                   ("t3_conv", "transition3.3.0")):
        v.conv((fl,), tr + ".0")
        v.bn((fl.replace("conv", "bn"),), tr + ".1")
    for s, nmod in ((2, 1), (3, 4), (4, 3)):
        for mod in range(nmod):
            fmod, tmod = f"stage{s}_{mod}", f"stage{s}.{mod}"
            out_b = 1 if (s == 4 and mod == 2) else s
            for i in range(s):
                for b in range(4):
                    tb = f"{tmod}.branches.{i}.{b}"
                    for ci in (1, 2):
                        v.conv((fmod, f"branch{i}_block{b}",
                                f"Conv_{ci - 1}"), f"{tb}.conv{ci}")
                        v.bn((fmod, f"branch{i}_block{b}",
                              f"BatchNorm_{ci - 1}"), f"{tb}.bn{ci}")
            for i in range(out_b):
                for j in range(s):
                    if i == j:
                        continue
                    base = f"{tmod}.fuse_layers.{i}.{j}"
                    if i < j:
                        v.conv((fmod, f"fuse{i}_{j}_conv"), f"{base}.0")
                        v.bn((fmod, f"fuse{i}_{j}_bn"), f"{base}.1")
                    else:
                        for k in range(i - j - 1):
                            v.conv((fmod, f"fuse{i}_{j}_down{k}_conv"),
                                   f"{base}.{k}.0")
                            v.bn((fmod, f"fuse{i}_{j}_down{k}_bn"),
                                 f"{base}.{k}.1")
                        v.conv((fmod, f"fuse{i}_{j}_final_conv"),
                               f"{base}.{i - j - 1}.0")
                        v.bn((fmod, f"fuse{i}_{j}_final_bn"),
                             f"{base}.{i - j - 1}.1")
    v.conv(("final_layer",), "final_layer")
    v.raw(("final_layer", "bias"), "final_layer.bias")


def _walk_h3dw(v) -> None:
    """H3DWEncoder (reference hand_net.py:28-58): resnet50 backbone +
    feat_encoder Sequential(relu, fc2, relu) + regressor Sequential."""
    _walk_resnet(_Scoped(v, ("ResNet_0",), "main_encoder."))
    v.dense(("fc2",), "feat_encoder.1")
    v.dense(("regressor",), "regressor.0")


def _walk_token_head(v, depth: int) -> None:
    """The 128-token head shared by the HRNet/Inception variants
    (reference hand_net.py:87-146 / :150-213): conv reduction, learned
    mask token, Sequential regressor (``regressor.0``), plain pyramid
    transformer.  Our flax side nests the token head under ``head``."""
    v.conv(("conv1x1_channel_reduction",), "conv1x1_channel_reduction")
    h = _Scoped(v, ("head",), "")
    h.raw(("mask_token",), "mask_token")
    h.dense(("regressor",), "regressor.0")
    _walk_pyramid(h, depth, coarse=False)


def _walk_vit(v, depth: int) -> None:
    """ViT (reference vision_transformer.py:103-153): patch embed, cls
    token, learned pos-embed, pyramid transformer, Sequential head."""
    v.dense(("patch_to_embedding",), "patch_to_embedding")
    v.raw(("cls_token",), "cls_token")
    v.raw(("pos_embedding",), "pos_embedding")
    v.dense(("head",), "head.0")
    _walk_pyramid(v, depth, coarse=False)


def _walk_vip(v, depth: int) -> None:
    """ViP / Performer (reference vision_performer.py:70-116) minus the
    frozen Gaussian ``w`` (lives in flax's ``constants`` collection —
    handled by the import/export functions)."""
    v.raw(("pos_emb",), "pos_emb")
    v.raw(("cls_token",), "cls_token")
    v.dense(("patch_emb",), "patch_emb")
    v.dense(("head",), "head")
    for i in range(depth):
        fb, tb = f"block_{i}", f"mains.{i}"
        v.dense((fb, "kqv"), f"{tb}.kqv")
        v.dense((fb, "proj"), f"{tb}.proj")
        v.ln((fb, "ln1"), f"{tb}.ln1")
        v.ln((fb, "ln2"), f"{tb}.ln2")
        v.dense((fb, "mlp1"), f"{tb}.mlp.0")
        v.dense((fb, "mlp2"), f"{tb}.mlp.2")


def _walk_conv_bn_tree(v, tree: Dict, path: Tuple[str, ...] = ()) -> None:
    """Generic walk for torchvision-mirroring trees (the truncated
    Inception): every ``<prefix>/conv`` + ``<prefix>/bn`` pair maps by
    its dotted path."""
    if not isinstance(tree, dict):
        return
    for k, sub in tree.items():
        p = path + (k,)
        if k == "conv" and isinstance(sub, dict) and "kernel" in sub:
            v.conv(p, ".".join(p))
        elif k == "bn" and isinstance(sub, dict) and "scale" in sub:
            v.bn(p, ".".join(p))
        else:
            _walk_conv_bn_tree(v, sub, p)


# ----------------------------------------------------------------------
# Import surface (strict=False semantics; returns tensors merged)
# ----------------------------------------------------------------------

def import_torch_resnet(state_dict: Mapping[str, Any],
                        params: Dict, batch_stats: Dict,
                        stage_sizes=(3, 4, 6, 3)) -> int:
    """Merge a torchvision-style ResNet state_dict into (params,
    batch_stats) of scat_tpu.models.resnet.ResNet IN PLACE."""
    m = _Merger(params, batch_stats, state_dict)
    _walk_resnet(m, stage_sizes)
    return m.merged


def import_torch_encoder_transformer(
        state_dict: Mapping[str, Any], params: Dict, batch_stats: Dict,
        depth: int = 3, coarse: bool = False) -> int:
    """Merge a complete reference ``EncoderTransformer``
    (hand_net.py:315-398) or ``EncoderTransformerCoarse`` (:216-311)
    state_dict into our flax (params, batch_stats) IN PLACE."""
    m = _Merger(params, batch_stats, state_dict)
    _walk_encoder(m, depth, coarse)
    return m.merged


def import_torch_hrnet(state_dict: Mapping[str, Any], params: Dict,
                       batch_stats: Dict) -> int:
    """Merge a reference-structured HRNet state_dict into
    scat_tpu.models.hrnet.HRNet's flax trees IN PLACE."""
    m = _Merger(params, batch_stats, state_dict)
    _walk_hrnet(m)
    return m.merged


def import_torch_inception(state_dict: Mapping[str, Any], params: Dict,
                           batch_stats: Dict) -> int:
    """Merge a torchvision-style (truncated) Inception-v3 state_dict
    into scat_tpu.models.inception.Inception3's trees IN PLACE."""
    m = _Merger(params, batch_stats, state_dict)
    _walk_conv_bn_tree(m, params)
    return m.merged


def import_torch_hrnet_encoder(
        state_dict: Mapping[str, Any], params: Dict, batch_stats: Dict,
        depth: int = 3) -> int:
    """Merge a complete reference ``EncoderTransformerHRNet``
    (hand_net.py:150-213) state_dict IN PLACE."""
    m = _Merger(params, batch_stats, state_dict)
    _walk_hrnet(_Scoped(m, ("main_encoder",), "main_encoder."))
    _walk_token_head(m, depth)
    return m.merged


def import_torch_inception_encoder(
        state_dict: Mapping[str, Any], params: Dict, batch_stats: Dict,
        depth: int = 3) -> int:
    """Merge a complete reference ``EncoderTransformerInception``
    (hand_net.py:87-146) state_dict IN PLACE."""
    m = _Merger(params, batch_stats, state_dict)
    _walk_conv_bn_tree(_Scoped(m, ("main_encoder",), "main_encoder."),
                       params.get("main_encoder", {}))
    _walk_token_head(m, depth)
    return m.merged


def import_torch_vit(state_dict: Mapping[str, Any], params: Dict,
                     batch_stats: Dict, depth: int = 3) -> int:
    """Merge a reference ``ViT`` (vision_transformer.py:103-153)
    state_dict IN PLACE."""
    m = _Merger(params, batch_stats, state_dict)
    _walk_vit(m, depth)
    return m.merged


def import_torch_vip(state_dict: Mapping[str, Any], params: Dict,
                     constants: Dict, depth: int = 3) -> int:
    """Merge a reference ``ViP`` (vision_performer.py:70-116) state_dict
    IN PLACE.  The frozen Gaussian features ``mains.{i}.w`` land in the
    flax ``constants`` collection."""
    m = _Merger(params, {}, state_dict)
    _walk_vip(m, depth)
    c = _Merger(constants, {}, state_dict)
    for i in range(depth):
        c.raw((f"block_{i}", "w"), f"mains.{i}.w")
    return m.merged + c.merged


def export_torch_vit(params: Dict, depth: int = 3
                     ) -> Dict[str, np.ndarray]:
    e = _Exporter(params, None)
    _walk_vit(e, depth)
    return e.out


def export_torch_vip(params: Dict, constants: Dict, depth: int = 3
                     ) -> Dict[str, np.ndarray]:
    e = _Exporter(params, None)
    _walk_vip(e, depth)
    c = _Exporter(constants, None)
    for i in range(depth):
        c.raw((f"block_{i}", "w"), f"mains.{i}.w")
    e.out.update(c.out)
    return e.out


def import_torch_auto(state_dict: Mapping[str, Any], params: Dict,
                      batch_stats: Dict) -> int:
    """Dispatch a torch state_dict to the right importer by its key
    layout: full EncoderTransformer heads (plain or attn-variant
    transformer), bare HRNet, truncated Inception, or a torchvision
    ResNet.  Used to load reference ``hand_net*.pth`` files directly in
    the eval/resume paths."""
    ks = list(state_dict.keys())
    if "patch_emb.weight" in state_dict:
        raise ValueError(
            "ViP checkpoints carry the frozen FAVOR+ features in "
            "mains.{i}.w; load with import_torch_vip(sd, params, "
            "constants) so they land in the 'constants' collection")
    if "patch_to_embedding.weight" in state_dict:
        # guarded like the encoder branch below — a ViT save stripped
        # of its transformer must produce the layout diagnostic, not a
        # bare max()-of-empty ValueError
        depth = 1 + max((int(k.split(".")[2]) for k in ks
                         if k.startswith("transformer.layers.")),
                        default=-1)
        if depth > 0:
            return import_torch_vit(state_dict, params, batch_stats,
                                    depth=depth)
    if any(k.startswith("transformer.layers") for k in ks):
        coarse = "transformer.layers.0.0.to_qkv.weight" in state_dict
        # infer the pyramid depth from the checkpoint itself — a
        # hard-coded 3 would silently skip layers of a --vit_depth!=3
        # model (layer keys are transformer.layers.{i}....)
        depth = 1 + max(int(k.split(".")[2]) for k in ks
                        if k.startswith("transformer.layers."))
        # backbone variants carry their backbone's key layout under
        # main_encoder: HRNet (stage2...) / Inception (Mixed_5b...)
        if any(k.startswith("main_encoder.stage2.") for k in ks):
            return import_torch_hrnet_encoder(
                state_dict, params, batch_stats, depth=depth)
        if any(k.startswith("main_encoder.Mixed_5b") for k in ks):
            return import_torch_inception_encoder(
                state_dict, params, batch_stats, depth=depth)
        return import_torch_encoder_transformer(
            state_dict, params, batch_stats, depth=depth, coarse=coarse)
    if any(k.startswith("feat_encoder.") for k in ks):
        m = _Merger(params, batch_stats, state_dict)
        # H3DWJointsEncoder wraps the encoder under "h3dw"
        v = _Scoped(m, ("h3dw",), "") if "h3dw" in params else m
        _walk_h3dw(v)
        return m.merged
    if any(k.startswith("stage2.") for k in ks):
        return import_torch_hrnet(state_dict, params, batch_stats)
    if any(k.startswith("Mixed_5b") for k in ks):
        return import_torch_inception(state_dict, params, batch_stats)
    if any(k.startswith("layer1.") for k in ks):
        return import_torch_resnet(state_dict, params, batch_stats)
    raise ValueError(
        "unrecognized torch checkpoint layout: "
        + ", ".join(sorted(ks)[:5]))


# ----------------------------------------------------------------------
# Export surface (reference-keyed state_dicts from flax trees)
# ----------------------------------------------------------------------

def export_torch_resnet(params: Dict, batch_stats: Optional[Dict] = None,
                        stage_sizes=(3, 4, 6, 3)) -> Dict[str, np.ndarray]:
    e = _Exporter(params, batch_stats)
    _walk_resnet(e, stage_sizes)
    return e.out


def export_torch_encoder_transformer(
        params: Dict, batch_stats: Optional[Dict] = None,
        depth: Optional[int] = None, coarse: bool = False
        ) -> Dict[str, np.ndarray]:
    """Render our EncoderTransformer[Coarse] as a reference-keyed
    state_dict — weights trained here run in the torch reference via
    ``net.load_state_dict({k: torch.as_tensor(v) ...}, strict=False)``
    (strict=False only because the reference registers the PE buffer).
    ``depth=None`` infers the pyramid depth from the param tree."""
    if depth is None:
        tr = params.get("transformer", {})
        depth = 1 + max((int(k.split("_")[-1]) for k in tr
                         if k.startswith("attn_") and "norm" not in k),
                        default=2)
    e = _Exporter(params, batch_stats)
    _walk_encoder(e, depth, coarse)
    return e.out


def export_torch_h3dw(params: Dict, batch_stats: Optional[Dict] = None
                      ) -> Dict[str, np.ndarray]:
    e = _Exporter(params, batch_stats)
    v = _Scoped(e, ("h3dw",), "") if "h3dw" in params else e
    _walk_h3dw(v)
    return e.out


def export_torch_hrnet(params: Dict, batch_stats: Optional[Dict] = None
                       ) -> Dict[str, np.ndarray]:
    e = _Exporter(params, batch_stats)
    _walk_hrnet(e)
    return e.out


def export_torch_inception(params: Dict,
                           batch_stats: Optional[Dict] = None
                           ) -> Dict[str, np.ndarray]:
    e = _Exporter(params, batch_stats)
    _walk_conv_bn_tree(e, params)
    return e.out


def export_torch_hrnet_encoder(params: Dict,
                               batch_stats: Optional[Dict] = None,
                               depth: int = 3) -> Dict[str, np.ndarray]:
    """Render our EncoderTransformerHRNet as a reference-keyed
    state_dict (hand_net.py:150-213 key layout)."""
    e = _Exporter(params, batch_stats)
    _walk_hrnet(_Scoped(e, ("main_encoder",), "main_encoder."))
    _walk_token_head(e, depth)
    return e.out


def export_torch_inception_encoder(
        params: Dict, batch_stats: Optional[Dict] = None,
        depth: int = 3) -> Dict[str, np.ndarray]:
    """Render our EncoderTransformerInception as a reference-keyed
    state_dict (hand_net.py:87-146 key layout)."""
    e = _Exporter(params, batch_stats)
    _walk_conv_bn_tree(_Scoped(e, ("main_encoder",), "main_encoder."),
                       params.get("main_encoder", {}))
    _walk_token_head(e, depth)
    return e.out


def import_torch_motion_discriminator(
        state_dict: Mapping[str, Any], params: Dict,
        num_layers: int = 2) -> int:
    """Merge a reference MotionDiscriminator state_dict
    (motion_discriminator.py:83-139: cuDNN-layout stacked ``nn.GRU`` +
    fc [+ attention MLP]) into our flax tree (lax.scan GRUCell stack).

    torch GRU packs gates [r|z|n] along dim 0 of weight_ih/weight_hh and
    keeps TWO bias vectors; flax GRUCell keeps per-gate Dense kernels
    and a single input-side bias for r/z (plus hn's hidden-side bias),
    so b_ih and b_hh fold:  ir.b = b_ih_r + b_hh_r (same for z),
    in.b = b_ih_n, hn.b = b_hh_n — exact, since r/z apply
    sigmoid(Wx + b_ih + Uh + b_hh) and n keeps the two biases on
    opposite sides of the reset gate."""
    merged = 0
    for layer in range(num_layers):
        cell = params.get(f"GRUCell_{layer}")
        if cell is None:
            continue
        w_ih = _np(state_dict[f"gru.weight_ih_l{layer}"])
        w_hh = _np(state_dict[f"gru.weight_hh_l{layer}"])
        b_ih = _np(state_dict[f"gru.bias_ih_l{layer}"])
        b_hh = _np(state_dict[f"gru.bias_hh_l{layer}"])
        h = w_hh.shape[1]
        for i, gate in enumerate(("r", "z", "n")):
            sl = slice(i * h, (i + 1) * h)
            iname = {"r": "ir", "z": "iz", "n": "in"}[gate]
            hname = {"r": "hr", "z": "hz", "n": "hn"}[gate]
            cell[iname]["kernel"] = w_ih[sl].T.astype(
                np.asarray(cell[iname]["kernel"]).dtype)
            cell[hname]["kernel"] = w_hh[sl].T.astype(
                np.asarray(cell[hname]["kernel"]).dtype)
            if gate == "n":
                cell[iname]["bias"] = b_ih[sl].astype(np.float32)
                cell[hname]["bias"] = b_hh[sl].astype(np.float32)
            else:
                cell[iname]["bias"] = (b_ih[sl] + b_hh[sl]).astype(
                    np.float32)
            merged += 2
    if "fc.weight" in state_dict and "fc" in params:
        params["fc"]["kernel"] = _np(state_dict["fc.weight"]).T.astype(
            np.float32)
        params["fc"]["bias"] = _np(state_dict["fc.bias"]).astype(
            np.float32)
        merged += 2
    # attention pooling MLP (motion_discriminator.py:28-57): reference
    # nests Linear layers inside attention.attention at even indices
    # (odd ones are activations/dropout)
    attn = params.get("attention")
    if attn is not None:
        lin_keys = sorted(
            {int(k.split(".")[2]) for k in state_dict
             if k.startswith("attention.attention.")
             and k.endswith(".weight")})
        for j, idx in enumerate(lin_keys):
            name = ("attn_out" if idx == lin_keys[-1] else f"attn_{j}")
            if name in attn:
                attn[name]["kernel"] = _np(
                    state_dict[f"attention.attention.{idx}.weight"]
                ).T.astype(np.float32)
                attn[name]["bias"] = _np(
                    state_dict[f"attention.attention.{idx}.bias"]
                ).astype(np.float32)
                merged += 2
    return merged


def load_torch_checkpoint(path: str) -> Mapping[str, Any]:
    """Load a .pth state dict on CPU (torch is CPU-only in this image)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj.get("state_dict", obj) if isinstance(obj, dict) else obj
