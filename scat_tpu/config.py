"""Flag-compatible configuration surface.

Re-creates the reference's single argparse surface (``BaseOptions``,
reference ``config.py:4-78``) with the same flag names, defaults and
semantics, so reference run scripts (``script/ablation_pose.sh:5``,
``eval.sh:5``) work verbatim against this framework.

Deviations (documented, behind compat notes):
  * The reference declares boolean flags with ``type=bool`` so
    ``--pos_embed False`` parses as ``True`` (any non-empty string is
    truthy, reference ``config.py:50``).  We parse booleans properly via
    :func:`str2bool`.  Pass ``--compat_argparse_bool`` to restore the
    reference's (buggy) behavior for ablation reproduction.
  * TPU-specific flags are added under a ``tpu:`` group (mesh shape,
    dtype policy, host data workers).  They have no reference equivalent.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Sequence, Tuple


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def _compat_bool(v) -> bool:
    """Reference ``type=bool`` semantics: truthiness of the raw string."""
    return bool(v)


@dataclasses.dataclass
class Options:
    """Typed view of the option namespace (mirrors reference ``opt``).

    Every field corresponds to a reference flag (``config.py:9-67``) unless
    listed under the TPU section at the bottom.
    """

    # checkpointing (config.py:9-12)
    resume: bool = False
    checkpoint_hand: str = "hand_net.pth"
    checkpoint_folder: str = "experiments/0131_224_smplx"

    # MANO mean shape: palm vs back-of-hand template vertices (config.py:15)
    outside: bool = True

    # ViT options (config.py:18-23)
    net: str = "ViT"
    vit_dim: int = 256
    vit_depth: int = 3
    vit_heads: int = 8
    vit_mlp_dim: int = 512
    vit_dropout: float = 0.0

    # regressor feature level (config.py:26).  DEAD in the reference:
    # the only consumer is commented out (hand_net.py:326 ``# if
    # opt.feature == 'coarse'``); accepted for flag-compat only.
    feature: str = "x2"

    # visualization (config.py:29, 46)
    debug_img: str = "single"
    debug: bool = True

    # train options (config.py:32-45)
    batch_size: int = 32
    lr: float = 1e-4
    epoch: int = 50
    iteration: int = 1
    stage: int = 1
    # DEAD in the reference: --order is parsed (config.py:37) but never
    # read by any module; accepted for flag-compat only.
    order: str = "SMPLX"
    # decode choice for the MANO-parameter test path; read by
    # evaluation.tester (reference eval.py:368; 'smplx' is broken as
    # shipped there — see Tester.__init__)
    hand_choice: str = "mano"
    smplx_model_path: str = "extra_data/SMPLX_NEUTRAL.pkl"
    mean_mano_param: str = "extra_data/mean_mano_params.pkl"
    smplx_hand_info_file: str = "extra_data/SMPLX_HAND_INFO.pkl"
    right_hand_model: str = "extra_data/MANO_RIGHT.pkl"
    use_heatmap: bool = False
    freeze: bool = False

    # ablations (config.py:49-53)
    mask_rate: float = 0.0
    pos_embed: bool = True
    pl_reg: bool = False

    # loss weights (config.py:56-57)
    l_weight_3d: float = 0.0
    l_weight_2d: float = 0.0

    # data augmentation (config.py:60-61)
    motion_blur: bool = False
    rotation: bool = False

    # eval options (config.py:64-67)
    eval_dataset: str = "STB"
    result_dir: str = "./output/eval_0219/"
    checkpoint_path_eval: str = "experiments/0207_iccv_1/hand_net_final.pth"

    # ------------------------------------------------------------------
    # TPU-native extensions (no reference equivalent)
    # ------------------------------------------------------------------
    mesh_shape: str = "data:-1"       # e.g. "data:8" or "data:4,model:2"
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"   # backbone/transformer compute dtype
    use_pallas_attention: bool = True
    # ViP's FAVOR+ has a fused Pallas kernel (ops/pallas_favor.py) but
    # XLA's own fusion of the linear-attention einsums measures FASTER
    # at both serve (BH=16: 1.7 vs 1.8 ms) and train (BH=384: 12.3 vs
    # 13.0 ms) scale on v5e (benchmarks/RESULTS.md), so it is opt-in,
    # separate from the flash-attention kernel (which wins and is on).
    use_pallas_favor: bool = False
    # FAVOR+ einsum precision ladder (models/performer.py
    # favor_precisions): "highest" | "high" | "default" | "mixed" |
    # "mixed_high".  Measured on-chip in
    # benchmarks/probe_vip_precision.py (RESULTS.md "ViP precision
    # ladder"); the default is the measured winner.
    favor_precision: str = "highest"
    # Rematerialize ViP's performer blocks in the backward: measured
    # 16% SLOWER but 35% less temp HBM (14.6 -> 9.5 GB at bs 96) —
    # an OOM-relief lever for large ViP batches, numerically identical
    # (benchmarks/probe_vip_remat.py; RESULTS.md).  Ignored by the
    # conv heads, where remat measured slower with no memory pressure.
    remat_blocks: bool = False
    norm_layer: str = "batch"  # "batch" (parity) | "group" (fast train)
    seed: int = 0
    steps_per_epoch: int = 0          # 0 = derive from dataset length
    log_every: int = 10               # loss print cadence (train.py:230)
    checkpoint_every_epochs: int = 10  # torch.save cadence (train.py:237)
    data_dir: str = "./STB/"
    synthetic_data: bool = False       # use the in-memory synthetic dataset
    synthetic_layout: str = "stb"      # synthetic label width: stb=105 frei=166
    # Path to a local torchvision ResNet-50 ImageNet .pth.  The reference
    # ALWAYS starts from model-zoo ImageNet weights (resnet.py:186-196,
    # strict=False); TPU pods are zero-egress, so download
    # https://download.pytorch.org/models/resnet50-0676ba61.pth on a
    # connected host, copy it in, and pass it here.  Empty = fresh init.
    pretrained_resnet_pth: str = ""
    compat_argparse_bool: bool = False
    compat_pl_ema_reset: bool = True  # reproduce train.py:180-182 EMA reset
    compat_pck_flat: bool = True      # reproduce eval.py:311-312 dist.flat
    donate_state: bool = True
    # gradient accumulation: microbatches per optimizer update
    # (batch_size must divide evenly).  The memory lever for effective
    # batch sizes whose activations don't fit HBM; the accumulated
    # KEYPOINT gradient equals the full-batch valid-weighted loss
    # gradient exactly; the --pl_reg statistic becomes per-microbatch
    # (between-microbatch PL variance is not representable under
    # accumulation — see training/steps.py).  1 = off (reference
    # semantics).
    grad_accum: int = 1
    # "replicated" (plain DP) | "fsdp" (ZeRO-3 style: params + Adam
    # moments shard over the data axis; composes with a model axis)
    param_sharding: str = "replicated"
    # destination for `python -m scat_tpu.export` AOT serving artifacts
    export_dir: str = "./export/scat"
    # non-empty: capture a jax.profiler trace (viewable in
    # TensorBoard/XProf) of `profile_trace_steps` training steps,
    # starting after compilation settles
    profile_trace_dir: str = ""
    profile_trace_steps: int = 20
    # also mirror the CSV metrics into TensorBoard event files (the
    # writer the reference left as a comment, train.py:233)
    tensorboard: bool = False

    # Derived / runtime-only
    def mesh_axes(self) -> Tuple[Tuple[str, int], ...]:
        axes = []
        for part in self.mesh_shape.split(","):
            name, _, n = part.partition(":")
            axes.append((name.strip(), int(n) if n else -1))
        return tuple(axes)


_BOOL_FIELDS = (
    "resume", "outside", "use_heatmap", "freeze", "debug", "pos_embed",
    "pl_reg", "motion_blur", "rotation",
    # tpu extensions
    "use_pallas_attention", "use_pallas_favor", "remat_blocks",
    "synthetic_data",
    "tensorboard", "compat_argparse_bool",
    "compat_pl_ema_reset", "compat_pck_flat", "donate_state",
)


class BaseOptions:
    """Argparse front-end with reference flag parity (``config.py:4-78``)."""

    def __init__(self, compat_argparse_bool: bool = False):
        parser = argparse.ArgumentParser(
            description="scat_tpu: TPU-native SCAT hand-pose framework")
        bool_type = _compat_bool if compat_argparse_bool else str2bool
        defaults = Options()
        for f in dataclasses.fields(Options):
            name = f.name
            default = getattr(defaults, name)
            if name in _BOOL_FIELDS:
                parser.add_argument(f"--{name}", type=bool_type,
                                    default=default)
            elif f.type in ("int", int):
                parser.add_argument(f"--{name}", type=int, default=default)
            elif f.type in ("float", float):
                parser.add_argument(f"--{name}", type=float, default=default)
            else:
                parser.add_argument(f"--{name}", type=str, default=default)
        self.parser = parser

    def parse(self, argv: Optional[Sequence[str]] = None) -> Options:
        # two-pass: --compat_argparse_bool on the command line switches
        # the boolean parser to the reference's truthy-string semantics
        # BEFORE the real parse (otherwise the flag would be dead).
        import sys
        raw = list(sys.argv[1:] if argv is None else argv)
        if any(a.split("=")[0] == "--compat_argparse_bool"
               for a in raw):
            probe = argparse.ArgumentParser(add_help=False)
            probe.add_argument("--compat_argparse_bool", type=str2bool,
                               default=False)
            peek, _ = probe.parse_known_args(raw)
            if peek.compat_argparse_bool:
                self.__init__(compat_argparse_bool=True)
        ns = self.parser.parse_args(argv)
        return Options(**vars(ns))

    # reference config.py:76-78
    def parse_jupyter(self) -> Options:
        return self.parse([])
