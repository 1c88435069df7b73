"""Model factory keyed by the ``--net`` flag.

Mirrors the drivers' net switches (reference train.py:53-57,
train_coarse.py:47-58, eval.py:379-391): reg_transformer /
reg_transformer_coarse / backbone_hrnet / backbone_incepv3 / frankmocap /
ViT / ViP.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from scat_tpu import assets
from scat_tpu.config import Options
from scat_tpu.models.hand_net import (
    EncoderTransformer, EncoderTransformerCoarse, EncoderTransformerHRNet,
    EncoderTransformerInception, H3DWEncoder, H3DWJointsEncoder)
from scat_tpu.models.performer import ViP
from scat_tpu.models.vit import ViT


def _dtype(opt: Options):
    return jnp.dtype(opt.compute_dtype)


def build_model(opt: Options, image_size: int = 224,
                for_keypoints: bool = False):
    """Returns ``(flax module, mean_params ndarray)`` for ``opt.net``.

    ``for_keypoints=True`` wraps MANO-parameter heads (frankmocap) with
    the in-graph decode so they satisfy the 66-dim camera+joints
    contract the keypoint eval/train steps consume (the reference
    decodes outside the model, test.py:332-348)."""
    token_dim = (image_size // 8) ** 2
    if opt.net in ("reg_transformer", "reg_transformer_coarse"):
        mean = assets.load_mean_params(outside=opt.outside)
    elif opt.net in ("backbone_hrnet", "backbone_incepv3", "frankmocap"):
        mean = assets.load_mean_mano_pose(opt.mean_mano_param)
    else:
        mean = assets.load_mean_params(outside=opt.outside)
    mean_j = jnp.asarray(mean)

    # PL regularization differentiates twice through the attention
    # stack (loss -> grad of the vjp probe, hand_net PL path); the
    # Pallas flash kernel's custom VJP supports one reverse pass only,
    # so training with --pl_reg must take the XLA einsum attention —
    # measured parity with the kernel at these token counts
    # (benchmarks/RESULTS.md "Pallas vs XLA attention").
    use_pallas_attn = opt.use_pallas_attention and not opt.pl_reg
    if opt.use_pallas_attention and opt.pl_reg \
            and opt.net == "reg_transformer":
        # only the flagship routes the flag at all (below); printing
        # the rerouting message for nets that never ran the kernel
        # would misreport kernel selection
        print("--pl_reg needs double-backward: using the XLA attention "
              "path (parity with the Pallas kernel, see "
              "benchmarks/RESULTS.md)")
    if opt.net == "reg_transformer":
        model = EncoderTransformer(
            mean_params=mean_j, iteration=opt.iteration,
            heads=opt.vit_heads, depth=opt.vit_depth,
            mask_rate=opt.mask_rate, pos_embed=opt.pos_embed,
            pl_reg=opt.pl_reg, token_dim=token_dim,
            norm_layer=opt.norm_layer,
            use_pallas=use_pallas_attn, dtype=_dtype(opt))
    elif opt.net == "reg_transformer_coarse":
        model = EncoderTransformerCoarse(
            mean_params=mean_j, heads=opt.vit_heads, depth=opt.vit_depth,
            mask_rate=opt.mask_rate, pos_embed=opt.pos_embed,
            pl_reg=opt.pl_reg, token_dim=token_dim, dtype=_dtype(opt))
    # The 128-token heads CAN ride the flash kernel (use_pallas field,
    # interpret-parity tested) but default to the XLA einsum path: on
    # v5e the kernel measures ~1-3.5% SLOWER at this scale (incepv3
    # 2839 vs 2947 train crops/s, hrnet within noise — same verdict as
    # the FAVOR+ kernel, benchmarks/RESULTS.md).  The opt-in is
    # programmatic — model.clone(use_pallas=True) — NOT the
    # --use_pallas_attention flag: that flag defaults True for the
    # flagship, so routing it here would silently flip these heads
    # onto the measured-slower kernel for every CLI run.
    elif opt.net == "backbone_hrnet":
        model = EncoderTransformerHRNet(
            mean_params=mean_j, iteration=opt.iteration,
            heads=opt.vit_heads, depth=opt.vit_depth,
            mask_rate=opt.mask_rate, pos_embed=opt.pos_embed,
            dtype=_dtype(opt))
    elif opt.net == "backbone_incepv3":
        model = EncoderTransformerInception(
            mean_params=mean_j, iteration=opt.iteration,
            heads=opt.vit_heads, depth=opt.vit_depth,
            mask_rate=opt.mask_rate, pos_embed=opt.pos_embed,
            dtype=_dtype(opt))
    elif opt.net == "frankmocap":
        cls = H3DWJointsEncoder if for_keypoints else H3DWEncoder
        model = cls(mean_params=mean_j, dtype=_dtype(opt))
    elif opt.net == "ViT":
        model = ViT(mean_params=mean_j, image_size=image_size,
                    dim=opt.vit_dim, depth=opt.vit_depth,
                    heads=opt.vit_heads, mlp_dim=opt.vit_mlp_dim,
                    dropout=opt.vit_dropout, iteration=opt.iteration,
                    dtype=_dtype(opt))
    elif opt.net == "ViP":
        from scat_tpu.models.performer import favor_precisions
        try:
            favor_precisions(opt.favor_precision)
        except KeyError:
            raise ValueError(
                f"--favor_precision {opt.favor_precision!r} is not one "
                "of highest/high/default/mixed/mixed_high "
                "(models/performer.py favor_precisions)") from None
        model = ViP(mean_params=mean_j, image_pix=image_size,
                    iteration=opt.iteration,
                    use_pallas=opt.use_pallas_favor,
                    remat=opt.remat_blocks,
                    dtype=_dtype(opt),
                    favor_precision=opt.favor_precision)
    else:
        raise ValueError(f"unknown --net {opt.net!r}")
    return model, mean


def check_eval_variables(opt: Options, variables) -> None:
    """Loud guard for user-injected eval variables.

    ViP's frozen FAVOR+ projection lives in the flax ``constants``
    collection (the torch reference keeps it as a module buffer,
    vision_performer.py:19-32); ``apply()`` without it dies deep inside
    flax with an opaque scope error at the first batch.  Catch it at
    construction instead."""
    if opt.net == "ViP" and not variables.get("constants"):
        raise ValueError(
            "net='ViP' needs the 'constants' collection (frozen FAVOR+ "
            "projection) in the injected variables; pass "
            "{'params': ..., 'batch_stats': ..., 'constants': "
            "state.constants} from the TrainState or import_torch_vip")
