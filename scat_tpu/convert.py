"""Checkpoint conversion CLI: orbax train state <-> reference ``.pth``.

Both directions of the weight-interchange story as one command, so a
reference user can move in either direction without writing code
(the underlying walks live in ``utils/torch_import.py`` and are
parity-tested per variant in tests/test_full_model_parity.py,
test_backbone_parity.py, test_vit_vip_parity.py):

  # our orbax checkpoint -> torch state_dict the reference loads with
  # net.load_state_dict(..., strict=False)  (reference train.py:66-75)
  python -m scat_tpu.convert --direction to_pth --net reg_transformer \
      --checkpoint_path_eval experiments/run1/hand_net_final \
      --convert_out hand_net_final.pth

  # reference .pth -> orbax full train state (optimizer state fresh,
  # exactly like the reference's own resume, train.py:66-75)
  python -m scat_tpu.convert --direction to_orbax --net reg_transformer \
      --checkpoint_path_eval hand_net_final.pth \
      --convert_out experiments/imported

All model flags (--net, --vit_depth, --vit_heads, --iteration, ...)
must match the checkpoint being converted; mismatches surface as the
loud partial-merge warnings from utils/checkpoint.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu.config import Options
from scat_tpu.models import build_model
from scat_tpu.utils import checkpoint as ckpt_lib
from scat_tpu.utils import torch_import


def _init_variables(opt: Options, image_size: int = 224) -> dict:
    model, _ = build_model(opt, image_size)
    sample = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1),
         "dropout": jax.random.key(2)}, sample, train=False)
    return dict(variables)


def state_dict_for_net(net: str, params: dict, batch_stats: dict,
                       constants: dict, depth: int) -> dict:
    """Reference-keyed numpy state_dict for any ``--net`` variant."""
    if net == "reg_transformer":
        return torch_import.export_torch_encoder_transformer(
            params, batch_stats, depth=depth)
    if net == "reg_transformer_coarse":
        return torch_import.export_torch_encoder_transformer(
            params, batch_stats, depth=depth, coarse=True)
    if net == "ViT":
        return torch_import.export_torch_vit(params, depth=depth)
    if net == "ViP":
        return torch_import.export_torch_vip(params, constants,
                                             depth=depth)
    if net == "frankmocap":
        return torch_import.export_torch_h3dw(params, batch_stats)
    if net == "backbone_hrnet":
        return torch_import.export_torch_hrnet_encoder(
            params, batch_stats, depth=depth)
    if net == "backbone_incepv3":
        return torch_import.export_torch_inception_encoder(
            params, batch_stats, depth=depth)
    raise ValueError(f"no torch interchange for --net {net!r}")


def to_pth(opt: Options, out_path: str, image_size: int = 224) -> int:
    """Orbax (or .pth) checkpoint -> torch ``.pth``; returns tensor count."""
    import os

    import torch

    if not os.path.exists(os.path.abspath(opt.checkpoint_path_eval)):
        # the non-strict loader would otherwise fall back to "from
        # scratch" and we'd convert random initialization to .pth
        raise FileNotFoundError(
            f"--checkpoint_path_eval {opt.checkpoint_path_eval!r} "
            "does not exist")
    variables = _init_variables(opt, image_size)
    params, batch_stats, constants = ckpt_lib.restore_variables_nonstrict(
        opt.checkpoint_path_eval, variables["params"],
        variables.get("batch_stats", {}),
        constants=dict(variables.get("constants", {})))
    sd = state_dict_for_net(opt.net, params, batch_stats, constants,
                            depth=opt.vit_depth)
    # np.array copy: torch refuses to own non-writable (jax-backed)
    # buffers and warns about undefined behavior otherwise
    torch.save({k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
               out_path)
    return len(sd)


def to_orbax(opt: Options, out_dir: str, image_size: int = 224) -> str:
    """Reference ``.pth`` -> orbax full train state (fresh optimizer).

    The result resumes with ``--resume True --checkpoint_hand
    <out_dir>/hand_net_final`` or evaluates with
    ``--checkpoint_path_eval`` pointing at it."""
    from scat_tpu.training import schedule
    from scat_tpu.training.state import TrainState

    variables = _init_variables(opt, image_size)
    constants = dict(variables.get("constants", {}))
    if opt.net == "ViP":
        # ViP carries its frozen FAVOR+ projection in mains.{i}.w —
        # the generic loader refuses it (import_torch_auto) so route
        # through the ViP-specific importer
        sd = torch_import.load_torch_checkpoint(opt.checkpoint_path_eval)
        params = jax.tree.map(lambda x: x, dict(variables["params"]))
        merged = torch_import.import_torch_vip(sd, params, constants,
                                               depth=opt.vit_depth)
        print(f"torch checkpoint: merged {merged} tensors from "
              f"{opt.checkpoint_path_eval}")
        batch_stats = variables.get("batch_stats", {})
    else:
        params, batch_stats = ckpt_lib.restore_variables_nonstrict(
            opt.checkpoint_path_eval, variables["params"],
            variables.get("batch_stats", {}))
    tx = schedule.make_optimizer(opt.lr, steps_per_epoch=1)
    state = TrainState.create(params, batch_stats, tx,
                              jax.random.key(opt.seed),
                              constants=constants)
    return ckpt_lib.save_state(out_dir, state, ckpt_lib.FINAL_NAME)


def main(argv=None) -> None:
    import argparse
    import sys

    from scat_tpu.config import BaseOptions

    peel = argparse.ArgumentParser(add_help=False)
    peel.add_argument("--direction", required=True,
                      choices=("to_pth", "to_orbax"))
    peel.add_argument("--convert_out", required=True,
                      help="output .pth path (to_pth) or orbax "
                           "checkpoint dir (to_orbax)")
    conv_opt, rest = peel.parse_known_args(
        sys.argv[1:] if argv is None else argv)
    opt = BaseOptions().parse(rest)

    if conv_opt.direction == "to_pth":
        n = to_pth(opt, conv_opt.convert_out)
        print(f"wrote {n} tensors -> {conv_opt.convert_out}")
    else:
        path = to_orbax(opt, conv_opt.convert_out)
        print(f"wrote orbax train state -> {path}")


if __name__ == "__main__":
    main()
