"""Checkpoint / resume.

Reference behavior being preserved (SURVEY.md §5): save every 10 epochs
to ``{checkpoint_folder}/hand_net.pth`` plus a final
``hand_net_final.pth`` (reference train.py:237-246); resume loads
``--checkpoint_hand`` with a partial, non-strict merge
(``load_state_dict(strict=False)``, train.py:66-75) and a missing file
is a warning, not an error (train.py:68-70).

Upgrades over the reference: the checkpoint is the FULL train state
(params, optimizer state, BN stats, PL-EMA, PRNG, step) written
atomically via Orbax, so resume is exact; the reference lost optimizer
and scheduler state.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from scat_tpu.training.state import TrainState

FINAL_NAME = "hand_net_final"
PERIODIC_NAME = "hand_net"


def _path(folder: str, name: str) -> str:
    return os.path.abspath(os.path.join(folder, name))


def save_state(folder: str, state: TrainState, name: str = PERIODIC_NAME
               ) -> str:
    """Atomic full-state save (replaces torch.save of a bare state_dict)."""
    os.makedirs(folder, exist_ok=True)
    path = _path(folder, name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


class AsyncSaver:
    """Non-blocking periodic saves for the training loop.

    The reference's ``torch.save`` every 10 epochs (train.py:237-246)
    blocks the step loop for the full serialize+write.  Orbax's async
    checkpointer moves the disk write (and atomic rename) to a
    background thread: the caller only pays the device->host gather,
    and the next epoch's steps overlap the write.  ``save`` waits for
    any in-flight write first (two writers racing on the same atomic
    rename would corrupt neither but could interleave their tmp dirs);
    call :meth:`close` before a final blocking save or process exit."""

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())

    def save(self, folder: str, state: TrainState,
             name: str = PERIODIC_NAME) -> str:
        os.makedirs(folder, exist_ok=True)
        path = _path(folder, name)
        self._ckptr.wait_until_finished()
        self._ckptr.save(path, args=ocp.args.StandardSave(state),
                         force=True)
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()  # close() finalizes any in-flight save


def _load_pth_into(path: str, params: Any, batch_stats: Any):
    """Merge a reference torch ``.pth`` into FRESH COPIES of
    (params, batch_stats); returns the new trees.  Layout auto-detected
    (torch_import.import_torch_auto).

    Coverage is validated: zero merges is an error (wrong architecture
    entirely), and a partial merge — shape mismatches from e.g. a
    heads/depth flag that differs from the checkpoint — prints a loud
    warning, because eval on half-random weights yields finite-looking
    garbage metrics."""
    from scat_tpu.utils import torch_import
    sd = torch_import.load_torch_checkpoint(path)
    # rebuild the container dicts so the caller's trees are never
    # mutated (flax.core.unfreeze is identity on plain dicts)
    p = jax.tree.map(lambda x: x, dict(params))
    b = (jax.tree.map(lambda x: x, dict(batch_stats))
         if batch_stats is not None else {})
    merged = torch_import.import_torch_auto(sd, p, b)
    portable = [k for k in sd
                if k.endswith((".weight", ".bias", ".running_mean",
                               ".running_var"))
                and "positionalEncoding" not in k] \
        + (["mask_token"] if "mask_token" in sd else [])
    if merged == 0:
        raise ValueError(
            f"{path}: no tensor of the torch checkpoint matched the "
            "built model — architecture mismatch "
            f"(checkpoint keys: {sorted(sd)[:4]}...)")
    if merged < len(portable):
        print(f"WARNING: only {merged}/{len(portable)} checkpoint "
              f"tensors matched the model (shape/arch mismatch — check "
              "--vit_heads/--vit_depth/--net against the checkpoint); "
              "unmatched weights keep their fresh initialization")
    print(f"torch checkpoint: merged {merged} tensors from {path}")
    return p, b


def restore_state(path: str, template: TrainState
                  ) -> Optional[TrainState]:
    """Restore a full train state; returns None if the path is missing
    (reference train.py:68-70 prints and trains from scratch).

    A ``.pth`` path loads a reference torch checkpoint instead:
    params + BN stats merge in, optimizer state starts fresh — exactly
    the reference's resume semantics (train.py:66-75 reloads only the
    state_dict)."""
    path = os.path.abspath(path)
    if not os.path.exists(path):
        print(f"Error: {path} does not exists, Start from Scratch...")
        return None
    if path.endswith(".pth"):
        p, b = _load_pth_into(path, template.params,
                              template.batch_stats)
        return template.replace(params=p, batch_stats=b)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, template)
    print(f"Checkpoint loaded from: {path}")
    return restored


def restore_variables_nonstrict(path: str, params: Any,
                                batch_stats: Any = None,
                                constants: Any = None):
    """Partial load of params AND normalization statistics.

    Returns ``(params, batch_stats)``; eval without the trained BN
    running stats would silently normalize with init values.  Pass a
    ``constants`` template (ViP's frozen FAVOR+ projection) to also get
    ``(params, batch_stats, constants)`` back from the SAME single
    deserialization — a ``.pth`` or scratch path returns the template
    unchanged (torch checkpoints carry the projection inside the
    importer's own keys).

    Reference ``.pth`` checkpoints (``--checkpoint_path_eval
    experiments/.../hand_net_final.pth``, eval.sh:5) load directly via
    the torch importers — a reference user's existing weights evaluate
    in this framework unchanged."""

    def ret(p, b, c):
        return (p, b) if constants is None else (p, b, c)

    if path.endswith(".pth"):
        apath = os.path.abspath(path)
        if not os.path.exists(apath):
            # match torch.load: a typo'd eval checkpoint must not fall
            # through to evaluating randomly-initialized weights
            raise FileNotFoundError(
                f"torch checkpoint {apath} does not exist")
        return ret(*_load_pth_into(apath, params, batch_stats),
                   constants)
    if not path or not os.path.exists(os.path.abspath(path)):
        # scratch path: reuse the single-tree loader's messages
        return ret(restore_params_nonstrict(path, params, key="params"),
                   batch_stats, constants)
    # one deserialization serves all collections (a separate
    # restore_params_nonstrict per key would read the checkpoint again
    # in full — for a ViP checkpoint that doubles the load time)
    loaded = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    # templateless restore commits each leaf with the SAVING run's
    # sharding (e.g. FSDP 'data'-sharded params from a --param_sharding
    # fsdp run); the consumers here pin their OWN placements (eval/demo
    # jit replicated in_shardings — jit rejects committed args with a
    # different sharding).  Hand back host arrays and let the consumer's
    # jit/device_put place them: a one-time D2H at load is nothing next
    # to a failed eval of an FSDP-trained checkpoint.  (Typed PRNG keys
    # — the full state's ``rng`` — have no numpy form and aren't merged
    # into any collection here, so they pass through untouched.)
    loaded = jax.tree_util.tree_map(
        lambda x: np.asarray(x)
        if hasattr(x, "sharding")
        and not jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
        else x,
        loaded)
    new_params, skipped = _merge_nonstrict(
        params, loaded.get("params", loaded))
    _report_skipped(skipped)
    new_bs = batch_stats
    if batch_stats is not None:
        new_bs, _ = _merge_nonstrict(batch_stats,
                                     loaded.get("batch_stats"))
    new_const = constants
    if constants:
        new_const, _ = _merge_nonstrict(constants,
                                        loaded.get("constants"))
    return ret(new_params, new_bs, new_const)


def restore_params_nonstrict(path: str, params: Any,
                             key: str = "params",
                             quiet: bool = False) -> Any:
    """Partial parameter load: keep current values for anything missing
    in the checkpoint — the ``strict=False`` semantics the reference uses
    for both resume and eval loading (train.py:73, eval.py:393-402).

    An empty path means "from scratch" explicitly (abspath('') would
    otherwise resolve to the cwd and hit the orbax loader)."""
    if not path:
        if not quiet:
            print("no checkpoint path given, Start from Scratch...")
        return params
    path = os.path.abspath(path)
    if not os.path.exists(path):
        if not quiet:
            print(f"Error: {path} does not exists, "
                  "Start from Scratch...")
        return params
    ckptr = ocp.PyTreeCheckpointer()
    loaded = ckptr.restore(path)
    loaded_params = loaded.get(key, loaded if key == "params" else None)
    merged, skipped = _merge_nonstrict(params, loaded_params)
    _report_skipped(skipped)
    return merged


def _merge_nonstrict(params: Any, loaded_params: Any):
    """Merge a loaded tree onto the current one, keeping current values
    for anything missing; returns ``(merged, skipped_descriptions)``."""
    skipped = []

    def merge(cur, new, prefix=""):
        if isinstance(cur, dict):
            return {k: merge(v, new.get(k) if isinstance(new, dict)
                             else None, f"{prefix}{k}/")
                    for k, v in cur.items()}
        if new is None:
            return cur
        # size-mismatched tensors are skipped and reported, like
        # torch's load_state_dict(strict=False)
        import numpy as _np
        if _np.shape(new) != _np.shape(cur):
            skipped.append(
                f"{prefix[:-1]}: ckpt{_np.shape(new)} != "
                f"model{_np.shape(cur)}")
            return cur
        return new

    return merge(params, loaded_params), skipped


def _report_skipped(skipped) -> None:
    if skipped:
        print(f"skipped {len(skipped)} size-mismatched tensors: "
              + ", ".join(skipped[:5])
              + ("..." if len(skipped) > 5 else ""))
