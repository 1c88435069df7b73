"""Evaluation driver — the reference ``eval.py`` benchmark flow.

Reference Trainer.eval (eval.py:788-1053): per batch — empty filter,
forward, projection, PA-Procrustes, PCK(20..50mm) accumulation, per-batch
AUC + FPS print, MPJPE per-sample accumulation; finally pck_all /= n,
AUC over the averaged curve, PCK.png, and MPJPE/AUC prints.

The per-batch compute is one jitted program (steps.make_eval_step); the
host loop accumulates numpy scalars and renders the curve.
"""

from __future__ import annotations

import os
import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu.config import Options
from scat_tpu.models import build_model, check_eval_variables
from scat_tpu.ops import metrics as metrics_lib
from scat_tpu.parallel import mesh as mesh_lib
from scat_tpu.training import steps
from scat_tpu.utils import checkpoint as ckpt_lib

RNGE = np.arange(20, 51, 5)


def save_pck_curve(rnge: np.ndarray, pck_curve: np.ndarray, path: str):
    """PCK.png (reference eval.py:1031-1047)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception as e:  # pragma: no cover
        print(f"matplotlib unavailable, skipping PCK.png: {e}")
        return
    plt.figure(figsize=(7, 7))
    plt.plot(rnge, pck_curve, label="PCK", linewidth=2)
    plt.xlim(20, 50)
    plt.xticks(np.arange(20, 51, 5))
    plt.yticks(np.arange(0, 101.0, 10.0))
    plt.ylabel("Detection rate, %")
    plt.xlabel("Error Thresholds (mm)")
    plt.grid()
    legend = plt.legend(loc=4)
    legend.get_frame().set_facecolor("white")
    plt.savefig(path)
    plt.close()


class Evaluator:
    """``Evaluator(opt).eval(eval_dataset)`` — reference eval surface."""

    def __init__(self, opt: Options, image_size: int = 224,
                 dataset: Optional[Iterable] = None,
                 variables=None):
        self.opt = opt
        self.batch_size = opt.batch_size
        self.result_dir = opt.result_dir
        os.makedirs(self.result_dir, exist_ok=True)
        # multi-host pods: join the coordination service before the
        # first backend touch, exactly like Trainer — without this the
        # cross-host MPJPE aggregation path below can never activate
        # from the `scat-eval` entry point (each process would see only
        # its local devices)
        mesh_lib.maybe_initialize_distributed()
        self.mesh = mesh_lib.make_mesh(opt.mesh_axes())
        self.model, self.mean_params = build_model(opt, image_size,
                                                   for_keypoints=True)
        self.dataset = dataset

        if variables is None:
            sample = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            variables = self.model.init(
                {"params": jax.random.key(0),
                 "mask": jax.random.key(1),
                 "dropout": jax.random.key(2)}, sample, train=False)
            variables = dict(variables)
            # ViP's frozen FAVOR+ projection is part of the saved
            # TrainState — evaluating with a re-drawn one would
            # silently use the wrong feature map; it merges from the
            # same single checkpoint read as params/BN stats
            p, bs, c = ckpt_lib.restore_variables_nonstrict(
                opt.checkpoint_path_eval, variables["params"],
                variables.get("batch_stats", {}),
                constants=dict(variables.get("constants", {})))
            variables["params"] = p
            variables["batch_stats"] = bs
            variables["constants"] = c
        check_eval_variables(opt, variables)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.constants = variables.get("constants", {})

        self.want_attn = (opt.net == "reg_transformer_coarse"
                          and opt.debug)
        raw = steps.make_eval_step(
            self.model, pl_reg=False,
            pck_range=tuple(int(r) for r in RNGE),
            flat_compat=opt.compat_pck_flat,
            return_attn=self.want_attn,
            constants=self.constants)
        self.eval_step = mesh_lib.jit_eval_step(raw, self.mesh)
        if jax.process_count() > 1:
            # align first-touch compiles across hosts before the first
            # collective dispatch (same failure mode as the trainer's
            # barrier: compile skew vs the transport connect window)
            self.eval_step = mesh_lib.CompileBarrierStep(
                self.eval_step, "eval_step")

    def _maybe_dump_attention(self, batch, out, n: int):
        """Per-finger attention-line renderings for the coarse head
        (reference eval.py:834,864-944).  The attention comes out of the
        jitted eval step itself — one forward per batch in all modes
        (the reference pays a second full forward for this dump)."""
        if not self.want_attn:
            return
        if jax.process_index() != 0:
            return  # one host renders; filenames would collide
        # multi-host: read only this host's addressable rows (a global
        # np.asarray is impossible; a slice program would cross
        # collectives with the other hosts' eval steps)
        attn = mesh_lib.host_local_rows(out["attn"])   # [b, H, N, N]
        labels = mesh_lib.host_local_rows(batch["label"])
        idx = min(1, attn.shape[0] - 1)    # reference samples index 1
        gt_lmk = labels[idx, 63:].reshape(21, 2) \
            if labels.shape[1] == 105 else \
            labels[idx, 124:].reshape(21, 2)
        from scat_tpu.viz.draw import save_attention_maps
        save_attention_maps(attn[idx], gt_lmk, self.result_dir, n)

    def eval(self, eval_dataset: Optional[str] = None):
        """Evaluate on ``eval_dataset`` ('STB'/'frei'/'ho3d'); defaults
        to ``opt.eval_dataset``.  An injected ``dataset`` iterable takes
        precedence (it IS the data; a name would be ignored, so passing
        both is an error)."""
        if self.dataset is not None:
            if eval_dataset is not None:
                raise ValueError(
                    "Evaluator was constructed with an injected dataset;"
                    " eval(eval_dataset=...) would be ignored")
            loader = self.dataset
        else:
            import dataclasses as _dc
            from scat_tpu.training.trainer import make_dataset
            opt = (self.opt if eval_dataset is None
                   else _dc.replace(self.opt, eval_dataset=eval_dataset))
            loader = make_dataset(opt, 224, training=False)

        pc = jax.process_count()
        is_main = jax.process_index() == 0
        if pc > 1:
            # each host's loader feeds a disjoint shard of the eval set
            # and shard_batch assembles them into ONE global batch, so
            # the per-batch PCK/AUC (full-batch masked reductions,
            # replicated out of the jitted step) already cover BOTH
            # hosts' samples; the per-sample MPJPE comes back sharded
            # and is summed host-locally then aggregated at the end
            print(f"[eval] {pc} processes: per-batch PCK/AUC cover the "
                  "global batch; final MPJPE aggregates across hosts")

        from scat_tpu.utils.logging import MetricsLogger
        logger = MetricsLogger(self.result_dir if is_main else None,
                               filename="eval_metrics.csv",
                               tensorboard=self.opt.tensorboard)
        pck_all = np.zeros((len(RNGE), 22))
        mpjpe_chunks = []
        auc_3d = []
        n = 0
        for batch in loader:
            n += 1
            t0 = time.time()
            batch = mesh_lib.shard_batch(self.mesh, batch)
            out = self.eval_step(self.params, self.batch_stats, batch)
            self._maybe_dump_attention(batch, out, n)
            # pck is a full-batch reduction -> replicated (global even
            # multi-host); the per-sample arrays are batch-sharded, so
            # read THIS host's rows only
            pck = np.asarray(out["pck"])
            err = mesh_lib.host_local_rows(out["mpjpe_per_sample"])
            valid = mesh_lib.host_local_rows(out["valid"]).astype(bool)
            fps = self.batch_size / (time.time() - t0)
            print(f"FPS: {fps:.2f}")
            pck_all += pck
            auc = float(metrics_lib.area_under_curve(
                jnp.asarray(RNGE / RNGE.max(), jnp.float32),
                jnp.asarray(pck[:, -1], jnp.float32)))
            auc_3d.append(auc)
            print("AUC: {}.".format(auc))
            print("@50: {}.".format(pck[-1, -1]))
            # the CSV's per-batch mpjpe covers this host's rows of the
            # global batch (the final row aggregates all hosts)
            logger.log(n, {"fps": fps, "auc": auc,
                           "pck_at_50": pck[-1, -1],
                           "mpjpe_mm": (1000 * err[valid].mean()
                                        if valid.any() else float("nan"))})
            mpjpe_chunks.append(err[valid])
        pck_all /= max(n, 1)
        local = (np.concatenate(mpjpe_chunks) if mpjpe_chunks
                 else np.zeros((0,)))
        if pc > 1:
            # one symmetric collective AFTER the loop (every process
            # reaches it — uniform per-host batch counts), summing the
            # per-host (sum, count) into the full-set mean
            from jax.experimental import multihost_utils
            sums = np.asarray(multihost_utils.process_allgather(
                np.array([local.sum(), local.size], np.float32)))
            total, cnt = sums.sum(axis=0)
            mpjpe_mean = float(total / max(cnt, 1.0))
        else:
            mpjpe_mean = float(local.mean()) if local.size else 0.0
        auc = float(metrics_lib.area_under_curve(
            jnp.asarray(RNGE / RNGE.max(), jnp.float32),
            jnp.asarray(pck_all[:, -1], jnp.float32)))
        if is_main:
            save_pck_curve(RNGE, pck_all[:, -1],
                           os.path.join(self.result_dir, "PCK.png"))
        print("*** Final Results ***")
        print()
        print("MPJPE: " + str(1000 * mpjpe_mean))
        print("AUC: " + str(auc))
        logger.log(n, {"fps": float("nan"), "auc": auc,
                       "pck_at_50": pck_all[-1, -1],
                       "mpjpe_mm": 1000 * mpjpe_mean})
        logger.close()
        return {"mpjpe_mm": 1000 * mpjpe_mean, "auc": auc,
                "pck": pck_all}


def main(argv=None):
    from scat_tpu.config import BaseOptions
    opt = BaseOptions().parse(argv)
    Evaluator(opt).eval(eval_dataset=opt.eval_dataset)


if __name__ == "__main__":
    main()
