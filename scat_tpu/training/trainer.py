"""Training driver — the reference ``train.py`` re-imagined for TPU.

Reference call stack (train.py:122-246): epoch loop -> warmup-scheduler
step -> batch loop -> empty-sample filter -> H2D -> forward -> projection
-> losses -> backward -> Adam -> running-loss prints every 10 steps ->
checkpoint every 10 epochs -> final save.

Here: one jitted, mesh-sharded step does filter(mask)/forward/loss/
backward/update; the host loop only feeds batches and logs.  Loss prints
keep the reference's format and cadence (train.py:230-232).
"""

from __future__ import annotations

import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp

from scat_tpu.config import Options
from scat_tpu.data.synthetic import SyntheticDataset
from scat_tpu.models import build_model
from scat_tpu.parallel import mesh as mesh_lib
from scat_tpu.training import schedule, steps
from scat_tpu.training.state import TrainState
from scat_tpu.utils import checkpoint as ckpt_lib


from scat_tpu.utils.profiling import \
    enable_compilation_cache as _enable_compilation_cache  # noqa: E402


def _load_pretrained_backbone(path: str, params, batch_stats):
    """Merge a local torchvision ImageNet ResNet ``.pth`` into the
    backbone subtree, ``strict=False`` (the reference always initializes
    from model-zoo weights, resnet.py:186-196; zero-egress pods must
    stage the file locally — see --pretrained_resnet_pth in config.py)."""
    from scat_tpu.utils import torch_import
    sd = torch_import.load_torch_checkpoint(path)
    # rebuild containers: flax.core.unfreeze is identity on plain dicts
    # and the merge would otherwise mutate the caller's trees
    params = jax.tree.map(lambda x: x, dict(params))
    batch_stats = (jax.tree.map(lambda x: x, dict(batch_stats))
                   if batch_stats else {})
    p_sub = params.get("main_encoder", params)
    b_sub = batch_stats.get("main_encoder", batch_stats)
    merged = torch_import.import_torch_resnet(sd, p_sub, b_sub)
    if merged == 0:
        # a wrong file (e.g. a full hand_net .pth with main_encoder.*
        # keys) would otherwise silently train from scratch, defeating
        # the flag's purpose (same guard as checkpoint._load_pth_into)
        raise ValueError(
            f"--pretrained_resnet_pth {path!r}: no tensor matched the "
            "torchvision ResNet layout (expected keys like "
            "'conv1.weight', 'layer1.0.conv1.weight')")
    print(f"pretrained backbone: merged {merged} tensors from {path}")
    return params, batch_stats


def make_dataset(opt: Options, image_size: int, training: bool = True):
    # multi-host: every loader is built at the PER-HOST batch size and
    # walks a disjoint host_shard of each epoch (data/common.py); the
    # host batches reassemble into one global array in
    # mesh_lib.shard_batch.  Single process: lbs == opt.batch_size.
    from scat_tpu.data.common import local_batch_size
    lbs = local_batch_size(opt.batch_size)
    if opt.synthetic_data:
        return SyntheticDataset(lbs,
                                num_batches=opt.steps_per_epoch or 16,
                                seed=opt.seed, image_size=image_size,
                                layout=opt.synthetic_layout)
    if training:
        # stage-driven dataset mix (reference train.py:36 ->
        # MultiDataset.concat_dataset; stage 3 == STB-only)
        from scat_tpu.data.multi import concat_dataset
        return concat_dataset(lbs, opt)
    if opt.eval_dataset == "frei":
        # stage='training' picks the labeled split (the reference
        # evaluates FreiHAND/HO-3D on it, eval.py:793-795) but eval
        # batches must be deterministic and un-augmented
        from scat_tpu.data.freihand import get_loader_frei
        return get_loader_frei("training", lbs, opt,
                               shuffle=False, color_jitter=False)
    if opt.eval_dataset == "ho3d":
        from scat_tpu.data.ho3d import get_loader_ho3d
        return get_loader_ho3d("training", lbs, opt, shuffle=False)
    from scat_tpu.data.stb import get_loader_STB_eval
    return get_loader_STB_eval(opt)


class Trainer:
    """``Trainer(opt).train()`` — reference train.py:29-246 surface."""

    def __init__(self, opt: Options, image_size: int = 224,
                 dataset: Optional[Iterable] = None):
        self.opt = opt
        self.image_size = image_size
        self.batch_size = opt.batch_size
        self.lr = opt.lr
        self.epoches = opt.epoch
        self.pl = opt.pl_reg
        print("with pose length reg" if self.pl
              else "no pose length reg")
        self.l_weight_3d = opt.l_weight_3d
        self.l_weight_2d = opt.l_weight_2d
        if not (self.l_weight_3d or self.l_weight_2d or self.pl):
            # faithful reference default (config.py:56-57 defaults BOTH
            # weights to 0.0) — but training with an identically-zero
            # loss silently optimizes nothing, so say it out loud; the
            # canonical runs pass --l_weight_3d 100000 --l_weight_2d 10
            # (script/ablation_pose.sh:5)
            print("WARNING: l_weight_3d == l_weight_2d == 0 and pl_reg "
                  "off — the training loss is identically zero (the "
                  "reference's default too); pass --l_weight_3d 100000 "
                  "--l_weight_2d 10 for the canonical run")

        mesh_lib.maybe_initialize_distributed()
        _enable_compilation_cache()
        self.mesh = mesh_lib.make_mesh(opt.mesh_axes())
        # multi-host: host-side surfaces (CSV/TB logger, debug grids,
        # stdout cadence prints) are process-0 only; checkpoint saves
        # stay COLLECTIVE (orbax requires every process to participate)
        self.is_main = jax.process_index() == 0

        if opt.net == "reg_transformer":
            print("[iccv2021 scat] Transformer regressor...")
        elif opt.net in ("frankmocap", "backbone_hrnet",
                         "backbone_incepv3"):
            # These heads emit 61-dim MANO parameters, not the 66-dim
            # camera+joints vector this keypoint loss consumes.  The
            # reference ships no training driver for them either
            # (train.py:53-57 handles only reg_transformer); train them
            # through the MANO-decoding adversarial/temporal stage
            # (scat_tpu.training.adversarial) instead.
            raise ValueError(
                f"--net {opt.net} is a 61-dim MANO-parameter head; "
                "use scat_tpu.training.adversarial for training or "
                "scat_tpu.evaluation.tester for inference")
        self.model, self.mean_params = build_model(opt, image_size)

        self.train_loader = (dataset if dataset is not None
                             else make_dataset(opt, image_size))
        steps_per_epoch = len(self.train_loader)
        print("batch num", steps_per_epoch)

        self.tx = schedule.make_optimizer(self.lr, steps_per_epoch,
                                          warmup_epochs=15,
                                          freeze_backbone=opt.freeze)
        rng = jax.random.key(opt.seed)
        init_rngs = {"params": jax.random.fold_in(rng, 0),
                     "mask": jax.random.fold_in(rng, 1),
                     "dropout": jax.random.fold_in(rng, 2)}
        sample = jnp.zeros((opt.batch_size, image_size, image_size, 3),
                           jnp.float32)
        variables = self.model.init(init_rngs, sample, train=True)
        self.constants = variables.get("constants", {})
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if opt.pretrained_resnet_pth:
            params, batch_stats = _load_pretrained_backbone(
                opt.pretrained_resnet_pth, params, batch_stats)
        self.state = TrainState.create(
            params, batch_stats, self.tx, jax.random.fold_in(rng, 3),
            constants=self.constants)

        if opt.resume:
            restored = ckpt_lib.restore_state(opt.checkpoint_hand,
                                              self.state)
            if restored is not None:
                self.state = restored
                self.success_load = True
            else:
                self.success_load = False

        if opt.grad_accum < 1 or opt.batch_size % opt.grad_accum:
            raise ValueError(
                f"--grad_accum {opt.grad_accum} must be >= 1 and divide "
                f"--batch_size {opt.batch_size}")
        raw_step = steps.make_train_step(
            self.model, self.tx, self.l_weight_3d, self.l_weight_2d,
            pl_reg=self.pl, ema_reset_compat=opt.compat_pl_ema_reset,
            grad_accum=opt.grad_accum)
        if opt.param_sharding not in ("replicated", "fsdp"):
            raise ValueError(
                f"--param_sharding {opt.param_sharding!r}: expected "
                "'replicated' or 'fsdp'")
        if opt.param_sharding == "fsdp":
            # ZeRO-3 style: params + Adam moments shard over ``data``;
            # GSPMD gathers weights at use and reduce-scatters grads
            self.state = mesh_lib.fsdp_state(self.mesh, self.state)
            self.train_step = mesh_lib.jit_train_step_sharded(
                raw_step, self.mesh, self.state,
                donate_state=opt.donate_state)
        else:
            self.state = mesh_lib.replicate_state(self.mesh, self.state)
            self.train_step = mesh_lib.jit_train_step(
                raw_step, self.mesh, donate_state=opt.donate_state)
        if jax.process_count() > 1:
            # first-touch compile takes minutes and is per-host local;
            # without a rendezvous the fastest host's collectives time
            # out while the slowest is still compiling
            self.train_step = mesh_lib.CompileBarrierStep(
                self.train_step, "train_step")

    @staticmethod
    def _host_row0(x):
        """Global row 0 of a (possibly multi-host) batch array, read
        PURELY from this host's addressable shards — ``x[0]`` on a
        global sharded array dispatches a compiled slice program, and a
        program launched by ONE process crosses its collectives with the
        other processes' in-flight train steps (observed: Gloo
        'received data size doesn't match expected size' killing the
        whole run).  Returns None when this host doesn't own row 0."""
        import numpy as np
        if hasattr(x, "addressable_shards"):
            for sh in x.addressable_shards:
                start = sh.index[0].start if sh.index else 0
                if not start:  # None or 0 → shard covers global row 0
                    return np.asarray(sh.data)[0]
            return None
        return np.asarray(x[0])

    def _debug_visualize(self, batch, stats):
        """Every-100-steps GT/pred debug grid (reference train.py:211-222):
        denormalize sample 0's crop, slice its GT joints from the label
        row, pull the step's sample-0 predictions, save the 2x2 grid named
        by ``--debug_img``."""
        import numpy as np
        from scat_tpu.viz import draw
        img = self._host_row0(batch["image"])
        label = self._host_row0(batch["label"])
        if img is None or label is None:
            return
        print("==== Visualize ====")
        image = np.clip(img * 127.5 + 127.5, 0, 255).astype(np.uint8)
        off = 0 if label.shape[0] == 105 else 61  # 166-wide MANO labels
        gt_3d = label[off:off + 63].reshape(21, 3)
        gt_2d = label[off + 63:off + 105].reshape(21, 2)
        pred_3d = np.asarray(stats["pred0_3d"]).reshape(21, 3)
        pred_2d = np.asarray(stats["pred0_2d"]).reshape(21, 2)
        draw.debug_pred_gt(image, gt_2d, gt_3d, pred_2d, pred_3d,
                           self.opt.debug_img)

    def train(self):
        opt = self.opt
        log_every = max(opt.log_every, 1)
        from scat_tpu.data.prefetch import prefetch_to_device
        from scat_tpu.utils.logging import MetricsLogger
        from scat_tpu.utils.profiling import StepTimer, TraceWindow
        logger = MetricsLogger(
            opt.checkpoint_folder if self.is_main else None,
            tensorboard=opt.tensorboard)
        timer = StepTimer(self.batch_size)
        # --profile_trace_dir: one steady-state jax.profiler capture
        # (the reference's t0..t6 wall-clocks are collected and never
        # reported, train.py:128-208)
        trace = TraceWindow(opt.profile_trace_dir,
                            opt.profile_trace_steps)
        # periodic saves go through the async writer: the next epoch's
        # steps overlap the disk write (the reference's torch.save
        # blocks the loop, train.py:237-246)
        saver = ckpt_lib.AsyncSaver()
        global_step = 0
        for epoch in range(self.epoches):
            # loss_pl accumulates over the WHOLE epoch and prints raw —
            # the reference never resets it inside the window
            # (train.py:224-234 ``loss_pl += 10*l_pl``, no /10, no reset)
            running_loss = loss_3d = loss_2d = loss_pl = 0.0
            window_steps = 0
            t_epoch = time.time()
            n_samples = 0
            # background thread decodes/stages batch i+1 while the
            # device runs step i (replaces DataLoader workers); batches
            # arrive mesh-sharded
            loader = prefetch_to_device(self.train_loader, self.mesh)
            for i, batches in enumerate(loader):
                # ConcatDataset yields a tuple of per-dataset batches;
                # process each like the reference's inner loop
                # (train.py:136-138).  jit re-specializes per label
                # width (105 vs 166) — two cached programs, not a
                # recompile per step.
                if isinstance(batches, dict):
                    batches = (batches,)
                for batch in batches:
                    self.state, stats = self.train_step(self.state,
                                                        batch)
                    # sync only at log boundaries — a per-step
                    # block_until_ready would serialize dispatch with
                    # device execution and host work
                    timer.tick(stats["loss"] if i % log_every == 0
                               else None)
                    n_samples += self.batch_size
                    global_step += 1
                    trace.step(global_step, stats["loss"])
                    # accumulate ON DEVICE: a host float() here would
                    # force a D2H sync EVERY step, serializing dispatch
                    # with device execution (measured: the loop
                    # throughput collapses to ~1/5 of the device rate).
                    # The adds are tiny async ops; values only cross to
                    # the host at the log boundary below.  Inside the
                    # per-dataset loop so multi-dataset stages log every
                    # member's losses, not just the tuple's last.
                    running_loss = running_loss + stats["loss"]
                    loss_3d = loss_3d + stats["loss_3d"]
                    loss_2d = loss_2d + stats["loss_2d"]
                    loss_pl = loss_pl + stats["loss_pl"]
                    window_steps += 1
                if opt.debug and i % 100 == 0 and self.is_main:
                    # one render per firing (the reference re-renders —
                    # and overwrites the same PNG — once per dataset in
                    # the tuple, train.py:211-222; the last one is the
                    # only one that survives, so render only that)
                    self._debug_visualize(batch, stats)
                if i % log_every == 0:
                    # stdout divides by log_every like the reference
                    # (train.py:231-232) — with a multi-dataset tuple
                    # that inflates the printed figure by the member
                    # count, the reference's own quirk.  The CSV is OUR
                    # surface: it divides by the true step count so
                    # multi-dataset stages log honest per-step means.
                    # (multi-host: process 0 speaks for the run — the
                    # loss stats come out of the step replicated, so
                    # every host holds the same values)
                    if self.is_main:
                        print("[%d, %5d] loss: %.3f, 3d loss: %.3f, "
                              "2d loss: %.3f, pose length reg: %.3f"
                              % (epoch + 1, i + 1,
                                 float(running_loss) / log_every,
                                 float(loss_3d) / log_every,
                                 float(loss_2d) / log_every,
                                 float(loss_pl)))
                        steps_in_window = max(window_steps, 1)
                        logger.log(global_step, {
                            "epoch": epoch + 1,
                            "loss": float(running_loss)
                            / steps_in_window,
                            "loss_3d": float(loss_3d) / steps_in_window,
                            "loss_2d": float(loss_2d) / steps_in_window,
                            "loss_pl": float(loss_pl),
                            "samples_per_sec": timer.samples_per_sec,
                            "ms_per_step": timer.ms_per_step,
                        })
                    running_loss = loss_3d = loss_2d = 0.0
                    window_steps = 0
                    # per-window timing: a lifetime average would
                    # dilute late-training slowdowns and absorb the
                    # checkpoint-save stalls below into step time
                    timer.reset()
            dt = time.time() - t_epoch
            if self.is_main:
                print(f"epoch {epoch + 1}: "
                      f"{n_samples / dt:.1f} samples/s")
            if epoch % opt.checkpoint_every_epochs == 0:
                saver.save(opt.checkpoint_folder, self.state)
                timer.reset()
        print("Finished Training")
        trace.stop()  # safe no-op unless the run ended mid-window
        logger.close()
        try:
            saver.close()  # finalize any in-flight periodic write
        except Exception as e:
            # a transient periodic-write failure (orbax re-raises the
            # stored error here) must not abort the run before the
            # final checkpoint below is written
            print(f"WARNING: an async periodic checkpoint write "
                  f"failed ({type(e).__name__}: {e}); the final save "
                  "below still runs")
        ckpt_lib.save_state(opt.checkpoint_folder, self.state,
                            ckpt_lib.FINAL_NAME)


def main(argv=None):
    from scat_tpu.config import BaseOptions
    opt = BaseOptions().parse(argv)
    Trainer(opt).train()


if __name__ == "__main__":
    main()
