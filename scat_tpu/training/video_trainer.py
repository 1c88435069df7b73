"""Video/temporal training driver — the full SCAT stage (BASELINE
config 5): sequence chunking + per-frame encoder + MANO decode + VIBE
losses + motion-discriminator adversary.

The reference ships all the pieces but no driver (SURVEY.md §2.7: the
VIBELoss/MotionDiscriminator belong to the temporal stage; temporal
chunking lives in dataset/utils.py:158-178).  This driver assembles
them: a frame dataset with video ids -> 16-frame windows
(split_into_chunks) -> AdversarialTrainState updates.
"""

from __future__ import annotations

import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scat_tpu.config import Options
from scat_tpu.data.testset import split_into_chunks
from scat_tpu.models import mano as mano_lib
from scat_tpu.models.discriminator import MotionDiscriminator
from scat_tpu.models.hand_net import H3DWEncoder
from scat_tpu.models.vibe_loss import VIBELossConfig
from scat_tpu.training.adversarial import (AdversarialTrainState,
                                           make_adversarial_train_step)
from scat_tpu import assets


class VideoChunkDataset:
    """Frames + 166-labels + video ids -> [B, T, ...] window batches
    (window logic = reference utils.py:158-178 / eval.py:679-686)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 vid_names: np.ndarray, seqlen: int = 16,
                 stride: int = 8, batch_size: int = 2,
                 real_theta_bank: Optional[np.ndarray] = None,
                 seed: int = 0):
        self.images = images
        self.labels = labels
        self.windows = split_into_chunks(np.asarray(vid_names), seqlen,
                                         stride)
        self.seqlen = seqlen
        self.batch_size = batch_size
        self.seed = seed
        if real_theta_bank is None:
            # AMASS-style real-motion bank stand-in: smooth noise
            rng = np.random.RandomState(seed)
            base = rng.randn(64, 1, 61).astype(np.float32) * 0.05
            walk = np.cumsum(
                rng.randn(64, seqlen, 61).astype(np.float32) * 0.01,
                axis=1)
            real_theta_bank = base + walk
        self.real_theta_bank = real_theta_bank

    def __len__(self) -> int:
        return len(self.windows) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        epoch = getattr(self, "_epoch", 0)
        self._epoch = epoch + 1
        rng = np.random.RandomState(self.seed + 9973 * epoch)
        order = np.arange(len(self.windows))
        rng.shuffle(order)
        B, T = self.batch_size, self.seqlen
        for b in range(len(self)):
            idxs = order[b * B:(b + 1) * B]
            imgs = np.stack([
                self.images[self.windows[i][0]:self.windows[i][1] + 1]
                for i in idxs])
            labs = np.stack([
                self.labels[self.windows[i][0]:self.windows[i][1] + 1]
                for i in idxs])
            bank = self.real_theta_bank[
                rng.randint(0, len(self.real_theta_bank), B)]
            yield {"image": jnp.asarray(imgs),
                   "label": jnp.asarray(labs),
                   "real_theta": jnp.asarray(bank)}


class VideoTrainer:
    """``VideoTrainer(opt).train(dataset)`` — the temporal stage."""

    def __init__(self, opt: Options, image_size: int = 224,
                 cfg: VIBELossConfig = VIBELossConfig(),
                 disc_pool: str = "attention"):
        self.opt = opt
        mean61 = jnp.asarray(assets.load_mean_mano_pose(
            opt.mean_mano_param))
        self.encoder = H3DWEncoder(mean_params=mean61,
                                   dtype=jnp.dtype(opt.compute_dtype))
        # reference VIBE discriminator defaults: GRU 1024x2, attention
        # pooling (motion_discriminator.py:85-94)
        self.discriminator = MotionDiscriminator(
            rnn_size=1024, input_size=48, num_layers=2, output_size=2,
            feature_pool=disc_pool)
        self.mano_model = mano_lib.ManoModel.from_data()
        self.gen_tx = optax.adam(opt.lr)
        self.disc_tx = optax.adam(opt.lr * 0.1)
        self.cfg = cfg
        self.image_size = image_size

    def init_state(self, sample_batch) -> AdversarialTrainState:
        B, T = sample_batch["image"].shape[:2]
        flat = sample_batch["image"].reshape(
            (B * T,) + sample_batch["image"].shape[2:])
        gen_vars = self.encoder.init(jax.random.key(self.opt.seed), flat)
        disc_vars = self.discriminator.init(
            jax.random.key(self.opt.seed + 1),
            sample_batch["real_theta"][:, :, 3:51])
        return AdversarialTrainState.create(
            gen_vars, disc_vars, self.gen_tx, self.disc_tx,
            jax.random.key(self.opt.seed + 2))

    def train(self, dataset, epochs: Optional[int] = None):
        epochs = epochs or self.opt.epoch
        step = jax.jit(make_adversarial_train_step(
            self.encoder, self.discriminator, self.mano_model,
            self.gen_tx, self.disc_tx, self.cfg))
        state = None
        for epoch in range(epochs):
            t0 = time.time()
            n = 0
            for batch in dataset:
                if state is None:
                    state = self.init_state(batch)
                state, stats = step(state, batch)
                n += batch["image"].shape[0]
            print("[video %d] gen: %.3f disc: %.3f (d_real %.3f "
                  "d_fake %.3f) %.1f seq/s"
                  % (epoch + 1, float(stats["gen_loss"]),
                     float(stats["disc_loss"]), float(stats["d_real"]),
                     float(stats["d_fake"]),
                     n / max(time.time() - t0, 1e-9)))
        return state
