"""RHD (Rendered Handpose Dataset) loader — re-derived.

The reference names RHD in its stage-2 mix ("use RHD, STB, freiHand,
STB, MHP", reference dataset/MultiDataset.py:28) and its sanity notebook
imports ``dataset/load_RHD.py`` — a module MISSING from the public
snapshot (SURVEY.md "Missing modules").  Re-derivation sources:

* the 105-float label layout (63 3D + 42 2D) the stage-2 loss dispatch
  implies (reference train.py:187-192);
* the public RHD v2 release layout (Zimmermann & Brox, ICCV'17):
  ``{split}/color/{05d}.png`` + ``{split}/anno_{split}.pickle`` mapping
  index -> {'xyz': [42,3] m, 'uv_vis': [42,3] (u, v, visible),
  'K': [3,3]} with rows 0-20 the LEFT hand and 21-41 the RIGHT, each
  ordered wrist then per-finger TIP->palm;
* the STB recipe for making a left hand into a right-hand training
  sample (mirror image + u coordinate, mirror 3D x — reference
  load_STB.py:69-74,98-110).

Per sample: pick the hand with more visible keypoints, reorder each
finger tip->palm into the wrist->palm->tip Snap order the labels use,
and (left hands only) mirror into a right hand.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu.config import Options
from scat_tpu.data import preprocess
from scat_tpu.data.mhp import normalize_3d_joints

# RHD orders each finger tip->palm (wrist, thumb[tip..palm], index[...],
# middle, ring, pinky); training labels use wrist->palm..tip per finger.
RHD_TO_SNAP = [0] + [4 * f + k for f in range(5) for k in (4, 3, 2, 1)]


class RHDDataset:
    """Batches of (224x224 crop, 105-float label) over one RHD split."""

    def __init__(self, data_dir: str, split: str = "training",
                 batch_size: int = 32, shuffle: bool = True,
                 seed: int = 0, min_visible: int = 11):
        self.data_dir = data_dir
        self.split = split
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        anno_path = os.path.join(data_dir, split,
                                 f"anno_{split}.pickle")
        self.color_dir = os.path.join(data_dir, split, "color")
        # tolerate a missing tree: a zero-length dataset lets stage-2
        # composition probe availability (multi.py guards on len())
        # without half-initialized probe objects
        if os.path.exists(anno_path):
            with open(anno_path, "rb") as f:
                self.anno = pickle.load(f, encoding="latin1")
        else:
            self.anno = {}
        # keep (index, hand) pairs with enough visible keypoints to
        # define the crop; hand 0 = left rows 0-20, 1 = right 21-41
        self.samples: List[tuple] = []
        for idx in sorted(self.anno.keys()):
            vis = np.asarray(self.anno[idx]["uv_vis"])[:, 2]
            for hand in (0, 1):
                if vis[21 * hand:21 * (hand + 1)].sum() >= min_visible:
                    self.samples.append((idx, hand))

    def __len__(self) -> int:
        from scat_tpu.data.common import num_batches
        return num_batches(len(self.samples), self.batch_size)

    def _load_image(self, idx: int) -> np.ndarray:
        from PIL import Image
        path = os.path.join(self.color_dir, f"{idx:05d}.png")
        return np.asarray(Image.open(path).convert("RGB"))

    def get_sample(self, i: int):
        """(image, kp_2d[21,2] px, kp_3d[21,3] normalized) — left hands
        mirrored into right hands (image u-flip + 3D x-mirror)."""
        idx, hand = self.samples[i]
        a = self.anno[idx]
        sl = slice(21 * hand, 21 * (hand + 1))
        kp_2d = np.asarray(a["uv_vis"], np.float32)[sl, :2][RHD_TO_SNAP]
        xyz = np.asarray(a["xyz"], np.float32)[sl][RHD_TO_SNAP]
        image = self._load_image(idx)
        if hand == 0:   # left -> right (reference load_STB.py:69-74)
            image = image[:, ::-1]
            kp_2d[:, 0] = image.shape[1] - 1 - kp_2d[:, 0]
            xyz = xyz * np.array([-1.0, 1.0, 1.0], np.float32)
        kp_3d = normalize_3d_joints(xyz)
        return image, kp_2d, kp_3d.astype(np.float32)

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        from scat_tpu.data.common import epoch_order
        order, _ = epoch_order(self, len(self.samples))
        B = self.batch_size
        for b in range(len(self)):
            imgs, j3ds, j2ds = [], [], []
            for oi in order[b * B:(b + 1) * B]:
                image, kp_2d, kp_3d = self.get_sample(int(oi))
                imgs.append(image)
                j2ds.append(kp_2d)
                j3ds.append(kp_3d)
            crops, j2d_out = preprocess.fused_crop_pipeline(
                jnp.asarray(np.stack(imgs)),
                jnp.asarray(np.stack(j2ds), jnp.float32), flip=False)
            label = np.concatenate(
                [np.stack(j3ds).reshape(B, 63),
                 np.asarray(j2d_out).reshape(B, 42)], axis=1)
            yield {"image": crops, "label": jnp.asarray(label),
                   "valid": jnp.ones((B,), jnp.float32)}


def _rhd_root(opt: Options) -> str:
    for name in ("RHD_published_v2", "RHD"):
        cand = os.path.join(os.path.dirname(opt.data_dir.rstrip("/")),
                            name)
        if os.path.isdir(cand):
            return cand
    return opt.data_dir


def get_loader_RHD(stage: str = "training", bs: int = 32,
                   opt: Optional[Options] = None) -> RHDDataset:
    """Factory mirroring the other re-derived loaders' surface
    (missing upstream module ``dataset/load_RHD.py``)."""
    opt = opt or Options()
    root = _rhd_root(opt)
    split = "training" if stage == "training" else "evaluation"
    return RHDDataset(root, split, bs, shuffle=(stage == "training"),
                      seed=opt.seed)
