"""HO-3D dataset loader (re-derived — the reference imports
``dataset/load_ho3d_ding.py`` which is MISSING from the public snapshot,
SURVEY.md "Missing modules").

Re-derivation sources: the 166-float label contract
(reference train.py:193-196, same as FreiHAND), the OpenGL-coordinate
projection helper shipped in load_test_dataset.py:33-53 (HO-3D
annotations ARE OpenGL-coords, hence is_OpenGL_coords=True), the
HO3D-order fingertip comment block (reference models/mano.py:366-371),
and the standard public HO-3D v2 disk layout
(train/{seq}/rgb/{frame}.png + meta/{frame}.pkl with handJoints3D,
handPose, handBeta, camMat).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu.config import Options
from scat_tpu.data import preprocess
from scat_tpu.data.freihand import (pack_label_166, project_3D_points,
                                    rescale_3d_joints)

# MANO joint order -> the Simple/Snap skeleton order used for training
# labels (reference load_test_dataset.py:23-28).
jointsMapManoToSimple = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18,
                         10, 11, 12, 19, 7, 8, 9, 20]


class HO3DDataset:
    """Batches of (224x224x3 crop, 166-float label); crops via the fused
    on-device pipeline (hand-center crop, no flip — HO-3D is right
    hands)."""

    def __init__(self, data_dir: str, split: str = "train",
                 batch_size: int = 32, shuffle: bool = True,
                 seed: int = 0):
        self.data_dir = data_dir
        self.split = split
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        split_dir = os.path.join(data_dir, split)
        self.samples: List[Tuple[str, str]] = []
        for seq in sorted(os.listdir(split_dir)):
            rgb = os.path.join(split_dir, seq, "rgb")
            meta = os.path.join(split_dir, seq, "meta")
            if not (os.path.isdir(rgb) and os.path.isdir(meta)):
                continue
            for f in sorted(os.listdir(rgb)):
                stem = os.path.splitext(f)[0]
                m = os.path.join(meta, stem + ".pkl")
                if os.path.exists(m):
                    self.samples.append((os.path.join(rgb, f), m))

    def __len__(self) -> int:
        from scat_tpu.data.common import num_batches
        return num_batches(len(self.samples), self.batch_size)

    def sample_labels(self, meta_path: str):
        with open(meta_path, "rb") as f:
            meta = pickle.load(f, encoding="latin1")
        xyz = np.asarray(meta["handJoints3D"],
                         np.float32)[jointsMapManoToSimple]
        K = np.asarray(meta["camMat"], np.float32)
        joints_2d = project_3D_points(K, xyz, is_OpenGL_coords=True)
        joints_3d = rescale_3d_joints(xyz.copy())
        pose = np.asarray(meta.get("handPose", np.zeros(48)),
                          np.float32).reshape(-1)[:48]
        shape = np.asarray(meta.get("handBeta", np.zeros(10)),
                           np.float32).reshape(-1)[:10]
        return pack_label_166(pose, shape, joints_3d, joints_2d), joints_2d

    def _load_image(self, path: str) -> np.ndarray:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        from scat_tpu.data.common import epoch_order
        order, _ = epoch_order(self, len(self.samples))
        B = self.batch_size
        for b in range(len(self)):
            idxs = order[b * B:(b + 1) * B]
            imgs, labels, j2ds = [], [], []
            for i in idxs:
                rgb_path, meta_path = self.samples[i]
                label, j2d = self.sample_labels(meta_path)
                imgs.append(self._load_image(rgb_path))
                labels.append(label)
                j2ds.append(j2d)
            imgs = jnp.asarray(np.stack(imgs))
            labels = np.stack(labels)
            crops, j2d_out = preprocess.fused_crop_pipeline(
                imgs, jnp.asarray(np.stack(j2ds), jnp.float32),
                flip=False)
            labels[:, 124:] = np.asarray(j2d_out).reshape(B, 42)
            yield {"image": crops, "label": jnp.asarray(labels),
                   "valid": jnp.ones((B,), jnp.float32)}


def get_loader_ho3d(stage: str = "training", bs: int = 32,
                    opt: Optional[Options] = None, *,
                    shuffle: Optional[bool] = None) -> HO3DDataset:
    """Factory matching the missing module's surface (eval.py:38).

    The reference evaluates HO-3D with ``stage='training'``
    (eval.py:795) — the public evaluation split has no hand labels.
    Non-training stages use the ``evaluation`` split when present.

    ``shuffle`` defaults from ``stage``; evaluation callers that must
    read the train split (the reference quirk above) pass
    ``shuffle=False`` explicitly — the reference eval DataLoader does
    not shuffle (eval.py:796).
    """
    opt = opt or Options()
    data_dir = os.path.join(os.path.dirname(opt.data_dir.rstrip("/")),
                            "HO3D")
    if not os.path.isdir(data_dir):
        data_dir = opt.data_dir
    split = "train"
    if stage != "training" and os.path.isdir(
            os.path.join(data_dir, "evaluation")):
        # the public evaluation split ships WITHOUT hand labels
        # (handJoints3D is None/wrist-only); only use it when a probe
        # meta actually carries the full annotation — otherwise stay on
        # train like the reference does (eval.py:795, stage='training')
        probe = HO3DDataset(data_dir, "evaluation", bs, shuffle=False,
                            seed=opt.seed)
        try:
            if probe.samples:
                probe.sample_labels(probe.samples[0][1])
                split = "evaluation"
        except (KeyError, TypeError, ValueError, IndexError,
                OSError, EOFError, pickle.UnpicklingError) as e:
            # unlabeled-split signatures: missing keys (KeyError),
            # handJoints3D None (TypeError on asarray), wrist-only (3,)
            # arrays (IndexError on the joint reorder) — plus corrupt
            # probe metas (truncated/unreadable pkl: OSError, EOFError,
            # UnpicklingError), which must also fall back to the train
            # split rather than abort the whole eval
            print("[ho3d] evaluation split present but unlabeled or "
                  f"unreadable ({type(e).__name__}: {e}); evaluating on "
                  "the train split like the reference (eval.py:795)")
    if shuffle is None:
        shuffle = stage == "training"
    return HO3DDataset(data_dir, split, bs, shuffle=shuffle,
                       seed=opt.seed)


def get_loader_ho3d_eval(opt: Optional[Options] = None) -> HO3DDataset:
    opt = opt or Options()
    return get_loader_ho3d("val", opt.batch_size, opt)
