"""MHP (Multiview Hand Pose) dataset loader — re-derived.

The reference imports ``MHP_eval`` from ``dataset/inference.py`` and
``get_loader_MHP`` in the stage-2/6 mixes, but BOTH modules are MISSING
from the public snapshot (SURVEY.md "Missing modules"; reference
eval.py:46, dataset/MultiDataset.py:35,71).  This re-derivation is built
from the call-site contracts that DO survive:

* demo loader: ``MHP_eval(seq_name)`` with ``seq_name='data_15_cam_1'``
  -> ``seq_len()`` + ``get_sample(i) -> (image, kp_2d[21,2],
  kp_3d[21,3])`` (reference eval.py:601-634);
* train loader: ``get_loader_MHP('training', batch_size, opt)``
  (reference MultiDataset.py:35,71) yielding the 105-float label layout
  (63 3D + 42 2D) the stage-2/6 loss dispatch implies
  (reference train.py:187-192);
* disk layout: the public MHP release (Gomez-Donoso et al.,
  "Large-scale Multiview 3D Hand Pose Dataset") —
  ``annotated_frames/data_N/{frame}_webcam_M.jpg`` +
  ``{frame}_joints.txt`` (21 rows of world-frame millimetre XYZ,
  optionally prefixed by a joint index) and per-sequence/per-camera
  extrinsics ``calibrations/data_N/webcam_M/rvec.pkl`` / ``tvec.pkl``.
  Webcam intrinsics ship in the MHP toolkit code, not the data tree;
  here they are read from ``calibrations/data_N/webcam_M/
  intrinsics.pkl`` (a 3x3 K) when present, else ``DEFAULT_K``.

Labels follow the STB recipe (reference load_STB.py:257-289): project
3D->2D with K, joint-centered 1.3x square crop to 224 with 2D remap
(fused on-device), mm->m, bone-rescale + root-center the 3D.  MHP
annotations are right hands viewed directly (no stereo left-hand
mirroring), so the STB ``hand_flip`` step is skipped — the same
right-hand convention as FreiHAND/HO-3D.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu.config import Options
from scat_tpu.data import preprocess

# Logitech C270 intrinsics used by the MHP capture rig (toolkit values;
# override with calibrations/<seq>/webcam_<m>/intrinsics.pkl).
DEFAULT_K = np.array([[614.878, 0.0, 313.219],
                      [0.0, 615.479, 231.288],
                      [0.0, 0.0, 1.0]], np.float32)


def _load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def read_joints_txt(path: str) -> np.ndarray:
    """21x3 world-frame joints (mm).  Rows may carry a leading joint
    index (``i x y z``) or be bare ``x y z``."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.replace(",", " ").split()
            if not parts:
                continue
            vals = [float(p) for p in parts]
            rows.append(vals[-3:])
    joints = np.asarray(rows, np.float32)
    if joints.shape != (21, 3):
        raise ValueError(f"{path}: expected 21x3 joints, got "
                         f"{joints.shape}")
    return joints


def world_to_camera(xyz: np.ndarray, rvec: np.ndarray,
                    tvec: np.ndarray) -> np.ndarray:
    """Apply the cv2.solvePnP-convention extrinsics the MHP calibration
    pickles store: X_cam = R(rvec) @ X_world + tvec."""
    theta = float(np.linalg.norm(rvec))
    r = np.zeros(3, np.float32) if theta < 1e-12 else rvec / theta
    K = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]],
                  [-r[1], r[0], 0]], np.float32)
    R = (np.eye(3, dtype=np.float32) + np.sin(theta) * K
         + (1.0 - np.cos(theta)) * (K @ K))
    return xyz @ R.T + tvec.reshape(1, 3)


def project_points(K: np.ndarray, xyz_cam: np.ndarray) -> np.ndarray:
    uv = xyz_cam @ K.T
    return uv[:, :2] / np.maximum(uv[:, 2:3], 1e-8)


def normalize_3d_joints(xyz_cam_m: np.ndarray,
                        ref_len: float = 0.03058954) -> np.ndarray:
    """Bone-4-5 pinning + root-centering on joint 1 (the STB recipe,
    reference load_STB.py:98-110) WITHOUT the x-mirror: MHP frames are
    right hands viewed directly, and CV camera axes already align +x/+y
    with image u/v, so the weak-perspective 2D/3D consistency the loss
    relies on (reference train.py:112-120) holds without flips."""
    l = np.linalg.norm(xyz_cam_m[4] - xyz_cam_m[5])
    out = xyz_cam_m * (ref_len / max(l, 1e-8))
    return out - out[1]


class MHPSequence:
    """One ``data_N`` sequence seen from one webcam: the demo-loader
    protocol (``MHP_eval`` stand-in, reference eval.py:601-634)."""

    def __init__(self, data_dir: str, seq: str, cam: int):
        self.frames_dir = os.path.join(data_dir, "annotated_frames", seq)
        calib = os.path.join(data_dir, "calibrations", seq,
                             f"webcam_{cam}")
        self.rvec = np.asarray(_load_pickle(
            os.path.join(calib, "rvec.pkl")), np.float32).reshape(3)
        self.tvec = np.asarray(_load_pickle(
            os.path.join(calib, "tvec.pkl")), np.float32).reshape(3)
        kpath = os.path.join(calib, "intrinsics.pkl")
        self.K = (np.asarray(_load_pickle(kpath), np.float32)
                  if os.path.exists(kpath) else DEFAULT_K)
        pat = re.compile(rf"^(\d+)_webcam_{cam}\.jpg$")
        self.frames: List[Tuple[str, str]] = []
        for f in sorted(os.listdir(self.frames_dir),
                        key=lambda s: (len(s), s)):
            m = pat.match(f)
            if not m:
                continue
            jt = os.path.join(self.frames_dir,
                              f"{m.group(1)}_joints.txt")
            if os.path.exists(jt):
                self.frames.append((os.path.join(self.frames_dir, f),
                                    jt))

    def seq_len(self) -> int:
        return len(self.frames)

    def get_sample(self, i: int):
        from PIL import Image
        img_path, joints_path = self.frames[i]
        image = np.asarray(Image.open(img_path).convert("RGB"))
        xyz_cam = world_to_camera(read_joints_txt(joints_path),
                                  self.rvec, self.tvec)
        kp_2d = project_points(self.K, xyz_cam)
        kp_3d = normalize_3d_joints(xyz_cam / 1000.0)
        return image, kp_2d.astype(np.float32), kp_3d.astype(np.float32)


def mhp_eval(seq_name: str, opt: Optional[Options] = None,
             data_dir: Optional[str] = None) -> MHPSequence:
    """``MHP_eval('data_15_cam_1')`` stand-in (reference eval.py:605)."""
    m = re.fullmatch(r"(data_\d+)_cam_(\d+)", seq_name)
    if not m:
        raise ValueError(f"MHP sequence name {seq_name!r} is not "
                         "'data_N_cam_M'")
    if data_dir is None:
        opt = opt or Options()
        data_dir = _mhp_root(opt)
    return MHPSequence(data_dir, m.group(1), int(m.group(2)))


def _mhp_root(opt: Options) -> str:
    cand = os.path.join(os.path.dirname(opt.data_dir.rstrip("/")), "MHP")
    return cand if os.path.isdir(cand) else opt.data_dir


class MHPDataset:
    """Batches of (224x224 crop, 105-float label) over every annotated
    (sequence, webcam) pair — the ``get_loader_MHP`` stand-in for the
    stage-2/6 training mixes (reference MultiDataset.py:35,71)."""

    def __init__(self, data_dir: str, batch_size: int = 32,
                 shuffle: bool = True, seed: int = 0,
                 cameras: Tuple[int, ...] = (1, 2, 3, 4)):
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.sequences: List[MHPSequence] = []
        self.index: List[Tuple[int, int]] = []   # (seq idx, frame idx)
        frames_root = os.path.join(data_dir, "annotated_frames")
        seqs = (sorted(os.listdir(frames_root))
                if os.path.isdir(frames_root) else [])
        for seq in seqs:
            if not os.path.isdir(os.path.join(frames_root, seq)):
                continue
            for cam in cameras:
                calib = os.path.join(data_dir, "calibrations", seq,
                                     f"webcam_{cam}")
                if not os.path.isdir(calib):
                    continue
                s = MHPSequence(data_dir, seq, cam)
                if s.seq_len():
                    si = len(self.sequences)
                    self.sequences.append(s)
                    self.index += [(si, i) for i in range(s.seq_len())]

    def __len__(self) -> int:
        from scat_tpu.data.common import num_batches
        return num_batches(len(self.index), self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        from scat_tpu.data.common import epoch_order
        order, _ = epoch_order(self, len(self.index))
        B = self.batch_size
        for b in range(len(self)):
            imgs, j3ds, j2ds = [], [], []
            for oi in order[b * B:(b + 1) * B]:
                si, fi = self.index[oi]
                image, kp_2d, kp_3d = self.sequences[si].get_sample(fi)
                imgs.append(image)
                j2ds.append(kp_2d)
                j3ds.append(kp_3d)
            imgs = jnp.asarray(np.stack(imgs))
            crops, j2d_out = preprocess.fused_crop_pipeline(
                imgs, jnp.asarray(np.stack(j2ds), jnp.float32),
                flip=False)
            label = np.concatenate(
                [np.stack(j3ds).reshape(B, 63),
                 np.asarray(j2d_out).reshape(B, 42)], axis=1)
            yield {"image": crops, "label": jnp.asarray(label),
                   "valid": jnp.ones((B,), jnp.float32)}


def get_loader_MHP(stage: str = "training", bs: int = 32,
                   opt: Optional[Options] = None) -> MHPDataset:
    """Factory matching the commented reference call
    (MultiDataset.py:35,71)."""
    opt = opt or Options()
    return MHPDataset(_mhp_root(opt), bs, shuffle=(stage == "training"),
                      seed=opt.seed)
