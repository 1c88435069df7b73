"""FreiHAND dataset loader (re-derived — the reference imports
``dataset/load_frei_3d.py`` which is MISSING from the public snapshot,
SURVEY.md "Missing modules").

Re-derivation sources:
  * the 166-float label contract consumed by the train loop
    (reference train.py:193-196): ``[3:51]`` pose (48), ``[61:124]`` 3D
    joints (63), ``[124:]`` 2D pixels (42) — so the layout is
    [cam3 | pose48 | shape10 | 3D63 | 2D42];
  * the FreiHAND helpers the reference *does* ship in
    load_test_dataset.py: OpenGL-coords projection with the y/z sign
    flip (project_3D_points :33-53), hardcoded split sizes 65920/11524
    (db_size :55-62), bone-normalized rescale with the 180deg x-axis
    rotation (rescale_3d_joints :91-103), quaternion pose rotation
    (rotate_pose :159-167);
  * the standard public FreiHAND disk layout
    (training/rgb/%08d.jpg, training_K.json, training_xyz.json,
    training_mano.json).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyRotation

from scat_tpu.config import Options

COORD_CHANGE_MAT = np.array([[1., 0., 0.], [0., -1., 0.], [0., 0., -1.]],
                            dtype=np.float32)


def db_size(set_name: str) -> int:
    """reference load_test_dataset.py:55-62."""
    if set_name == "train":
        return 65920
    elif set_name == "evaluation":
        return 11524
    assert 0, "Invalid choice."


def project_3D_points(cam_mat: np.ndarray, pts3D: np.ndarray,
                      is_OpenGL_coords: bool = True) -> np.ndarray:
    """reference load_test_dataset.py:33-53."""
    assert pts3D.shape[-1] == 3 and len(pts3D.shape) == 2
    if is_OpenGL_coords:
        pts3D = pts3D.dot(COORD_CHANGE_MAT.T)
    proj = pts3D.dot(cam_mat.T)
    return np.stack([proj[:, 0] / proj[:, 2], proj[:, 1] / proj[:, 2]],
                    axis=1)


def rescale_3d_joints(joints_3d: np.ndarray,
                      ref_len: float = 0.03058954) -> np.ndarray:
    """reference load_test_dataset.py:91-103: pin bone 4-5, root-center
    on joint 1, rotate 180deg about x (y/z negate)."""
    l = np.linalg.norm(joints_3d[4] - joints_3d[5])
    out = joints_3d * (ref_len / l)
    out = out - out[1]
    return out * np.array([1, -1, -1])


def rotate_pose(pose: np.ndarray) -> np.ndarray:
    """Compose a 180deg x-axis rotation into the global orient
    (reference load_test_dataset.py:159-167)."""
    out = pose.copy()
    r = ScipyRotation.from_rotvec(pose[:3])
    rx = ScipyRotation.from_rotvec([np.pi, 0, 0])
    out[:3] = (rx * r).as_rotvec()
    return out


def rotate_pose_param(pose: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate the global-orient rotvec about z by (360 - angle) degrees
    (reference dataset/rotation.py:83-91, ``rotate_pose_param``).

    The reference routes this through a rotvec->quaternion->rotvec
    roundtrip (rotation.py:61-79); composing the two scipy Rotations
    directly is the same map, since both ends use scipy's canonical
    rotvec branch.  Note the reference *imports* this into
    load_test_dataset.py:20 but never calls it — provided for API-surface
    parity with the rotation augmentation family.
    """
    out = pose.copy()
    rz = ScipyRotation.from_rotvec(
        [0.0, 0.0, np.deg2rad(360.0 - angle_deg)])
    out[:3] = (rz * ScipyRotation.from_rotvec(pose[:3])).as_rotvec()
    return out


def pack_label_166(pose48: np.ndarray, shape10: np.ndarray,
                   joints_3d: np.ndarray, joints_2d: np.ndarray,
                   cam3: Optional[np.ndarray] = None) -> np.ndarray:
    """[cam3 | pose48 | shape10 | 3D63 | 2D42] = 166 floats
    (layout from reference train.py:193-196)."""
    out = np.zeros((166,), np.float32)
    if cam3 is not None:
        out[:3] = cam3
    out[3:51] = pose48
    out[51:61] = shape10
    out[61:124] = joints_3d.reshape(-1)
    out[124:] = joints_2d.reshape(-1)
    return out


class FreiHANDDataset:
    """Batches of (224x224x3 [-1,1] image, 166-float label)."""

    def __init__(self, data_dir: str, split: str = "training",
                 batch_size: int = 32, shuffle: bool = True,
                 seed: int = 0, color_jitter: bool = True,
                 use_native: Optional[bool] = None):
        self.data_dir = data_dir
        self.split = split
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        # ColorJitter(0.5, 0.5, 0.5, 0.1) on the training split
        # (reference load_test_dataset.py:72-79)
        self.color_jitter = color_jitter and split == "training"
        with open(os.path.join(data_dir, f"{split}_K.json")) as f:
            self.K = np.asarray(json.load(f), np.float32)
        with open(os.path.join(data_dir, f"{split}_xyz.json")) as f:
            self.xyz = np.asarray(json.load(f), np.float32)
        mano_path = os.path.join(data_dir, f"{split}_mano.json")
        if os.path.exists(mano_path):
            with open(mano_path) as f:
                self.mano = np.asarray(json.load(f), np.float32)
        else:
            self.mano = None
        self.rgb_dir = os.path.join(data_dir, split, "rgb")
        n_images = len([f for f in os.listdir(self.rgb_dir)
                        if f.endswith((".jpg", ".png"))])
        # greenscreen/versioned copies reuse the unique label set
        self.n_unique = self.xyz.shape[0]
        self.n_images = n_images
        # native C++ decode fast path: the real FreiHAND ships 224x224
        # crops, where the warp is an exact identity — the threaded
        # libjpeg pool replaces serial per-image PIL decodes in the
        # prefetch thread.  Trees with other frame sizes keep the
        # PIL+BILINEAR path (torchvision Resize parity; the native
        # warp zero-fills borders where PIL's resize clamps).
        if use_native is None:
            from scat_tpu.data import native_loader
            use_native = native_loader.available()
        self.use_native = use_native and self._frames_are_224()
        self._warned_native_fallback = False

    def _frames_are_224(self) -> bool:
        if self.n_images == 0:
            return False
        from PIL import Image
        try:
            with Image.open(self._image_path(0)) as im:
                return im.size == (224, 224)
        except OSError:
            return False

    def _image_path(self, index: int) -> str:
        path = os.path.join(self.rgb_dir, f"{index:08d}.jpg")
        if not os.path.exists(path):
            path = os.path.join(self.rgb_dir, f"{index:08d}.png")
        return path

    def __len__(self) -> int:
        from scat_tpu.data.common import num_batches
        return num_batches(self.n_images, self.batch_size)

    def sample_labels(self, index: int):
        uid = index % self.n_unique
        K = self.K[uid]
        xyz = self.xyz[uid]
        joints_2d = project_3D_points(K, xyz, is_OpenGL_coords=False)
        joints_3d = rescale_3d_joints(xyz.copy())
        if self.mano is not None:
            mano = self.mano[uid].reshape(-1)
            pose = rotate_pose(mano[:48].copy())
            shape = mano[48:58] if mano.shape[0] >= 58 else np.zeros(10)
        else:
            pose = np.zeros(48, np.float32)
            shape = np.zeros(10, np.float32)
        return pack_label_166(pose, shape, joints_3d, joints_2d)

    def _load_image_scaled(self, index: int):
        """(image 224x224, sx, sy) — the resize factors must also apply
        to the 2D pixel labels or image and targets silently disagree."""
        from PIL import Image
        img = Image.open(self._image_path(index)).convert("RGB")
        sx = sy = 1.0
        if img.size != (224, 224):
            # torchvision Resize default interpolation is BILINEAR
            # (reference load_test_dataset.py transform); PIL's own
            # default is BICUBIC, so pin the filter explicitly
            sx, sy = 224.0 / img.size[0], 224.0 / img.size[1]
            img = img.resize((224, 224), Image.BILINEAR)
        return np.asarray(img), sx, sy

    def _load_image(self, index: int) -> np.ndarray:
        return self._load_image_scaled(index)[0]

    @staticmethod
    def _rescale_2d_labels(labels: np.ndarray, n: int,
                           sx: float, sy: float) -> None:
        """Apply the image-resize factors to row ``n``'s 2D pixel
        targets (the [124:166] slice of the 166-wide layout) in place —
        one definition for both the native-fallback and PIL branches."""
        if sx != 1.0 or sy != 1.0:
            j2 = labels[n, 124:166].reshape(21, 2)
            labels[n, 124:166] = (j2 * (sx, sy)).reshape(42)

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        from scat_tpu.data.common import EPOCH_STRIDE, epoch_order
        from scat_tpu.data.preprocess import color_jitter_np
        order, epoch = epoch_order(self, self.n_images)
        B = self.batch_size
        # ALL pixel work stays numpy: this loop runs in the prefetch
        # thread, and eager jnp dispatch here (tiny ops + implicit
        # syncs) would contend with the training step on device (same
        # xp=np rule as stb.py's affine math)
        # +1 decorrelates the jitter stream from epoch_order's shuffle
        # stream (same offset convention as stb.py's augmentation rng)
        jitter_rng = np.random.RandomState(
            (self.seed + 1 + EPOCH_STRIDE * epoch) % (2 ** 31))
        identity = np.tile(
            np.asarray([1, 0, 0, 0, 1, 0], np.float32), (B, 1))
        for b in range(len(self)):
            idxs = order[b * B:(b + 1) * B]
            labels = np.stack([self.sample_labels(i) for i in idxs])
            if self.use_native:
                # threaded libjpeg decode + identity warp + normalize
                # in the C++ pool (byte-exact vs the PIL path at this
                # frame size: 2/255 == 1/127.5, integer sample points);
                # a failed decode comes back valid=0 instead of raising
                from scat_tpu.data import native_loader
                images, valid = native_loader.load_batch(
                    [self._image_path(i) for i in idxs], 224, 224,
                    identity)
                # The 224-gate probes only frame 0: a mixed tree (e.g.
                # greenscreen copies at another size) would otherwise
                # silently LOSE every non-224 frame to valid=0 here.
                # Re-decode native rejects through the PIL+resize path
                # (with the 2D-label rescale); only frames PIL also
                # can't read stay masked out.
                for n in np.flatnonzero(valid == 0):
                    try:
                        im, sx, sy = self._load_image_scaled(idxs[n])
                    except OSError:
                        continue
                    self._rescale_2d_labels(labels, n, sx, sy)
                    images[n] = im.astype(np.float32) / 127.5 - 1.0
                    valid[n] = 1.0
                    if not self._warned_native_fallback:
                        self._warned_native_fallback = True
                        print("[FreiHAND] native decode rejected "
                              f"{self._image_path(idxs[n])} (size or "
                              "format); using the PIL path for such "
                              "frames this run")
            else:
                loaded = [self._load_image_scaled(i) for i in idxs]
                imgs = np.stack([im for im, _, _ in loaded])
                for n, (_, sx, sy) in enumerate(loaded):
                    self._rescale_2d_labels(labels, n, sx, sy)
                images = imgs.astype(np.float32) / 127.5 - 1.0
                valid = np.ones((B,), np.float32)
            if self.color_jitter:
                images = color_jitter_np(jitter_rng, images)
            yield {"image": jnp.asarray(images),
                   "label": jnp.asarray(labels),
                   "valid": jnp.asarray(valid)}


def get_loader_frei(stage: str = "training", bs: int = 32,
                    opt: Optional[Options] = None, *,
                    shuffle: Optional[bool] = None,
                    color_jitter: Optional[bool] = None) -> FreiHANDDataset:
    """Factory matching the missing module's surface (eval.py:37).

    NOTE: the reference evaluates FreiHAND with ``stage='training'``
    (eval.py:793) — i.e. on the training split, because the public
    evaluation split ships without xyz labels.  Non-training stages here
    use the ``evaluation`` split when its label files exist on disk and
    fall back to the (reference-matching) training split otherwise.

    ``shuffle``/``color_jitter`` default from ``stage``; evaluation
    callers that must read the *training split* (the reference quirk
    above) pass both as False explicitly — eval batches must be
    deterministic and un-augmented even when they come from the
    training images (reference eval DataLoader: shuffle=False, plain
    transform — eval.py:796, load_test_dataset.py:81-89).
    """
    opt = opt or Options()
    data_dir = os.path.join(os.path.dirname(opt.data_dir.rstrip("/")),
                            "FreiHAND")
    if not os.path.isdir(data_dir):
        data_dir = opt.data_dir
    split = "training"
    if stage != "training" and os.path.exists(
            os.path.join(data_dir, "evaluation_xyz.json")):
        split = "evaluation"
    if shuffle is None:
        shuffle = stage == "training"
    if color_jitter is None:
        color_jitter = stage == "training"
    return FreiHANDDataset(data_dir, split, bs, shuffle=shuffle,
                           seed=opt.seed, color_jitter=color_jitter)


def get_loader_frei_eval(opt: Optional[Options] = None) -> FreiHANDDataset:
    opt = opt or Options()
    return get_loader_frei("val", opt.batch_size, opt)
