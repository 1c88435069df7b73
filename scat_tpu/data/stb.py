"""STB (Stereo Hand Tracking Benchmark) dataset.

Reference dataset/load_STB.py.  The reference reads annotation pickles
and SK_color frames from an Alibaba OSS bucket that ships as ``None``
with a "user must specify local path" TODO (load_STB.py:205-207, note at
:3-6); this loader reads the same layout from a local directory:

    {data_dir}/B2Counting/SK_color_0.png ...
    {data_dir}/labels/B2Counting_SK.pkl  (dict with "handPara" [3,21,N])

Label math (identical formulas, all host-side numpy here, tested against
them; the per-image pixel work is done on device by
scat_tpu.data.preprocess.fused_crop_pipeline):
  depth->color transform (load_STB.py:299-305), STB->Snap joint reorder
  (:149), mm->m (:234), palm->wrist root fix (:307-312), Simple->SMPLX
  reorder (:35,255), pinhole 2D projection (:257-258), bone-normalized
  3D rescale+flip (:98-110), left->right hand flip (:69-74), 1.3x
  square crop -> 224 (:76-96).  Label layout: 63 + 42 = 105 floats
  (:286-289).
"""

from __future__ import annotations

import math
import os
import pickle
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu.config import Options
from scat_tpu.data import preprocess
from scat_tpu.ops.heatmap import draw_gaussian_heatmaps

# Simple(Snap) -> SMPLX joint order (reference load_STB.py:35)
jointsMapSimpleToSMPLX = [0, 5, 6, 7, 9, 10, 11, 17, 18, 19, 13, 14, 15,
                          1, 2, 3, 8, 12, 20, 16, 4]
# SMPLX -> MANO (reference load_STB.py:36)
jointsMapSMPLXToMano = [0, 1, 2, 3, 16, 4, 5, 6, 17, 7, 8, 9, 18, 10, 11,
                        12, 19, 13, 14, 15, 20]

# SK color-camera intrinsics (reference load_STB.py:43-46)
SK_FX_COLOR, SK_FY_COLOR = 607.92271, 607.88192
SK_TX_COLOR, SK_TY_COLOR = 314.78337, 236.42484
COLOR_K = np.array([[SK_FX_COLOR, 0, SK_TX_COLOR],
                    [0, SK_FY_COLOR, SK_TY_COLOR],
                    [0, 0, 1]], dtype=np.float64)

SK_ROT_VEC = [0.00531, -0.01196, 0.00301]
SK_TRANS_VEC = [-24.0381, -0.4563, -1.2326]  # mm (load_STB.py:129-130)

STB_JOINTS = ["loc_bn_palm_L"] + [
    f"loc_bn_{f}_L_0{i}" for f in
    ("pinky", "ring", "mid", "index", "thumb") for i in range(1, 5)]
SNAP_JOINTS = ["loc_bn_palm_L"] + [
    f"loc_bn_{f}_L_0{i}" for f in
    ("thumb", "index", "mid", "ring", "pinky") for i in range(1, 5)]
_snap_id = {n: i for i, n in enumerate(SNAP_JOINTS)}
STB_TO_SNAP_ID = [_snap_id[n] for n in STB_JOINTS]

DATASETS = {
    "STB_train": {
        "image_list": ["B2Counting", "B2Random", "B3Counting", "B3Random",
                       "B4Counting", "B4Random", "B5Counting", "B5Random",
                       "B6Counting", "B6Random"],
        "image_prefix": "SK_color",
    },
    "STB_eval": {
        "image_list": ["B1Counting", "B1Random"],
        "image_prefix": "SK_color",
    },
}


def sk_rot_mx(rot_vec) -> np.ndarray:
    """Rodrigues with the reference's quaternion convention
    (load_STB.py:112-126 — note the NEGATED vector part, giving the
    transpose of the usual rotation)."""
    theta = np.linalg.norm(rot_vec)
    vector = np.asarray(rot_vec) * math.sin(theta / 2.0) / theta
    a = math.cos(theta / 2.0)
    b, c, d = -vector
    return np.array([
        [a*a + b*b - c*c - d*d, 2*(b*c + a*d), 2*(b*d - a*c)],
        [2*(b*c - a*d), a*a + c*c - b*b - d*d, 2*(c*d + a*b)],
        [2*(b*d + a*c), 2*(c*d - a*b), a*a + d*d - b*b - c*c]])


SK_ROT = sk_rot_mx(SK_ROT_VEC)


def sk_xyz_depth2color(depth_xyz: np.ndarray, trans_vec=SK_TRANS_VEC,
                       rot_mx=SK_ROT) -> np.ndarray:
    """(depth-cam xyz - t) @ R (reference load_STB.py:299-305)."""
    return (depth_xyz - np.asarray(trans_vec)) @ rot_mx


def palm2wrist(pose_xyz: np.ndarray) -> np.ndarray:
    """Move the root from palm center to wrist: root = ring1 +
    2*(root - ring1) (reference load_STB.py:307-312)."""
    root_id = _snap_id["loc_bn_palm_L"]
    ring_id = _snap_id["loc_bn_ring_L_01"]
    out = pose_xyz.copy()
    out[:, root_id] = (pose_xyz[:, ring_id]
                       + 2.0 * (pose_xyz[:, root_id]
                                - pose_xyz[:, ring_id]))
    return out


def load_stb_labels(ann_file: str) -> np.ndarray:
    """One sequence's annotation pickle -> [N,21,3] meters, SMPLX order
    pipeline inputs (Snap order here; the per-sample SMPLX reorder
    happens in make_sample like reference load_STB.py:255)."""
    with open(ann_file, "rb") as f:
        mat_gt = pickle.load(f, encoding="latin1")
    curr = np.asarray(mat_gt["handPara"]).transpose(2, 1, 0)  # N x 21 x 3
    curr = sk_xyz_depth2color(curr)
    curr = curr[:, STB_TO_SNAP_ID, :] / 1000.0
    return palm2wrist(curr)


def project_color(joints_3d: np.ndarray) -> np.ndarray:
    """ops.geometry.project_points_pinhole with the STB color-camera K,
    on host arrays (the loader's per-sample label path)."""
    from scat_tpu.ops.geometry import project_points_pinhole
    return project_points_pinhole(joints_3d, np.asarray(COLOR_K),
                                  xp=np)


def rescale_3d_joints_flip_np(joints_3d: np.ndarray,
                              ref_len: float = 0.03058954) -> np.ndarray:
    """reference load_STB.py:98-110 — the shared implementation in
    ops.geometry, run with numpy on the host (no per-sample jnp
    dispatch; one bone-length constant)."""
    from scat_tpu.ops.geometry import rescale_3d_joints_flip
    return rescale_3d_joints_flip(joints_3d, ref_len, xp=np)


class STBDataset:
    """Local-filesystem STB loader with the reference's sample contract:
    batches of (224x224x3 [-1,1] image, 105-float label)."""

    def __init__(self, name: str = "STB_train",
                 data_dir: str = "./STB/",
                 batch_size: int = 32,
                 rotation: bool = False, motion_blur: bool = False,
                 use_heatmap: bool = False, shuffle: bool = True,
                 seed: int = 0, opt: Optional[Options] = None,
                 use_native: Optional[bool] = None):
        # native C++ decode+warp fast path (native/scat_native.cpp):
        # rotation composes into the warp affine and motion blur runs as
        # a native pre-warp box filter, so the augmented configs
        # (reference load_STB.py:266-272) ride the fast path too.
        if use_native is None:
            from scat_tpu.data import native_loader
            use_native = native_loader.available()
        self.use_native = use_native
        self.data_dir = data_dir
        self.batch_size = batch_size
        self.rotation = rotation
        self.motion_blur = motion_blur
        self.use_heatmap = use_heatmap
        self.shuffle = shuffle
        self.seed = seed
        attrs = DATASETS[name]
        ann_dir = os.path.join(data_dir, "labels")
        self.image_paths: List[str] = []
        pose_gts = []
        for image_dir in attrs["image_list"]:
            ann_file = os.path.join(
                ann_dir, image_dir + "_"
                + attrs["image_prefix"][:2] + ".pkl")
            if not os.path.exists(ann_file):
                continue
            curr = load_stb_labels(ann_file)
            pose_gts.append(curr)
            for i in range(curr.shape[0]):
                self.image_paths.append(os.path.join(
                    data_dir, image_dir,
                    f"{attrs['image_prefix']}_{i}.png"))
        self.pose_gts = (np.concatenate(pose_gts, 0).astype(np.float32)
                         if pose_gts else np.zeros((0, 21, 3), np.float32))

    def __len__(self) -> int:
        from scat_tpu.data.common import num_batches
        return num_batches(len(self.image_paths), self.batch_size)

    def _load_image(self, path: str) -> np.ndarray:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))

    def sample_labels(self, index: int):
        """Per-sample label math before the on-device pixel work."""
        joints_3d = self.pose_gts[index][jointsMapSimpleToSMPLX]
        joints_2d = project_color(joints_3d.astype(np.float64))
        joints_3d = rescale_3d_joints_flip_np(joints_3d.astype(np.float64))
        return joints_3d.astype(np.float32), joints_2d.astype(np.float32)

    def _native_batch(self, idxs, rng: np.random.RandomState
                      ) -> Dict[str, jax.Array]:
        """C++ fast path: host computes the flip(+rotation)+crop affine
        from the labels, native pool decodes + (blurs +) warps +
        normalizes.  Augmentation draws follow the same rng stream and
        order as the device path (angle, then blur use/ksize/axis) so a
        seed yields identical augmentation parameters either way."""
        from scat_tpu.data import native_loader, preprocess
        B = len(idxs)
        W, H = 640, 480  # STB SK_color frame size (load_STB.py:150)
        j3d = np.zeros((B, 21, 3), np.float32)
        j2d = np.zeros((B, 21, 2), np.float32)
        for n, i in enumerate(idxs):
            j3d[n], j2d[n] = self.sample_labels(i)
        angle = (rng.randint(1, 361, size=(B,)).astype(np.float32)
                 if self.rotation else None)
        blur_ksize = blur_axis = None
        if self.motion_blur:
            # same per-sample draws as maybe_motion_blur (1-in-6,
            # ksize 1..10, vertical/horizontal)
            use = rng.randint(0, 6, size=B) == 1
            ksize = rng.randint(1, 11, size=B)
            blur_axis = rng.randint(0, 2, size=B)
            blur_ksize = np.where(use, ksize, 0).astype(np.int32)
        # pure-numpy affine math: this runs in the prefetch thread, and
        # jnp here would dispatch tiny device ops + a D2H sync per batch
        # that contend with the training step (xp=np, same formulas)
        Mf = preprocess.flip_affine(np.full((B,), float(W)), xp=np)
        ones = np.ones((B, 21, 1), np.float32)
        M = Mf
        crop_w, crop_h = W, H
        if angle is not None:
            # canvas-expansion rotation folded into the warp affine —
            # same composition as fused_crop_pipeline's jnp path
            R, nW, nH = preprocess.rotate_affine_expand(angle, W, H,
                                                        xp=np)
            M = preprocess.affine_compose(R, Mf, xp=np)
            crop_w, crop_h = nW, nH
        joints = np.einsum("bij,bnj->bni", M,
                           np.concatenate([j2d, ones], -1))
        Mc, j2d_out = preprocess.crop_hand_affine(
            joints, crop_w, crop_h, 224, xp=np)
        M = preprocess.affine_compose(Mc, M, xp=np)
        Minv = np.ascontiguousarray(
            preprocess.affine_invert(M, xp=np).astype(np.float32))
        if angle is not None:
            # rotate the 3D labels like the device path (stb jnp path /
            # reference rotation.py:36-45), host-side numpy
            from scat_tpu.ops.geometry import (rotate_joints_3d,
                                               rotation_matrix_2d)
            Mrot = rotation_matrix_2d(angle, np.zeros((B, 2), np.float32),
                                      xp=np)
            j3d = rotate_joints_3d(j3d, Mrot, xp=np).astype(np.float32)
        paths = [self.image_paths[i] for i in idxs]
        imgs, valid = native_loader.load_batch(
            paths, H, W, Minv, blur_ksize=blur_ksize,
            blur_axis=blur_axis)
        label = jnp.concatenate(
            [jnp.asarray(j3d).reshape(B, 63),
             jnp.asarray(j2d_out).reshape(B, 42)], axis=1)
        batch = {"image": jnp.asarray(imgs), "label": label,
                 "valid": jnp.asarray(valid)}
        if self.use_heatmap:
            batch["heatmap"] = draw_gaussian_heatmaps(
                j2d_out / 4.0, 56, 56, radius=8)
        return batch

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        # per-epoch reshuffle (torch DataLoader(shuffle=True) semantics):
        # each pass over the dataset uses a fresh permutation and fresh
        # augmentation draws.
        from scat_tpu.data.common import EPOCH_STRIDE, epoch_order
        order, epoch = epoch_order(self, len(self.image_paths))
        rng = np.random.RandomState(self.seed + 1 + EPOCH_STRIDE * epoch)
        B = self.batch_size
        for b in range(len(self)):
            idxs = order[b * B:(b + 1) * B]
            if self.use_native:
                yield self._native_batch(idxs, rng)
                continue
            imgs = np.stack([self._load_image(self.image_paths[i])
                             for i in idxs])
            j3d = np.zeros((B, 21, 3), np.float32)
            j2d = np.zeros((B, 21, 2), np.float32)
            for n, i in enumerate(idxs):
                j3d[n], j2d[n] = self.sample_labels(i)
            angle = (jnp.asarray(rng.randint(1, 361, size=(B,)),
                                 jnp.float32) if self.rotation else None)
            images_j = jnp.asarray(imgs)
            if self.motion_blur:
                images_j = maybe_motion_blur(images_j, rng)
            crops, j2d_out = preprocess.fused_crop_pipeline(
                images_j, jnp.asarray(j2d), flip=True, angle_deg=angle)
            if angle is not None:
                from scat_tpu.ops.geometry import (rotate_joints_3d,
                                                   rotation_matrix_2d)
                M = rotation_matrix_2d(
                    angle, jnp.zeros((B, 2), jnp.float32))
                j3d = np.asarray(rotate_joints_3d(jnp.asarray(j3d), M))
            label = jnp.concatenate(
                [jnp.asarray(j3d).reshape(B, 63),
                 j2d_out.reshape(B, 42)], axis=1)
            batch = {"image": crops, "label": label,
                     "valid": jnp.ones((B,), jnp.float32)}
            if self.use_heatmap:
                batch["heatmap"] = draw_gaussian_heatmaps(
                    j2d_out / 4.0, 56, 56, radius=8)
            yield batch


def maybe_motion_blur(images: jax.Array, rng: np.random.RandomState
                      ) -> jax.Array:
    """Per-SAMPLE 1-in-6 motion blur with a random-length axis kernel
    (reference load_STB.py:154-187 and the per-sample draw at :266-268:
    each sample independently rolls use_blur, kernel size 1..10 and
    vertical/horizontal).

    Cost-aware static formulation: the ~B/6 selected samples are
    gathered into a FIXED-size slot array (size ~B/3, index 0 padding —
    static shapes, so the eager jnp ops hit one compiled shape per
    batch size), each slot's centered box kernel is embedded into an
    11-tap offset window (offsets -5..5, anchor ``ksize//2`` —
    cv2.filter2D's convention), both axis blurs run as shifted adds on
    the subset only, and the results scatter back.  Borders are
    REFLECT_101 like cv2.filter2D's default.  The slot count covers
    >5 sigma of Binomial(B, 1/6), so truncation is essentially never."""
    B = images.shape[0]
    use = rng.randint(0, 6, size=B) == 1
    ksize = rng.randint(1, 11, size=B)
    axis = rng.randint(0, 2, size=B)  # 0 vertical, 1 horizontal
    if not use.any():
        return images
    n_slots = min(B, B // 3 + 2)
    sel = np.nonzero(use)[0][:n_slots]
    slots = np.full((n_slots,), sel[0], np.int32)
    slots[: len(sel)] = sel

    offs = np.arange(-5, 6)
    anchor = ksize[slots] // 2
    inside = ((offs[None] >= -anchor[:, None])
              & (offs[None] <= (ksize[slots] - 1 - anchor)[:, None]))
    w = jnp.asarray(inside.astype(np.float32)
                    / ksize[slots][:, None].astype(np.float32))
    x = images.astype(jnp.float32)
    sub = jnp.take(x, jnp.asarray(slots), axis=0)
    h, wd = x.shape[1], x.shape[2]
    pad_v = jnp.pad(sub, ((0, 0), (5, 5), (0, 0), (0, 0)),
                    mode="reflect")
    pad_h = jnp.pad(sub, ((0, 0), (0, 0), (5, 5), (0, 0)),
                    mode="reflect")
    vblur = sum(w[:, i, None, None, None] * pad_v[:, i:i + h]
                for i in range(11))
    hblur = sum(w[:, i, None, None, None] * pad_h[:, :, i:i + wd]
                for i in range(11))
    # The reference kernels place the 1-D box at column/row
    # int((ks-1)/2) of a ks x ks kernel while cv2.filter2D anchors at
    # ks//2 (load_STB.py:162-169): for EVEN ks the correlation also
    # samples the PERPENDICULAR axis at offset -1, translating the
    # image one pixel (right for the vertical kernel, down for the
    # horizontal one).  Verified against the literal motion_blur in
    # tests/test_literal_data_utils.py.
    even = jnp.asarray((ksize[slots] % 2 == 0)[:, None, None, None])
    vshift = jnp.pad(vblur, ((0, 0), (0, 0), (1, 0), (0, 0)),
                     mode="reflect")[:, :, :wd]
    hshift = jnp.pad(hblur, ((0, 0), (1, 0), (0, 0), (0, 0)),
                     mode="reflect")[:, :h]
    vblur = jnp.where(even, vshift, vblur)
    hblur = jnp.where(even, hshift, hblur)
    blurred = jnp.where(jnp.asarray(axis[slots] == 0)[:, None, None,
                                                      None],
                        vblur, hblur)
    # duplicate padding slots all carry sel[0]'s params -> identical
    # values, so the scatter is deterministic
    return x.at[jnp.asarray(slots)].set(blurred)


def get_loader_STB(stage: str = "training", bs: int = 128,
                   opt: Optional[Options] = None) -> STBDataset:
    """reference load_STB.py:344-353."""
    assert stage in ("training", "val", "test")
    opt = opt or Options()
    return STBDataset("STB_train", data_dir=opt.data_dir, batch_size=bs,
                      rotation=opt.rotation, motion_blur=opt.motion_blur,
                      use_heatmap=opt.use_heatmap, shuffle=True,
                      seed=opt.seed, opt=opt)


def get_loader_STB_eval(opt: Optional[Options] = None) -> STBDataset:
    """reference load_STB.py:355-363."""
    from scat_tpu.data.common import local_batch_size
    opt = opt or Options()
    return STBDataset("STB_eval", data_dir=opt.data_dir,
                      batch_size=local_batch_size(opt.batch_size),
                      rotation=False,
                      motion_blur=False, use_heatmap=False, shuffle=False,
                      seed=opt.seed, opt=opt)
