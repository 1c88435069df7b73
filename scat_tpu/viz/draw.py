"""Visualization: skeleton plots, debug grids, feature/attention dumps,
video export.

Reference data_utils/draw_3d_joints.py (plot_2d_hand :38-..., per-finger
bone colors eval.py:62-67, debug grid debug_pred_gt :215-236, heatmap
overlay vis_heatmap :242-286), eval.py feature-map tiles (:519-536),
attention-line rendering (:864-944), and generate_video (:72-86).
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

# Per-finger joint colors (reference eval.py:62-67)
color_hand_joints = [[1.0, 0.0, 0.0],
                     [0.0, 0.4, 0.0], [0.0, 0.6, 0.0], [0.0, 0.8, 0.0],
                     [0.0, 1.0, 0.0],   # thumb
                     [0.0, 0.0, 0.6], [0.0, 0.0, 1.0], [0.2, 0.2, 1.0],
                     [0.4, 0.4, 1.0],   # index
                     [0.0, 0.4, 0.4], [0.0, 0.6, 0.6], [0.0, 0.8, 0.8],
                     [0.0, 1.0, 1.0],   # middle
                     [0.4, 0.4, 0.0], [0.6, 0.6, 0.0], [0.8, 0.8, 0.0],
                     [1.0, 1.0, 0.0],   # ring
                     [0.4, 0.0, 0.4], [0.6, 0.0, 0.6], [0.8, 0.0, 0.8],
                     [1.0, 0.0, 1.0]]   # little

# SMPLX -> Simple skeleton order (reference draw_3d_joints.py:8-13,
# eval.py:50-61)
jointsMapSMPLXToSimple = [0, 13, 14, 15, 20, 1, 2, 3, 16, 4, 5, 6, 17,
                          10, 11, 12, 19, 7, 8, 9, 18]


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


BONES = [(0, 1), (1, 2), (2, 3), (3, 4),
         (0, 5), (5, 6), (6, 7), (7, 8),
         (0, 9), (9, 10), (10, 11), (11, 12),
         (0, 13), (13, 14), (14, 15), (15, 16),
         (0, 17), (17, 18), (18, 19), (19, 20)]


def plot_2d_hand(axis, coords_hw, vis=None, color_fixed=None,
                 linewidth="1", order="hw", draw_kp=True,
                 draw_idx=False):
    """reference eval.py:163-216.

    ``draw_idx`` overlays the joint index at each keypoint — the
    reference ships that line commented out (draw_3d_joints.py:96), so
    it defaults off for pixel parity (test_literal_viz.py) and stays
    available for debugging."""
    if order == "uv":
        coords_hw = coords_hw[:, ::-1]
    colors = np.array(color_hand_joints)
    if vis is None:
        vis = np.ones_like(coords_hw[:, 0]) == 1.0
    for (a, b) in BONES:
        if not (vis[a] and vis[b]):
            continue
        coords = np.stack([coords_hw[a], coords_hw[b]])
        color = colors[b] if color_fixed is None else color_fixed
        axis.plot(coords[:, 1], coords[:, 0], color=color,
                  linewidth=linewidth)
    if not draw_kp:
        return
    for i in range(21):
        if vis[i] > 0.5:
            axis.plot(coords_hw[i, 1], coords_hw[i, 0], "o",
                      color=colors[i])
            if draw_idx:
                axis.text(coords_hw[i, 1], coords_hw[i, 0], f"{i}",
                          fontsize=5, color="white")


def plot_3d_hand(ax, pose_cam_xyz):
    """reference eval.py:218-252."""
    assert pose_cam_xyz.shape[0] == 21
    for j in range(21):
        ax.plot(pose_cam_xyz[j:j + 1, 0], pose_cam_xyz[j:j + 1, 1],
                pose_cam_xyz[j:j + 1, 2], ".",
                c=color_hand_joints[j], markersize=15)
        if j == 0:
            continue
        elif j % 4 == 1:
            ax.plot(pose_cam_xyz[[0, j], 0], pose_cam_xyz[[0, j], 1],
                    pose_cam_xyz[[0, j], 2],
                    color=color_hand_joints[j], linewidth=2)
        else:
            ax.plot(pose_cam_xyz[[j - 1, j], 0],
                    pose_cam_xyz[[j - 1, j], 1],
                    pose_cam_xyz[[j - 1, j], 2],
                    color=color_hand_joints[j], linewidth=2)
    ax.axis("auto")
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")


def unnormalize_image(img_float: np.ndarray) -> np.ndarray:
    """[-1,1] -> uint8 (reference train.py:215)."""
    return np.clip(img_float * 127.5 + 127.5, 0, 255).astype(np.uint8)


def debug_pred_gt(image, gt_joints_2d, gt_joints_3d, pred_joints_2d,
                  pred_joints_3d, name, out_dir="debug_img"):
    """2x2 GT/pred debug grid saved every N steps
    (reference draw_3d_joints.py:215-236)."""
    plt = _plt()
    os.makedirs(out_dir, exist_ok=True)
    fig = plt.figure()
    ax1 = fig.add_subplot(221)
    ax2 = fig.add_subplot(222)
    ax3 = fig.add_subplot(223, projection="3d")
    ax4 = fig.add_subplot(224, projection="3d")
    if image is not None:
        ax1.imshow(image)
        ax2.imshow(image)
    remap = jointsMapSMPLXToSimple
    plot_2d_hand(ax1, gt_joints_2d[remap], order="uv")
    ax1.set_xlabel("ground truth 2d joints", fontsize=10)
    plot_2d_hand(ax2, pred_joints_2d[remap], order="uv")
    ax2.set_xlabel("predict 2d joints", fontsize=10)
    plot_3d_hand(ax3, gt_joints_3d[remap])
    ax3.set_xlabel("ground truth 3d joints", fontsize=10)
    plot_3d_hand(ax4, pred_joints_3d[remap])
    ax4.set_xlabel("predict 3d joints", fontsize=10)
    path = os.path.join(out_dir, f"debug_gt_pred_{name}.png")
    print(f"saving debug image: debug_gt_pred_{name}.png ...")
    fig.savefig(path)
    plt.close("all")
    return path


def feature_map_tiles(feat_visual_nhwc: np.ndarray, out_size: int = 224
                      ) -> np.ndarray:
    """21-channel conv map -> horizontally concatenated grayscale tiles
    (reference eval.py:519-536,651-665).  Input [H,W,21] -> uint8
    [out, out*21]."""
    import cv2
    h, w, c = feat_visual_nhwc.shape
    tiles = []
    for i in range(c):
        m = feat_visual_nhwc[:, :, i]
        rng_ = m.max() - m.min()
        m = (m - m.min()) / (rng_ if rng_ > 0 else 1.0)
        tile = cv2.resize((m * 255).astype(np.uint8),
                          (out_size, out_size))
        tiles.append(tile)
    return np.hstack(tiles)


FINGER_QUERIES = {"index": 1, "thumb": 20, "middle": 5, "ring": 10,
                  "little": 18}
FINGER_COLORS = {"index": (0, 255, 0), "thumb": (189, 183, 107),
                 "middle": (218, 112, 214), "ring": (0, 0, 205),
                 "little": (135, 206, 235)}


def draw_attention_map(attn_row: np.ndarray, gt_lmk: np.ndarray,
                       query_idx: int, color, scale: int = 6
                       ) -> np.ndarray:
    """Render one attention row as weighted lines between landmarks,
    thresholded at the 6th-smallest weight (reference eval.py:864-944)."""
    import cv2
    img_out = np.zeros((224 * scale, 224 * scale, 3), np.uint8)
    attn_sort = np.sort(attn_row)
    start = gt_lmk[query_idx]
    for idx, item in enumerate(gt_lmk):
        pt = (int(item[0] * scale), int(item[1] * scale))
        if idx != query_idx:
            cv2.circle(img_out, pt, 5, [255, 255, 255], -1)
        else:
            cv2.circle(img_out, pt, 20, [220, 20, 60], -1)
        if idx != query_idx and attn_row[idx] - attn_sort[5] > 0:
            denom = attn_sort[-1] - attn_sort[5]
            wgt = int(max(attn_row[idx] - attn_sort[5], 0) / denom * 10)
            if wgt > 0:
                cv2.line(img_out,
                         (int(start[0] * scale), int(start[1] * scale)),
                         pt, color, wgt, lineType=4)
    return img_out


def save_attention_maps(attn: np.ndarray, gt_lmk: np.ndarray,
                        result_folder: str, frame_idx: int):
    """Per-finger attention dumps under attn/{finger}/ (eval.py:864-944).

    ``attn`` [H, N, N] (head 0 is used, like the reference's
    ``attn[1, 0, q]`` sample selection); ``gt_lmk`` [21, 2] pixels."""
    import cv2
    for finger, q in FINGER_QUERIES.items():
        d = os.path.join(result_folder, "attn", finger)
        os.makedirs(d, exist_ok=True)
        img = draw_attention_map(attn[0, q], gt_lmk, q,
                                 FINGER_COLORS[finger])
        cv2.imwrite(os.path.join(d, f"{frame_idx:03d}.png"), img)


def vis_heatmap(img_float: np.ndarray, heatmap: np.ndarray,
                pred_ht: np.ndarray, out_path: str):
    """GT-vs-pred heatmap overlays (reference draw_3d_joints.py:242-286)."""
    import cv2
    from scat_tpu.ops.heatmap import heatmap_to_coords
    import jax.numpy as jnp
    img = unnormalize_image(img_float)
    img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    rows = []
    for i in range(heatmap.shape[0]):
        pair = []
        for hm in (heatmap[i], pred_ht[i]):
            coord = np.asarray(heatmap_to_coords(
                jnp.asarray(hm)[None]))[0]
            h = np.maximum(hm, 0)
            h = h / (h.max() if h.max() > 0 else 1.0)
            h = np.uint8(255 * h)
            h = cv2.applyColorMap(h, cv2.COLORMAP_JET)
            h = cv2.resize(h, (224, 224))
            over = h * 0.2 + img
            cv2.circle(over, (int(coord[0]) * 4, int(coord[1]) * 4), 2,
                       (0, 0, 0), thickness=-1)
            pair.append(over)
        rows.append(np.hstack(pair))
    out = np.vstack(rows)
    cv2.imwrite(out_path, out)
    return out


def generate_video(pth: str, out_pth: str, fps: int = 30):
    """PNG dir -> DIVX .avi (reference eval.py:72-86)."""
    import cv2
    files = sorted(glob.glob(f"{pth}/*.png"))
    if not files:
        return None
    first = cv2.imread(files[0])
    h, w = first.shape[:2]
    out = cv2.VideoWriter(f"{out_pth}/result.avi",
                          cv2.VideoWriter_fourcc(*"DIVX"), fps, (w, h))
    for f in files:
        out.write(cv2.imread(f))
    out.release()
    return f"{out_pth}/result.avi"


def fig2data(fig) -> np.ndarray:
    """Matplotlib figure -> HxWx4 RGBA array
    (reference draw_3d_joints.py fig2data helper)."""
    fig.canvas.draw()
    w, h = fig.canvas.get_width_height()
    buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    return buf.reshape(h, w, 4).copy()


def draw_3d_skeleton(pose_cam_xyz: np.ndarray, image_size=(224, 224)
                     ) -> np.ndarray:
    """Render a standalone 3D skeleton figure and return its pixels
    (reference draw_3d_joints.py:163-198)."""
    plt = _plt()
    fig = plt.figure()
    fig.set_size_inches(image_size[0] / fig.dpi,
                        image_size[1] / fig.dpi, forward=True)
    ax = fig.add_subplot(111, projection="3d")
    plot_3d_hand(ax, pose_cam_xyz)
    ax.view_init(elev=-85, azim=-75)
    ret = fig2data(fig)
    plt.close(fig)
    return ret


def debug_dataset(image, joints_2d, joints_3d, out_path="dataset_debug"):
    """Three-panel loader sanity plot: image / image+2D / 3D
    (reference draw_3d_joints.py:201-213)."""
    plt = _plt()
    remap = jointsMapSMPLXToSimple
    fig = plt.figure()
    ax1 = fig.add_subplot(131)
    ax2 = fig.add_subplot(132)
    ax3 = fig.add_subplot(133, projection="3d")
    ax1.imshow(image)
    ax2.imshow(image)
    plot_2d_hand(ax2, np.asarray(joints_2d)[remap], order="uv")
    plot_3d_hand(ax3, np.asarray(joints_3d)[remap])
    ax2.axis("off")
    print("saving debug dataset image...")
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
