"""GrabCut hand segmentation + background inpainting.

Reference dataset/utils.py:243-322 (``grabcut``): seed a GrabCut mask
from a rectangle around the 2D joints plus probable-foreground strokes
along the bones, run cv2.grabCut, then Telea-inpaint the background.
Host-side (cv2) like the reference; used for background-removal
augmentation experiments.
"""

from __future__ import annotations

import numpy as np


def grabcut(img, gt_joints_2d: np.ndarray, iterations: int = 5,
            margin: int = 15):
    """Returns (foreground_img, mask) with the background inpainted.

    ``img``: HxWx3 uint8 (or PIL image); ``gt_joints_2d``: [21,2] px.
    """
    import cv2
    if not isinstance(img, np.ndarray):
        img = np.asarray(img.convert("RGB"))
    img = img.copy()
    h, w = img.shape[:2]
    j = np.asarray(gt_joints_2d)
    x0 = int(max(j[:, 0].min() - margin, 0))
    y0 = int(max(j[:, 1].min() - margin, 0))
    x1 = int(min(j[:, 0].max() + margin, w - 1))
    y1 = int(min(j[:, 1].max() + margin, h - 1))
    mask = np.zeros((h, w), np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    rect = (x0, y0, max(x1 - x0, 1), max(y1 - y0, 1))
    cv2.grabCut(img, mask, rect, bgd, fgd, iterations,
                cv2.GC_INIT_WITH_RECT)
    # probable-foreground strokes along the bones (ref utils.py:270-300)
    bones = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 7),
             (7, 8), (0, 9), (9, 10), (10, 11), (11, 12), (0, 13),
             (13, 14), (14, 15), (15, 16), (0, 17), (17, 18), (18, 19),
             (19, 20)]
    for a, b in bones:
        pa = (int(j[a, 0]), int(j[a, 1]))
        pb = (int(j[b, 0]), int(j[b, 1]))
        cv2.line(mask, pa, pb, cv2.GC_FGD, 3)
    cv2.grabCut(img, mask, None, bgd, fgd, iterations,
                cv2.GC_INIT_WITH_MASK)
    fg_mask = np.where((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD),
                       1, 0).astype(np.uint8)
    # Telea-inpaint the background (ref utils.py:305-322)
    bg_mask = (1 - fg_mask) * 255
    out = cv2.inpaint(img, bg_mask.astype(np.uint8), 3,
                      cv2.INPAINT_TELEA)
    return out, fg_mask


# Bone list of the reference seeding, INCLUDING the (5,17) palm edge
# (dataset/utils.py:273)
_REF_BONES = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 7),
              (7, 8), (0, 9), (9, 10), (10, 11), (11, 12), (0, 13),
              (13, 14), (14, 15), (15, 16), (0, 17), (17, 18), (18, 19),
              (19, 20), (5, 17)]


def grabcut_reference(img, gt_joints_2d: np.ndarray,
                      iterations: int = 5):
    """Bit-compatible re-execution of the reference's grabcut
    (dataset/utils.py:243-322), for users migrating pipelines built on
    its exact outputs.  Returns ``(background_mask [H,W,1], inpainted)``
    in the reference's order/semantics: the hand region is
    Telea-inpainted out of the ORIGINAL image (a background plate for
    compositing) and the mask marks the background.

    Seeding differences vs :func:`grabcut` (which is the cleaned-up
    default): fixed 10-px rect (with the reference's transposed
    width/height, utils.py:259), wide bone strokes carving definite
    background, thin strokes (width h/25) as definite foreground, and
    the extra (5,17) palm bone."""
    import cv2
    if not isinstance(img, np.ndarray):
        img = np.asarray(img.convert("RGB"))
    # utils.py:247-251: channel-reverse then RGB2BGR — a double swap,
    # so grabCut runs on the RGB-ordered array
    work = cv2.cvtColor(img[:, :, ::-1].copy(), cv2.COLOR_RGB2BGR)
    orig = work.copy()
    h, w = work.shape[:2]
    mask = np.zeros((h, w), np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    rect = (10, 10, h - 10, w - 10)
    cv2.grabCut(work, mask, rect, bgd, fgd, iterations,
                cv2.GC_INIT_WITH_RECT)
    j = np.asarray(gt_joints_2d).reshape(21, 2)
    thin = np.full((h, w), 127, np.uint8)
    wide = np.zeros((h, w), np.uint8)
    for a, b in _REF_BONES:
        pa = (int(j[a, 0]), int(j[a, 1]))
        pb = (int(j[b, 0]), int(j[b, 1]))
        cv2.line(thin, pa, pb, (255, 255, 255), int(h / 25))
        cv2.line(wide, pa, pb, (255, 255, 255), int(h / 4))
    mask[wide == 0] = 0   # definite background outside the wide strokes
    mask[thin == 255] = 1  # definite foreground on the bones
    mask, _, _ = cv2.grabCut(work, mask, None, bgd, fgd, iterations,
                             cv2.GC_INIT_WITH_MASK)
    fg = np.where((mask == 2) | (mask == 0), 0, 1).astype(np.uint8)
    inpainted = cv2.inpaint(orig, fg, 3, cv2.INPAINT_TELEA)
    return (1 - fg[:, :, np.newaxis]), inpainted
