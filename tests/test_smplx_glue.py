"""SMPL-X glue re-exec goldens (closes the last untested shipped
module).  Float64 re-executions of reference test.py:55-86 (bbox
conversions) and data_utils/general_utils.py:12-72 (hand extraction from
a full-body output) — the reference functions are dead code upstream,
so these tests pin the formulas, not a live call path."""

import numpy as np
import pytest

from scat_tpu.utils import smplx_glue


def test_convert_smpl_to_bbox_hand_branch(rng):
    """bAppTransFirst=True (the hand-model branch, test.py:77-79):
    ((x + t) * s) * 112 on xy, (x * s) * 112 on z."""
    x = rng.randn(2, 21, 3)
    scale = np.array(1.7)
    trans = rng.randn(2)
    got = np.asarray(smplx_glue.convert_smpl_to_bbox(
        x.copy(), scale, trans, bAppTransFirst=True))
    want = x.copy()
    want[:, :, 0:2] += trans
    want *= scale
    want *= 112.0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_convert_smpl_to_bbox_body_branch(rng):
    """bAppTransFirst=False: scale then xy-shift then *112.  (The
    reference's own else-branch indexes [:,0:2] — the first two joints —
    which is the frankmocap copy-paste bug documented in the docstring;
    we pin the evident intent.)"""
    x = rng.randn(2, 21, 3)
    scale = np.array(0.8)
    trans = rng.randn(2)
    got = np.asarray(smplx_glue.convert_smpl_to_bbox(
        x.copy(), scale, trans, bAppTransFirst=False))
    want = x * scale
    want[:, :, 0:2] += trans
    want *= 112.0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_convert_bbox_to_oriIm(rng):
    """test.py:55-71: /boxScale then xy += (topLeft + 112/boxScale)."""
    x = rng.randn(2, 21, 3) * 100
    box_scale = 0.45
    top_left = np.array([37.0, 81.0])
    got = np.asarray(smplx_glue.convert_bbox_to_oriIm(
        x.copy(), box_scale, top_left, 640, 480))
    want = x / box_scale
    want[:, :, :2] += top_left + 112.0 / box_scale
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # roundtrip: to-bbox then to-image with matching params recovers
    # scale-consistent coordinates
    back = np.asarray(smplx_glue.convert_bbox_to_oriIm(
        np.asarray(smplx_glue.convert_smpl_to_bbox(
            x.copy(), np.array(1.0 / 112.0), np.zeros(2))),
        1.0, np.array([-112.0, -112.0]), 640, 480))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


def _hand_info(rng, n_hand_verts=30):
    """Synthetic SMPLX_HAND_INFO tables for both hands."""
    info = {}
    for side in ("left", "right"):
        idx = rng.choice(200, size=n_hand_verts, replace=False)
        info[f"{side}_hand_verts_idx"] = idx
        info[f"{side}_top_finger_ave_vert_idx"] = [
            rng.choice(n_hand_verts, size=3, replace=False)
            for _ in range(5)]
        w = rng.rand(5, 3)
        info[f"{side}_top_finger_ave_vert_weight"] = [
            (row / row.sum()) for row in w]
        info[f"{side}_top_finger_long_vert_idx"] = rng.choice(
            200, size=5, replace=False)
    return info


def _reference_extract_f64(vertices, joints, hand_type, hand_info,
                           top_type="ave"):
    """Float64 re-execution of general_utils.py:12-72."""
    if hand_type == "left":
        wrist_idx, hand_start_idx = 20, 25
    else:
        wrist_idx, hand_start_idx = 21, 40
    root = joints[:, hand_start_idx:hand_start_idx + 1, :]
    hand_verts_idx = np.asarray(hand_info[f"{hand_type}_hand_verts_idx"])
    hand_verts = vertices[:, hand_verts_idx, :]
    hand_joints = np.concatenate(
        [joints[:, wrist_idx:wrist_idx + 1, :],
         joints[:, hand_start_idx:hand_start_idx + 15, :]], axis=1)
    if top_type == "ave":
        for tid, selected in enumerate(
                hand_info[f"{hand_type}_top_finger_ave_vert_idx"]):
            vert_idx = hand_verts_idx[np.asarray(selected)]
            verts = vertices[:, vert_idx]
            w = np.asarray(hand_info[
                f"{hand_type}_top_finger_ave_vert_weight"][tid]
                ).reshape(1, -1, 1)
            top = np.sum(w * verts, axis=1, keepdims=True)
            hand_joints = np.concatenate([hand_joints, top], axis=1)
    else:
        idx = np.asarray(hand_info[f"{hand_type}_top_finger_long_vert_idx"])
        hand_joints = np.concatenate(
            [hand_joints, vertices[:, idx, :]], axis=1)
    return {
        "hand_vertices": hand_verts,
        "hand_vertices_shift": hand_verts - root,
        "hand_joints": hand_joints,
        "hand_joints_shift": hand_joints - root,
        "vertices_shift": vertices - root,
    }


@pytest.mark.parametrize("hand_type", ["left", "right"])
@pytest.mark.parametrize("top_type", ["ave", "long"])
def test_extract_hand_output_matches_reference(rng, hand_type, top_type):
    info = _hand_info(rng)
    vertices = rng.randn(2, 200, 3)
    joints = rng.randn(2, 60, 3)
    got = smplx_glue.extract_hand_output(
        vertices.astype(np.float32), joints.astype(np.float32),
        hand_type, info, top_finger_joints_type=top_type)
    want = _reference_extract_f64(vertices, joints, hand_type, info,
                                  top_type)
    # 21 = wrist + 15 + 5 fingertips
    assert got["hand_joints"].shape == (2, 21, 3)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                   rtol=1e-4, atol=1e-5)
    assert got["wrist_idx"] == (20 if hand_type == "left" else 21)
    assert got["hand_start_idx"] == (25 if hand_type == "left" else 40)
