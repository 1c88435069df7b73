"""FrankMocap/SMPL-X glue: hand extraction from a full-body model output
and bbox <-> original-image coordinate conversion.

Reference data_utils/general_utils.py:12-72 (duplicated test.py:99-159)
and test.py:55-86.  Implemented against plain arrays — the SMPL-X body
model itself is an optional external dependency (like the reference's
smplx package + SMPLX_NEUTRAL.pkl download); the hand decode path runs
through scat_tpu.models.mano either way.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def convert_smpl_to_bbox(data3D: jax.Array, scale, trans,
                         bAppTransFirst: bool = False) -> jax.Array:
    """reference test.py:73-86: scale/translate into 224-bbox space.

    NOTE on the ``bAppTransFirst=False`` branch: the reference writes
    ``data3D[:,0:2] += trans`` on a [B,N,3] array — that shifts the
    first two JOINTS (all xyz), not the xy coordinates; frankmocap's
    original (which this code was lifted from) uses ``[:,:,0:2]``.  The
    function is dead code upstream (never called in test.py), so we
    implement the evident intent — xy shift — in both branches and flag
    the divergence here."""
    data3D = jnp.asarray(data3D)
    trans = jnp.asarray(trans)
    half = 224 * 0.5
    if bAppTransFirst:
        data3D = data3D.at[..., 0:2].add(trans)
        data3D = data3D * scale
    else:
        data3D = data3D * scale
        data3D = data3D.at[..., 0:2].add(trans)
    return data3D * half


def convert_bbox_to_oriIm(data3D: jax.Array, boxScale_o2n,
                          bboxTopLeft, imgSizeW: int, imgSizeH: int
                          ) -> jax.Array:
    """reference test.py:55-71: bbox space -> original-image pixels."""
    data3D = jnp.asarray(data3D)
    half = 224 * 0.5
    data3D = data3D / boxScale_o2n
    shift = jnp.asarray(bboxTopLeft) + half / boxScale_o2n
    return data3D.at[..., :2].add(shift)


def extract_hand_output(vertices: jax.Array, joints: jax.Array,
                        hand_type: str, hand_info: Dict,
                        top_finger_joints_type: str = "ave"
                        ) -> Dict[str, jax.Array]:
    """Slice one hand's joints+verts out of a full SMPL-X output
    (reference general_utils.py:12-72): wrist + 15 hand joints + 5
    fingertips via weighted vertex averaging; everything root-shifted to
    the hand-start joint.

    ``vertices`` [B,V,3], ``joints`` [B,J,3]; ``hand_info`` carries the
    ``{side}_hand_verts_idx`` / ``{side}_top_finger_*`` tables from
    SMPLX_HAND_INFO.pkl.
    """
    assert hand_type in ["left", "right"]
    if hand_type == "left":
        wrist_idx, hand_start_idx, middle_finger_idx = 20, 25, 28
    else:
        wrist_idx, hand_start_idx, middle_finger_idx = 21, 40, 43

    root = joints[:, hand_start_idx:hand_start_idx + 1, :]
    vertices_shift = vertices - root
    hand_verts_idx = np.asarray(hand_info[f"{hand_type}_hand_verts_idx"],
                                dtype=np.int64)
    hand_verts = vertices[:, hand_verts_idx, :]
    hand_verts_shift = hand_verts - root
    hand_joints = jnp.concatenate(
        [joints[:, wrist_idx:wrist_idx + 1, :],
         joints[:, hand_start_idx:hand_start_idx + 15, :]], axis=1)

    if len(top_finger_joints_type) > 0:
        if top_finger_joints_type in ["long", "manual"]:
            key = (f"{hand_type}_top_finger_"
                   f"{top_finger_joints_type}_vert_idx")
            idx = np.asarray(hand_info[key], dtype=np.int64)
            hand_joints = jnp.concatenate(
                [hand_joints, vertices[:, idx, :]], axis=1)
        else:
            assert top_finger_joints_type == "ave"
            key1 = f"{hand_type}_top_finger_ave_vert_idx"
            key2 = f"{hand_type}_top_finger_ave_vert_weight"
            for tid, selected in enumerate(hand_info[key1]):
                vert_idx = hand_verts_idx[np.asarray(selected)]
                verts = vertices[:, vert_idx]
                w = jnp.asarray(
                    np.asarray(hand_info[key2][tid]).reshape(1, -1, 1))
                top = jnp.sum(w * verts, axis=1, keepdims=True)
                hand_joints = jnp.concatenate([hand_joints, top], axis=1)

    return dict(
        wrist_idx=wrist_idx,
        hand_start_idx=hand_start_idx,
        middle_finger_idx=middle_finger_idx,
        vertices_shift=vertices_shift,
        hand_vertices=hand_verts,
        hand_vertices_shift=hand_verts_shift,
        hand_joints=hand_joints,
        hand_joints_shift=hand_joints - root,
    )
