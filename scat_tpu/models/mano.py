"""Differentiable MANO hand model, fused for XLA.

Replicates both reference implementations' semantics
(reference models/mano.py):

  * :func:`mano_hand_forward` — the ``ManoHand`` nn.Module path
    (mano.py:83-201): PCA pose (12 comps) -> full 45-dof pose, blend
    shapes, joint regression, per-joint quaternion Rodrigues,
    pose-corrective blendshapes, kinematic-chain rigid transforms, LBS,
    joints = J_regressor(verts) ++ fingertip verts [734,333,443,555,678].
  * :func:`rot_pose_beta_to_mesh` — the functional path (mano.py:280-391):
    full 45-dof pose input added to hands_mean, zero root rotation in the
    chain, guarded Rodrigues, LBS, global rotation applied after skinning,
    fingertips from frankmocap-SMPLX vertex ids [320,443,671,554,744],
    root-centered on joint 1, returns ``cat(joints21, verts778)``.

TPU-first design notes: the whole forward is one fused XLA program —
blend shapes and joint regression are single [B,*]x[*,*] matmuls on the
MXU; the 16-joint kinematic chain is an unrolled static loop of 4x4
composes (tree-structured, 16 iterations, negligible vs the 778-vertex
matmuls); no host sync, no module-level device state (the reference
``.cuda()``s pickle globals at import time, mano.py:220-234).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu import assets
from scat_tpu.ops.geometry import batch_rodrigues, rodrigues_guarded

NUM_JOINTS = 16
NUM_VERTS = 778


@dataclasses.dataclass(frozen=True)
class ManoModel:
    """Device-resident MANO parameters (a pytree of jnp arrays)."""

    v_template: jax.Array        # [778, 3]
    shapedirs_flat: jax.Array    # [10, 778*3]   (beta @ -> vertex offsets)
    posedirs_flat: jax.Array     # [135, 778*3]
    J_regressor: jax.Array       # [16, 778]
    weights: jax.Array           # [778, 16]
    hands_mean: jax.Array        # [45]
    hands_components: jax.Array  # [45, 45]
    parents: Tuple[int, ...]     # length 16, parents[0] unused

    @classmethod
    def from_data(cls, data: Optional[assets.ManoModelData] = None,
                  dtype=jnp.float32) -> "ManoModel":
        if data is None:
            data = assets.load_mano()
        return cls(
            v_template=jnp.asarray(data.v_template, dtype),
            shapedirs_flat=jnp.asarray(
                data.shapedirs.reshape(-1, data.shapedirs.shape[-1]).T,
                dtype),
            posedirs_flat=jnp.asarray(
                data.posedirs.reshape(-1, data.posedirs.shape[-1]).T, dtype),
            J_regressor=jnp.asarray(data.J_regressor, dtype),
            weights=jnp.asarray(data.weights, dtype),
            hands_mean=jnp.asarray(data.hands_mean.reshape(-1), dtype),
            hands_components=jnp.asarray(data.hands_components, dtype),
            parents=tuple(int(p) for p in data.kintree_parents),
        )


jax.tree_util.register_pytree_node(
    ManoModel,
    lambda m: ((m.v_template, m.shapedirs_flat, m.posedirs_flat,
                m.J_regressor, m.weights, m.hands_mean,
                m.hands_components), m.parents),
    lambda parents, leaves: ManoModel(*leaves, parents=parents),
)


def _hi(a, b):
    """float32-accurate matmul (TPU MXU defaults to bf16 inputs)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def blend_shapes(model: ManoModel, beta: jax.Array) -> jax.Array:
    """``v_template + beta @ shapedirs`` -> [B,778,3] (mano.py:167)."""
    offs = _hi(beta, model.shapedirs_flat).reshape(-1, NUM_VERTS, 3)
    return offs + model.v_template


def regress_joints(model: ManoModel, verts: jax.Array) -> jax.Array:
    """J_regressor applied per coordinate -> [B,16,3] (mano.py:171-175)."""
    return jnp.einsum("jv,bvc->bjc", model.J_regressor, verts,
                      precision=jax.lax.Precision.HIGHEST)


def global_rigid_transform(Rs: jax.Array, Js: jax.Array,
                           parents: Tuple[int, ...]
                           ) -> Tuple[jax.Array, jax.Array]:
    """Forward-kinematics over the 16-joint chain.

    Returns ``(new_J [B,16,3], A [B,16,4,4])`` where A is the relative
    skinning transform (world transform minus the rest-pose bone offset),
    matching reference mano.py:40-73.
    """
    B = Rs.shape[0]
    dtype = Rs.dtype

    def make_A(R, t):
        # [B,3,3],[B,3] -> [B,4,4]
        top = jnp.concatenate([R, t[:, :, None]], axis=2)
        bottom = jnp.broadcast_to(
            jnp.asarray([0., 0., 0., 1.], dtype), (B, 1, 4))
        return jnp.concatenate([top, bottom], axis=1)

    results = [make_A(Rs[:, 0], Js[:, 0])]
    for i in range(1, NUM_JOINTS):
        j_rel = Js[:, i] - Js[:, parents[i]]
        A_here = make_A(Rs[:, i], j_rel)
        results.append(_hi(results[parents[i]], A_here))
    world = jnp.stack(results, axis=1)  # [B,16,4,4]

    new_J = world[:, :, :3, 3]
    # A = world - pack(world @ [J;0]): removes the rest-pose bone position
    # so LBS transforms displacements (mano.py:68-71).
    Js_h = jnp.concatenate([Js, jnp.zeros((B, NUM_JOINTS, 1), dtype)],
                           axis=2)
    init_bone = jnp.einsum("bjxy,bjy->bjx", world, Js_h,
                           precision=jax.lax.Precision.HIGHEST)
    A = world.at[:, :, :, 3].add(-init_bone)
    return new_J, A


def linear_blend_skinning(model: ManoModel, v_posed: jax.Array,
                          A: jax.Array) -> jax.Array:
    """Per-vertex blended transforms applied to posed vertices
    (mano.py:181-187)."""
    B = v_posed.shape[0]
    T = jnp.einsum("vj,bjxy->bvxy", model.weights, A,
                   precision=jax.lax.Precision.HIGHEST)
    v_h = jnp.concatenate(
        [v_posed, jnp.ones((B, NUM_VERTS, 1), v_posed.dtype)], axis=2)
    return jnp.einsum("bvxy,bvy->bvx", T, v_h,
                      precision=jax.lax.Precision.HIGHEST)[..., :3]


def pca_to_full_pose(model: ManoModel, theta: jax.Array,
                     pose_param_count: int = 12) -> jax.Array:
    """[B, 3+P] (global rot + PCA coeffs) -> [B, 48] full pose
    (mano.py:152-155)."""
    g_rot, coeffs = theta[:, :3], theta[:, 3:]
    full = _hi(coeffs, model.hands_components[:pose_param_count])
    return jnp.concatenate([g_rot, full + model.hands_mean], axis=1)


def _lbs_core(model: ManoModel, beta: jax.Array, full_pose: jax.Array,
              rodrigues_fn) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Shared LBS pipeline: returns (verts, chain_joints, Rs)."""
    B = full_pose.shape[0]
    v_shaped = blend_shapes(model, beta)
    J = regress_joints(model, v_shaped)
    Rs = rodrigues_fn(full_pose.reshape(-1, 3)).reshape(B, NUM_JOINTS, 3, 3)
    eye = jnp.eye(3, dtype=Rs.dtype)
    pose_feature = (Rs[:, 1:] - eye).reshape(B, -1)  # [B,135]
    v_posed = (_hi(pose_feature, model.posedirs_flat)
               .reshape(B, NUM_VERTS, 3) + v_shaped)
    new_J, A = global_rigid_transform(Rs, J, model.parents)
    verts = linear_blend_skinning(model, v_posed, A)
    return verts, new_J, Rs


def mano_hand_forward(model: ManoModel, beta: jax.Array, theta: jax.Array,
                      pose_param_count: int = 12, get_skin: bool = False):
    """``ManoHand.forward`` semantics (mano.py:151-201).

    ``beta`` [B,10], ``theta`` [B, 3+pose_param_count].  Joints are the
    J_regressor of the *skinned* vertices plus the 5 fingertip vertices
    [734,333,443,555,678] -> [B,21,3].
    """
    full_pose = pca_to_full_pose(model, theta, pose_param_count)
    verts, _, Rs = _lbs_core(model, beta, full_pose, batch_rodrigues)
    joints = regress_joints(model, verts)
    finger = verts[:, np.asarray(assets.FINGERTIP_VERTS_MANOHAND), :]
    joints = jnp.concatenate([joints, finger], axis=1)
    if get_skin:
        return verts, joints, Rs
    return joints


def rot_pose_beta_to_mesh(model: ManoModel, rots: jax.Array,
                          poses: jax.Array, betas: jax.Array,
                          fingertip_ids=None) -> jax.Array:
    """Functional reference path (mano.py:280-391): returns [B,799,3]
    = 21 joints ++ 778 verts, root-centered on joint 1.

    ``rots`` [B,3] global rotation applied *after* skinning; ``poses``
    [B,45] local dofs added to hands_mean; ``betas`` [B,10].
    """
    if fingertip_ids is None:
        fingertip_ids = assets.FINGERTIP_VERTS_FRANKMOCAP
    B = rots.shape[0]
    local = (model.hands_mean + poses).reshape(B, NUM_JOINTS - 1, 3)
    root = jnp.zeros((B, 1, 3), poses.dtype)  # root_rot = 0 (mano.py:234)
    full_pose = jnp.concatenate([root, local], axis=1).reshape(B, -1)
    # NOTE (parity): the reference regresses chain joints from v_shaped,
    # not v_posed (mano.py:302), and adds pose correctives to vertices
    # only — _lbs_core matches both.
    verts, chain_joints, _ = _lbs_core(model, betas, full_pose,
                                       rodrigues_guarded)
    finger = verts[:, np.asarray(fingertip_ids), :]
    joints = jnp.concatenate([chain_joints, finger], axis=1)  # [B,21,3]
    Rots = rodrigues_guarded(rots)
    verts = jnp.einsum("bxy,bvy->bvx", Rots, verts,
                       precision=jax.lax.Precision.HIGHEST)
    joints = jnp.einsum("bxy,bjy->bjx", Rots, joints,
                        precision=jax.lax.Precision.HIGHEST)
    center = joints[:, 1:2]
    return jnp.concatenate([joints - center, verts - center], axis=1)


def save_obj(verts, faces, obj_mesh_name: str) -> None:
    """Export a mesh as Wavefront .obj (reference mano.py:139-149)."""
    import numpy as _np
    verts = _np.asarray(verts)
    faces = _np.asarray(faces)
    with open(obj_mesh_name, "w") as fp:
        for v in verts:
            fp.write("v %f %f %f\n" % (v[0], v[1], v[2]))
        for f in faces:
            fp.write("f %d %d %d\n" % (f[0] + 1, f[1] + 1, f[2] + 1))
