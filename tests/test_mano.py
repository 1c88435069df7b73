"""MANO LBS golden tests: float64 numpy re-execution of the reference
formulas (reference models/mano.py:83-201 and :280-391) vs the fused JAX
implementation, on the deterministic synthetic model."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as SR

from scat_tpu import assets
from scat_tpu.models import mano
import pytest


def _np_rodrigues(r):
    return SR.from_rotvec(r).as_matrix()


def _np_rigid_transform(Rs, Js, parents):
    """Reference mano.py:40-73 re-executed in float64."""
    B, K = Rs.shape[0], Rs.shape[1]

    def make_A(R, t):
        A = np.zeros((B, 4, 4))
        A[:, :3, :3] = R
        A[:, :3, 3] = t
        A[:, 3, 3] = 1.0
        return A

    results = [make_A(Rs[:, 0], Js[:, 0])]
    for i in range(1, K):
        A_here = make_A(Rs[:, i], Js[:, i] - Js[:, parents[i]])
        results.append(np.einsum("bij,bjk->bik", results[parents[i]],
                                 A_here))
    world = np.stack(results, axis=1)
    new_J = world[:, :, :3, 3]
    Js_h = np.concatenate([Js, np.zeros((B, K, 1))], axis=2)
    init_bone = np.einsum("bjxy,bjy->bjx", world, Js_h)
    A = world.copy()
    A[:, :, :, 3] -= init_bone
    return new_J, A


def _np_lbs(data, beta, full_pose):
    B = full_pose.shape[0]
    v_shaped = (beta @ data.shapedirs.reshape(-1, 10).T.astype(np.float64)
                ).reshape(B, 778, 3) + data.v_template
    J = np.einsum("jv,bvc->bjc", data.J_regressor.astype(np.float64),
                  v_shaped)
    Rs = _np_rodrigues(full_pose.reshape(-1, 3)).reshape(B, 16, 3, 3)
    pose_feature = (Rs[:, 1:] - np.eye(3)).reshape(B, -1)
    v_posed = (pose_feature @ data.posedirs.reshape(-1, 135).T
               ).reshape(B, 778, 3) + v_shaped
    new_J, A = _np_rigid_transform(Rs, J, data.kintree_parents)
    T = np.einsum("vj,bjxy->bvxy", data.weights.astype(np.float64), A)
    v_h = np.concatenate([v_posed, np.ones((B, 778, 1))], axis=2)
    verts = np.einsum("bvxy,bvy->bvx", T, v_h)[..., :3]
    return verts, new_J


def _data():
    return assets.synthetic_mano(seed=3)


def test_mano_hand_forward_matches_reference_formulas(rng):
    data = _data()
    model = mano.ManoModel.from_data(data)
    B = 4
    beta = rng.randn(B, 10) * 0.3
    theta = rng.randn(B, 15) * 0.3  # 3 global + 12 pca
    joints = np.asarray(mano.mano_hand_forward(
        model, jnp.asarray(beta, jnp.float32),
        jnp.asarray(theta, jnp.float32)))
    # numpy reference (mano.py:151-201)
    full_local = theta[:, 3:] @ data.hands_components[:12].astype(
        np.float64) + data.hands_mean
    full_pose = np.concatenate([theta[:, :3], full_local], axis=1)
    verts, _ = _np_lbs(data, beta, full_pose)
    want_j = np.einsum("jv,bvc->bjc", data.J_regressor.astype(np.float64),
                       verts)
    want = np.concatenate(
        [want_j, verts[:, assets.FINGERTIP_VERTS_MANOHAND]], axis=1)
    assert joints.shape == (B, 21, 3)
    np.testing.assert_allclose(joints, want, atol=2e-5)


@pytest.mark.slow
def test_rot_pose_beta_to_mesh_matches_reference_formulas(rng):
    data = _data()
    model = mano.ManoModel.from_data(data)
    B = 3
    rots = rng.randn(B, 3) * 0.5
    poses = rng.randn(B, 45) * 0.2
    betas = rng.randn(B, 10) * 0.3
    out = np.asarray(mano.rot_pose_beta_to_mesh(
        model, jnp.asarray(rots, jnp.float32),
        jnp.asarray(poses, jnp.float32), jnp.asarray(betas, jnp.float32)))
    assert out.shape == (B, 799, 3)
    # numpy reference (mano.py:280-391)
    local = (data.hands_mean + poses).reshape(B, 15, 3)
    full_pose = np.concatenate([np.zeros((B, 1, 3)), local],
                               axis=1).reshape(B, -1)
    verts, chain_J = _np_lbs(data, betas, full_pose)
    joints = np.concatenate(
        [chain_J, verts[:, assets.FINGERTIP_VERTS_FRANKMOCAP]], axis=1)
    Rots = _np_rodrigues(rots)
    verts = np.einsum("bxy,bvy->bvx", Rots, verts)
    joints = np.einsum("bxy,bjy->bjx", Rots, joints)
    root = joints[:, 1:2].copy()
    want = np.concatenate([joints - root, verts - root], axis=1)
    np.testing.assert_allclose(out, want, atol=2e-5)
    # root-centering invariant
    np.testing.assert_allclose(out[:, 1], 0.0, atol=1e-6)


@pytest.mark.slow
def test_mano_zero_pose_is_rest_shape():
    data = _data()
    model = mano.ManoModel.from_data(data)
    # zero beta & pose with hands_mean zeroed -> verts == v_template
    import dataclasses
    data0 = dataclasses.replace(data, hands_mean=np.zeros(45, np.float32))
    model0 = mano.ManoModel.from_data(data0)
    out = np.asarray(mano.rot_pose_beta_to_mesh(
        model0, jnp.zeros((1, 3)), jnp.zeros((1, 45)), jnp.zeros((1, 10))))
    J = data0.J_regressor @ data0.v_template
    want_root = J[1]
    np.testing.assert_allclose(out[0, 21:], data0.v_template - want_root,
                               atol=1e-5)


@pytest.mark.slow
def test_mano_forward_is_differentiable():
    import jax
    data = _data()
    model = mano.ManoModel.from_data(data)

    def loss(theta):
        j = mano.mano_hand_forward(model, jnp.zeros((1, 10)), theta)
        return jnp.sum(j ** 2)

    g = jax.grad(loss)(jnp.zeros((1, 15), jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))

    def loss2(poses):
        out = mano.rot_pose_beta_to_mesh(model, jnp.zeros((1, 3)), poses,
                                         jnp.zeros((1, 10)))
        return jnp.sum(out ** 2)

    g2 = jax.grad(loss2)(jnp.zeros((1, 45), jnp.float32))
    assert np.all(np.isfinite(np.asarray(g2)))


@pytest.mark.slow
def test_mano_jit_matches_eager(rng):
    import jax
    data = _data()
    model = mano.ManoModel.from_data(data)
    beta = jnp.asarray(rng.randn(2, 10) * 0.1, jnp.float32)
    theta = jnp.asarray(rng.randn(2, 15) * 0.1, jnp.float32)
    eager = mano.mano_hand_forward(model, beta, theta)
    jitted = jax.jit(mano.mano_hand_forward)(model, beta, theta)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               atol=1e-6)
