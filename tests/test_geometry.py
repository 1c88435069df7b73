"""Golden tests for scat_tpu.ops.geometry against float64 numpy
re-executions of the reference formulas (SURVEY.md §4 test strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from scat_tpu.ops import geometry


def _np_quat2mat(quat):
    """Reference models/mano.py:24-38 re-executed in float64."""
    q = quat / np.linalg.norm(quat, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    B = quat.shape[0]
    out = np.stack([
        w**2 + x**2 - y**2 - z**2, 2*x*y - 2*w*z, 2*w*y + 2*x*z,
        2*w*z + 2*x*y, w**2 - x**2 + y**2 - z**2, 2*y*z - 2*w*x,
        2*x*z - 2*w*y, 2*w*x + 2*y*z, w**2 - x**2 - y**2 + z**2,
    ], axis=1).reshape(B, 3, 3)
    return out


def test_quat2mat_matches_reference_formula(rng):
    quat = rng.randn(32, 4)
    got = np.asarray(geometry.quat2mat(jnp.asarray(quat, jnp.float32)))
    want = _np_quat2mat(quat)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat2mat_is_rotation(rng):
    quat = rng.randn(16, 4)
    R = np.asarray(geometry.quat2mat(jnp.asarray(quat, jnp.float32)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)


def test_batch_rodrigues_vs_scipy(rng):
    theta = rng.randn(64, 3)
    got = np.asarray(geometry.batch_rodrigues(jnp.asarray(theta, jnp.float32)))
    want = ScipyRotation.from_rotvec(theta).as_matrix()
    # 1e-8 bias inside the reference norm costs a little accuracy
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rodrigues_guarded_vs_scipy(rng):
    theta = rng.randn(64, 3)
    got = np.asarray(geometry.rodrigues_guarded(jnp.asarray(theta,
                                                            jnp.float32)))
    want = ScipyRotation.from_rotvec(theta).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rodrigues_guarded_zero_angle():
    theta = jnp.zeros((4, 3), jnp.float32)
    got = np.asarray(geometry.rodrigues_guarded(theta))
    np.testing.assert_allclose(got, np.tile(np.eye(3), (4, 1, 1)), atol=1e-7)


@pytest.mark.slow
def test_rodrigues_guarded_differentiable_at_zero():
    import jax
    g = jax.jacobian(lambda r: geometry.rodrigues_guarded(r[None])[0])(
        jnp.zeros((3,), jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_orth_proj_reference_formula(rng):
    X = rng.randn(8, 21, 3).astype(np.float32)
    cam = rng.randn(8, 3).astype(np.float32)
    got = np.asarray(geometry.batch_orth_proj_idrot(jnp.asarray(X),
                                                    jnp.asarray(cam)))
    # reference train.py:112-117: 2d = s * (X_xy + t)
    want = cam[:, None, 0:1] * (X[:, :, :2] + cam[:, None, 1:])
    np.testing.assert_allclose(got, want, atol=1e-6)
    px = np.asarray(geometry.project_2d(jnp.asarray(want)))
    np.testing.assert_allclose(px, want * 112 + 112, atol=1e-5)


def test_pinhole_projection(rng):
    K = np.array([[607.92271, 0, 314.78337],
                  [0, 607.88192, 236.42484],
                  [0, 0, 1]], dtype=np.float32)
    X = rng.rand(4, 21, 3).astype(np.float32) + np.array([0, 0, 0.5],
                                                         np.float32)
    got = np.asarray(geometry.project_points_pinhole(jnp.asarray(X),
                                                     jnp.asarray(K)))
    uvw = X @ K.T
    want = uvw[..., :2] / uvw[..., 2:]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rotation_matrix_2d_matches_opencv_formula():
    # cv2.getRotationMatrix2D reference values (formula, no cv2 dependency)
    angle, cx, cy = 30.0, 112.0, 112.0
    M = np.asarray(geometry.rotation_matrix_2d(
        jnp.float32(angle), jnp.asarray([cx, cy], jnp.float32)))
    a = np.deg2rad(angle)
    alpha, beta = np.cos(a), np.sin(a)
    want = np.array([[alpha, beta, (1 - alpha) * cx - beta * cy],
                     [-beta, alpha, beta * cx + (1 - alpha) * cy]])
    np.testing.assert_allclose(M, want, atol=1e-5)


def test_rotate_joints_2d_3d_consistency(rng):
    j2d = rng.rand(21, 2).astype(np.float32) * 224
    j3d = rng.randn(21, 3).astype(np.float32)
    M = geometry.rotation_matrix_2d(jnp.float32(47.0),
                                    jnp.asarray([112., 112.], jnp.float32))
    r2 = np.asarray(geometry.rotate_joints_2d(jnp.asarray(j2d), M))
    # against explicit affine: [x y 1] @ M.T
    homo = np.concatenate([j2d, np.ones((21, 1), np.float32)], axis=1)
    np.testing.assert_allclose(r2, homo @ np.asarray(M).T, atol=1e-4)
    r3 = np.asarray(geometry.rotate_joints_3d(jnp.asarray(j3d), M))
    # reference rotation.py:38-45 sign pattern
    Mn = np.asarray(M)
    M3 = np.eye(3)
    M3[0, 0], M3[0, 1] = Mn[0, 0], Mn[0, 1]
    M3[1, 0], M3[1, 1] = -Mn[0, 1], Mn[0, 0]
    np.testing.assert_allclose(r3, j3d @ M3.T, atol=1e-5)


def test_rescale_3d_joints_flip(rng):
    j = rng.randn(21, 3).astype(np.float64)
    got = np.asarray(geometry.rescale_3d_joints_flip(
        jnp.asarray(j, jnp.float32)))
    # reference load_STB.py:98-110 re-executed
    l = np.linalg.norm(j[4] - j[5])
    want = j * (0.03058954 / l)
    want[:, 0] *= -1
    want = want - want[1]
    np.testing.assert_allclose(got, want, atol=1e-6)
    # bone length pinned
    np.testing.assert_allclose(np.linalg.norm(got[4] - got[5]),
                               0.03058954, rtol=1e-5)
    np.testing.assert_allclose(got[1], 0.0, atol=1e-7)


def test_root_center(rng):
    j = jnp.asarray(rng.randn(4, 21, 3), jnp.float32)
    out = np.asarray(geometry.root_center(j))
    np.testing.assert_allclose(out[:, 1], 0.0, atol=1e-7)
