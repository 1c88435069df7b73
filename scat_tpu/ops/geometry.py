"""Core geometry kernels (pure jnp, fully batched, jit/vmap/grad-safe).

Numerics match the reference formulas:
  * quaternion Rodrigues        — reference models/mano.py:12-38
  * Taylor-guarded Rodrigues    — reference models/mano.py:236-267
  * weak-perspective projection — reference train.py:112-120
  * 2D-rotation label math      — reference dataset/rotation.py:7-55

All functions take a leading batch axis and use static shapes; branchy
reference code (e.g. the small-angle fallback chosen by ``np.argwhere`` on
host) becomes ``jnp.where`` selects so everything stays inside one XLA
program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat2mat(quat: jax.Array) -> jax.Array:
    """Unit-normalize quaternions ``[B,4] (w,x,y,z)`` -> rotations ``[B,3,3]``.

    Same algebra as reference models/mano.py:24-38.
    """
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / norm
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], axis=-1)
    return m.reshape(quat.shape[:-1] + (3, 3))


def batch_rodrigues(theta: jax.Array) -> jax.Array:
    """Axis-angle ``[B,3]`` -> rotation matrices ``[B,3,3]`` via quaternions.

    Matches reference models/mano.py:12-22 including the ``+1e-8`` inside the
    L2 norm (a bias, not an epsilon-add on the result — reproduced for
    numeric parity).
    """
    l1norm = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    normalized = theta / l1norm
    half = l1norm * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized],
                           axis=-1)
    return quat2mat(quat)


def _skew(n: jax.Array) -> jax.Array:
    """``[B,3] -> [B,3,3]`` skew-symmetric cross-product matrices."""
    zeros = jnp.zeros_like(n[..., 0])
    rows = jnp.stack([
        zeros, -n[..., 2], n[..., 1],
        n[..., 2], zeros, -n[..., 0],
        -n[..., 1], n[..., 0], zeros,
    ], axis=-1)
    return rows.reshape(n.shape[:-1] + (3, 3))


def rodrigues_guarded(r: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Rodrigues formula with a 2nd-order Taylor fallback for tiny angles.

    Reference models/mano.py:236-267 computes both the exact formula and the
    Taylor expansion and swaps rows where ``theta < 1e-30`` (host-side
    ``np.argwhere``).  Here the select is a branch-free ``jnp.where`` with
    gradient-safe guarded intermediates so the op stays jittable and
    differentiable at theta == 0.  The switch threshold is 1e-6 rather than
    the reference's 1e-30: below 1e-6 the Taylor form is exact to well under
    float32 eps, and 1e-30 underflows in float32 anyway.
    """
    theta2 = jnp.sum(r * r, axis=-1)
    small = theta2 < (eps * eps)
    # Guarded intermediates: the untaken branch must stay finite (and have
    # finite gradients) under jnp.where, hence the double-where pattern.
    safe_theta2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_theta2)
    # theta is exactly 1.0 wherever `small` (sqrt of the guarded 1.0),
    # so dividing by it directly is already gradient-safe
    n = r / theta[..., None]
    Sn = _skew(n)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), Sn.shape)
    sin_t = jnp.sin(theta)[..., None, None]
    cos_t = jnp.cos(theta)[..., None, None]
    # Sn @ Sn == n n^T - I for unit n; the outer-product form avoids a 3x3
    # MXU matmul (which TPU would compute at bf16 precision by default).
    nnT = n[..., :, None] * n[..., None, :]
    R_exact = cos_t * eye + sin_t * Sn + (1.0 - cos_t) * nnT
    # Taylor path on the *unnormalized* vector (reference :257-260);
    # Sr @ Sr == r r^T - theta^2 I.
    Sr = _skew(r)
    rrT = r[..., :, None] * r[..., None, :]
    t2 = theta2[..., None, None]
    R_taylor = (eye + (1.0 - t2 / 6.0) * Sr
                + (0.5 - t2 / 24.0) * (rrT - t2 * eye))
    return jnp.where(small[..., None, None], R_taylor, R_exact)


def batch_orth_proj_idrot(X: jax.Array, camera: jax.Array) -> jax.Array:
    """Weak-perspective projection.

    ``X`` is ``[B,N,3]`` joints; ``camera`` is ``[B,3]`` = (scale s, tx, ty).
    Returns ``[B,N,2]`` = ``s * (X_xy + t)`` (reference train.py:112-117).
    """
    camera = camera.reshape(-1, 1, 3)
    X_trans = X[..., :2] + camera[..., 1:]
    return camera[..., 0:1] * X_trans


def project_2d(joints_2d: jax.Array, half: float = 112.0) -> jax.Array:
    """Normalized [-1,1] coords -> 224-pixel coords (reference train.py:119-120)."""
    return joints_2d * half + half


def project_points_pinhole(joints_3d, K, xp=jnp):
    """Pinhole projection ``[.,N,3] @ K.T`` then perspective divide.

    Matches the STB label projection (reference dataset/load_STB.py:257-258).
    ``xp`` selects the array module (numpy for the host label path).
    """
    uvw = joints_3d @ xp.swapaxes(K, -1, -2)
    return uvw[..., :2] / uvw[..., 2:]


def rotation_matrix_2d(angle_deg: jax.Array, center: jax.Array,
                       xp=jnp) -> jax.Array:
    """cv2.getRotationMatrix2D equivalent: ``[...,2,3]`` affine for a CCW
    rotation of ``angle_deg`` about ``center`` (reference rotation.py:17).
    ``xp`` selects the array module (numpy for host loader paths).
    """
    a = xp.deg2rad(angle_deg)
    cos, sin = xp.cos(a), xp.sin(a)
    cx, cy = center[..., 0], center[..., 1]
    # OpenCV convention: alpha=cos, beta=sin; x' = a*x + b*y + (1-a)cx - b*cy
    r0 = xp.stack([cos, sin, (1 - cos) * cx - sin * cy], axis=-1)
    r1 = xp.stack([-sin, cos, sin * cx + (1 - cos) * cy], axis=-1)
    return xp.stack([r0, r1], axis=-2)


def rotate_joints_2d(joints_2d: jax.Array, M: jax.Array) -> jax.Array:
    """Apply a 2x3 affine to ``[...,N,2]`` joints (reference rotation.py:33-34)."""
    ones = jnp.ones_like(joints_2d[..., :1])
    homo = jnp.concatenate([joints_2d, ones], axis=-1)
    return homo @ jnp.swapaxes(M, -1, -2)


def rotate_joints_3d(joints_3d: jax.Array, M: jax.Array,
                     xp=jnp) -> jax.Array:
    """In-plane 3D rotation from the image affine (reference rotation.py:36-45).

    The reference embeds the 2x2 block of the image affine into a 4x4 with
    the transposed sign pattern (M_3d[1][0] = -M[0][1]); z passes through.
    ``xp`` selects the array module (numpy for host loader paths).
    """
    # [..., None] broadcasts a batched [B,2,3] affine over the joint
    # axis ([B] -> [B,1] against [B,N]); unbatched M stays compatible
    c = M[..., 0, 0][..., None]
    s = M[..., 0, 1][..., None]
    x, y, z = joints_3d[..., 0], joints_3d[..., 1], joints_3d[..., 2]
    xr = c * x + s * y
    yr = -s * x + c * y
    return xp.stack([xr, yr, z], axis=-1)


def root_center(joints: jax.Array, root_index: int = 1) -> jax.Array:
    """Subtract the root joint (index 1, reference hand_net.py:389-393)."""
    return joints - joints[..., root_index:root_index + 1, :]


def rescale_3d_joints_flip(joints_3d, ref_bone_len: float = 0.03058954,
                           xp=jnp):
    """STB label normalization (reference dataset/load_STB.py:98-110):
    pin bone 4-5 length to ``ref_bone_len`` meters, mirror x, root-center
    on joint 1.

    ``xp`` selects the array module: the data loader runs this per
    sample on the host (``xp=numpy``, no dispatch overhead) while tests
    and device code use the default jnp — ONE implementation, one
    bone-length constant.
    """
    bone = joints_3d[..., 4, :] - joints_3d[..., 5, :]
    l = xp.linalg.norm(bone, axis=-1, keepdims=True)
    scaled = joints_3d * (ref_bone_len / l)[..., None]
    flipped = scaled * xp.asarray([-1.0, 1.0, 1.0],
                                  dtype=scaled.dtype)
    return flipped - flipped[..., 1:2, :]
