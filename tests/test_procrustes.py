"""Procrustes alignment vs the torch reference implementation re-executed
(reference eval.py:110-161)."""

import numpy as np
import jax.numpy as jnp
import torch

from scat_tpu.ops.procrustes import similarity_align


def _torch_reference(S1, S2):
    """Reference eval.py:110-161 re-executed with torch (float64)."""
    S1 = torch.as_tensor(S1, dtype=torch.float64)
    S2 = torch.as_tensor(S2, dtype=torch.float64)
    transposed = False
    if S1.shape[1] not in (2, 3):
        S1 = S1.permute(0, 2, 1)
        S2 = S2.permute(0, 2, 1)
        transposed = True
    mu1 = S1.mean(axis=-1, keepdims=True)
    mu2 = S2.mean(axis=-1, keepdims=True)
    X1, X2 = S1 - mu1, S2 - mu2
    var1 = torch.sum(X1 ** 2, dim=1).sum(dim=1)
    K = X1.bmm(X2.permute(0, 2, 1))
    U, s, V = torch.svd(K)
    Z = torch.eye(U.shape[1], dtype=U.dtype).unsqueeze(0).repeat(
        U.shape[0], 1, 1)
    Z[:, -1, -1] *= torch.sign(torch.det(U.bmm(V.permute(0, 2, 1))))
    R = V.bmm(Z.bmm(U.permute(0, 2, 1)))
    scale = torch.cat([torch.trace(x).unsqueeze(0) for x in R.bmm(K)]) / var1
    t = mu2 - scale.unsqueeze(-1).unsqueeze(-1) * (R.bmm(mu1))
    S1_hat = scale.unsqueeze(-1).unsqueeze(-1) * R.bmm(S1) + t
    if transposed:
        S1_hat = S1_hat.permute(0, 2, 1)
    return S1_hat.numpy()


def test_similarity_align_matches_torch_reference(rng):
    S1 = rng.randn(8, 21, 3).astype(np.float32) * 0.05
    S2 = rng.randn(8, 21, 3).astype(np.float32) * 0.05
    got = np.asarray(similarity_align(jnp.asarray(S1), jnp.asarray(S2)))
    want = _torch_reference(S1, S2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_similarity_align_recovers_exact_transform(rng):
    from scipy.spatial.transform import Rotation as SR
    S2 = rng.randn(4, 21, 3).astype(np.float64) * 0.05
    R = SR.from_rotvec(rng.randn(4, 3)).as_matrix()
    s = rng.rand(4) * 2 + 0.5
    t = rng.randn(4, 1, 3) * 0.1
    # S1 is a transformed copy of S2 -> alignment must recover S2 exactly
    S1 = s[:, None, None] * np.einsum("bij,bnj->bni", R, S2) + t
    got = np.asarray(similarity_align(jnp.asarray(S1, jnp.float32),
                                      jnp.asarray(S2, jnp.float32)))
    np.testing.assert_allclose(got, S2, atol=1e-4)


def test_similarity_align_transposed_layout(rng):
    S1 = rng.randn(3, 3, 21).astype(np.float32) * 0.05
    S2 = rng.randn(3, 3, 21).astype(np.float32) * 0.05
    got = np.asarray(similarity_align(jnp.asarray(S1), jnp.asarray(S2)))
    want = _torch_reference(S1, S2)
    assert got.shape == (3, 3, 21)
    np.testing.assert_allclose(got, want, atol=2e-5)
