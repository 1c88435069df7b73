"""Batched orthogonal Procrustes (PA) alignment.

Reproduces ``batch_compute_similarity_transform_torch`` (reference
eval.py:110-161): find similarity (s, R, t) mapping S1 closest to S2 and
return the aligned S1.  The whole batch runs as one vmapped SVD — the 3x21
cross-covariances are tiny, so device-batched SVD beats any host fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def similarity_align(S1: jax.Array, S2: jax.Array) -> jax.Array:
    """PA-align ``S1`` (``[B,N,3]`` or ``[B,3,N]``) to ``S2``; returns S1_hat.

    Follows reference eval.py:110-161 step for step: mean-center, SVD of the
    cross-covariance K = X1 X2^T, det-sign fix on the last singular vector,
    scale = trace(R K)/var1, translate.
    """
    with jax.default_matmul_precision("highest"):
        return _similarity_align(S1, S2)


def _similarity_align(S1: jax.Array, S2: jax.Array) -> jax.Array:
    transposed = False
    if S1.shape[1] not in (2, 3):
        S1 = jnp.swapaxes(S1, 1, 2)
        S2 = jnp.swapaxes(S2, 1, 2)
        transposed = True
    assert S2.shape[1] == S1.shape[1]

    mu1 = S1.mean(axis=-1, keepdims=True)
    mu2 = S2.mean(axis=-1, keepdims=True)
    X1 = S1 - mu1
    X2 = S2 - mu2

    var1 = jnp.sum(X1 ** 2, axis=(1, 2))
    K = X1 @ jnp.swapaxes(X2, 1, 2)

    U, _, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, 1, 2)

    det = jnp.linalg.det(U @ jnp.swapaxes(V, 1, 2))
    d = S1.shape[1]
    sign_fix = jnp.ones((S1.shape[0], d), dtype=S1.dtype)
    sign_fix = sign_fix.at[:, -1].set(jnp.sign(det))
    R = (V * sign_fix[:, None, :]) @ jnp.swapaxes(U, 1, 2)

    scale = jnp.trace(R @ K, axis1=1, axis2=2) / var1
    t = mu2 - scale[:, None, None] * (R @ mu1)
    S1_hat = scale[:, None, None] * (R @ S1) + t

    if transposed:
        S1_hat = jnp.swapaxes(S1_hat, 1, 2)
    return S1_hat
