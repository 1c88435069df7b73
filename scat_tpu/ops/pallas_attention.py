"""Fused multi-head attention as a Pallas TPU kernel.

Replaces the reference's einsum-softmax-einsum MHSA
(reference models/vision_transformer.py:59-79) for the token regressor.
SCAT's sequences are tiny (21 joint tokens or 128 feature tokens,
head_dim 64), so the classic flash-attention streaming decomposition is
unnecessary — the whole [N,N] score tile fits in VMEM.  What the kernel
buys over XLA is fusion: one HBM round trip per (batch*head) chunk
instead of materializing [B,H,N,N] logits and probabilities, and a
recompute-based backward that never stores the probability tensor.

Layout: [B,H,N,D] -> [BH,N,D]; N padded to the sublane tile, BH chunked
over the grid so each program computes CHUNK heads' attention with
batched ``dot_general`` on the MXU.  f32 accumulation everywhere
(``preferred_element_type``).

The boolean keep-mask path (reference vision_transformer.py:67-71, unused
by the shipped models) falls back to the XLA implementation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scat_tpu.ops.pallas_common import interpret_mode, round_up

_INTERPRET = False  # deprecated per-module override; tests may flip it


def _interpret_mode() -> bool:
    return _INTERPRET or interpret_mode()


_round_up = round_up


def _bdot(a, b, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, batch),
        preferred_element_type=jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    s = _bdot(q, k, ((2,), (2,))) * scale          # [C, Np, Np]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_valid, s, -jnp.inf)      # mask pad keys
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = _bdot(p, v, ((2,), (1,)))                  # [C, Np, D]
    o_ref[:] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, n_valid: int):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    # recompute probabilities (cheaper than storing [BH,N,N])
    s = _bdot(q, k, ((2,), (2,))) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_valid, s, -jnp.inf)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    # dV = P^T dO   (contract over query rows)
    dv = _bdot(p, do, ((1,), (1,)))                # [C, Np(k), D]
    # dP = dO V^T
    dp = _bdot(do, v, ((2,), (2,)))                # [C, Np(q), Np(k)]
    dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - dsum)                           # softmax backward
    dq = _bdot(ds, k, ((2,), (1,))) * scale
    dk = _bdot(ds, q, ((1,), (1,))) * scale
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _prep(q):
    """[B,H,N,D] -> padded [BHp, Np, D] plus the static shape info."""
    b, h, n, d = q.shape
    n_pad = max(_round_up(n, 8), 8)
    return b, h, n, d, n_pad


_CHUNK = 8


def _pad_merge(x, n_pad, bh_pad):
    b, h, n, d = x.shape
    x = x.reshape(b * h, n, d)
    x = jnp.pad(x, ((0, bh_pad - b * h), (0, n_pad - n), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_core(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale)


def _flash_fwd_impl(q, k, v, scale):
    b, h, n, d, n_pad = _prep(q)
    bh = b * h
    bh_pad = _round_up(bh, _CHUNK)
    qm = _pad_merge(q, n_pad, bh_pad)
    km = _pad_merge(k, n_pad, bh_pad)
    vm = _pad_merge(v, n_pad, bh_pad)
    grid = (bh_pad // _CHUNK,)
    spec = pl.BlockSpec((_CHUNK, n_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n),
        out_shape=jax.ShapeDtypeStruct((bh_pad, n_pad, d), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_interpret_mode(),
    )(qm, km, vm)
    return out[:bh, :n, :].reshape(b, h, n, d)


def _flash_fwd(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    q, k, v = res
    b, h, n, d, n_pad = _prep(q)
    bh = b * h
    bh_pad = _round_up(bh, _CHUNK)
    qm = _pad_merge(q, n_pad, bh_pad)
    km = _pad_merge(k, n_pad, bh_pad)
    vm = _pad_merge(v, n_pad, bh_pad)
    gm = _pad_merge(g, n_pad, bh_pad)
    grid = (bh_pad // _CHUNK,)
    spec = pl.BlockSpec((_CHUNK, n_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((bh_pad, n_pad, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_valid=n),
        out_shape=(shp, shp, shp),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=_interpret_mode(),
    )(qm, km, vm, gm)

    def unpad(x):
        return x[:bh, :n, :].reshape(b, h, n, d)

    return unpad(dq), unpad(dk), unpad(dv)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float, mask: Optional[jax.Array] = None
                    ) -> jax.Array:
    """Fused attention on [B,H,N,D]; falls back to the XLA reference when a
    keep-mask is given (the masked path is unused by the shipped SCAT
    models, reference hand_net.py always passes mask=None)."""
    if mask is not None:
        from scat_tpu.models.transformer import mha_reference
        return mha_reference(q, k, v, scale, mask)
    return _flash_core(q, k, v, scale)
