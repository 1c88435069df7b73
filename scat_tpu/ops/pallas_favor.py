"""Fused FAVOR+ linear attention as a Pallas TPU kernel.

The Performer path (reference vision_performer.py:34-53) computes
positive random features ``exp(w^T x - |x|^2/2)/sqrt(m)`` for q and k,
then two contractions ``qp (kp^T v) / (qp sum_t kp)``.  In XLA this
materializes the [B,H,T,m] feature tensors in HBM twice; this kernel
keeps the whole per-(batch, head) computation in VMEM — one HBM read of
q/k/v, one write of y.

At ViP scale (T=3137 tokens, e=128, m=64) the per-program working set
is ~3.5 MB — comfortably inside VMEM.  Backward uses recompute via a
custom VJP expressed with jax ops (the feature map is cheap relative to
the contractions).
"""

from __future__ import annotations

import functools
import math
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


def _favor_kernel(q_ref, k_ref, v_ref, w_ref, o_ref, *, m_feat: int,
                  t_valid: int):
    q = q_ref[0].astype(jnp.float32)      # [Tp, e]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)      # [m, e]
    inv_sqrt_m = 1.0 / math.sqrt(m_feat)

    hi = jax.lax.Precision.HIGHEST  # f32 MXU passes: the exp()
    # amplifies bf16 input rounding, so feature maps need full precision

    def prm(x):
        # exp(w x^T - |x|^2/2)/sqrt(m)  -> [Tp, m]
        wtx = jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32)
        xd = 0.5 * jnp.sum(x * x, axis=-1, keepdims=True)
        return jnp.exp(wtx - xd) * inv_sqrt_m

    qp = prm(q)
    kp = prm(k)
    # zero padded rows of kp so they don't contribute to sums
    row = jax.lax.broadcasted_iota(jnp.int32, kp.shape, 0)
    kp = jnp.where(row < t_valid, kp, 0.0)
    ksum = jnp.sum(kp, axis=0, keepdims=True)            # [1, m]
    D = jax.lax.dot_general(qp, ksum, (((1,), (1,)), ((), ())),
                            precision=hi,
                            preferred_element_type=jnp.float32)  # [Tp,1]
    kptv = jax.lax.dot_general(kp, v, (((0,), (0,)), ((), ())),
                               precision=hi,
                               preferred_element_type=jnp.float32)  # [m,e]
    y = jax.lax.dot_general(qp, kptv, (((1,), (0,)), ((), ())),
                            precision=hi,
                            preferred_element_type=jnp.float32)
    o_ref[0] = (y / D).astype(o_ref.dtype)


def _favor_impl(q, k, v, w):
    """q/k/v: [BH, T, e]; w: [m, e] -> y [BH, T, e]."""
    bh, t, e = q.shape
    m_feat = w.shape[0]
    t_pad = max(_round_up(t, 8), 8)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    spec = pl.BlockSpec((1, t_pad, e), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((m_feat, e), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_favor_kernel, m_feat=m_feat, t_valid=t),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, e), q.dtype),
        grid=(bh,),
        in_specs=[spec, spec, spec, w_spec],
        out_specs=spec,
        interpret=_interpret_mode(),
    )(qp, kp, vp, w)
    return out[:, :t, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _favor_core(q, k, v, w):
    return _favor_impl(q, k, v, w)


def _ref_favor(q, k, v, w):
    """XLA reference for the backward recompute — the ONE FAVOR+ math
    implementation (models/performer.py handles leading batch dims via
    '...'); a numerics change there automatically applies to this
    kernel's gradient."""
    from scat_tpu.models.performer import favor_attention
    return favor_attention(q, k, v, w)


def _favor_fwd(q, k, v, w):
    return _favor_impl(q, k, v, w), (q, k, v, w)


def _favor_bwd(res, g):
    q, k, v, w = res
    _, vjp_fn = jax.vjp(_ref_favor, q, k, v, w)
    dq, dk, dv, dw = vjp_fn(g)
    return dq, dk, dv, dw


_favor_core.defvjp(_favor_fwd, _favor_bwd)


def favor_attention_fused(q: jax.Array, k: jax.Array, v: jax.Array,
                          w: jax.Array) -> jax.Array:
    """Drop-in for scat_tpu.models.performer.favor_attention on
    [B, H, T, e] inputs (or [B, T, e] which is treated as H=1)."""
    squeeze = q.ndim == 3
    if squeeze:
        q, k, v = q[:, None], k[:, None], v[:, None]
    b, h, t, e = q.shape
    merge = lambda x: x.reshape(b * h, t, e)  # noqa: E731
    y = _favor_core(merge(q), merge(k), merge(v), w)
    y = y.reshape(b, h, t, e)
    return y[:, 0] if squeeze else y
