"""Fused FAVOR+ linear attention as a Pallas TPU kernel.

The Performer path (reference vision_performer.py:34-53) computes
positive random features ``exp(w^T x - |x|^2/2)/sqrt(m)`` for q and k,
then two contractions ``qp (kp^T v) / (qp sum_t kp)``.  In XLA this
materializes the [B,H,T,m] feature tensors in HBM twice; this kernel
keeps the whole per-(batch, head) computation in VMEM — one HBM read of
q/k/v, one write of y.

Because FAVOR+ is *linear* attention, the T axis streams: a stats pass
accumulates ``sum_t kp`` [m] and ``kp^T v`` [m, e] tile by tile, and an
apply pass turns each q tile into output rows against those (tiny)
statistics.  Tiling T bounds the per-program VMEM working set at a few
hundred KB regardless of sequence length or batch — the earlier
whole-sequence-per-program variant hit the 16 MB scoped-VMEM ceiling at
ViP train scale (B96·H4 = 384 programs of [3144, 128] f32 operands).
Backward uses recompute via a custom VJP expressed with jax ops (the
feature map is cheap relative to the contractions).
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


# f32 MXU passes: the exp() amplifies bf16 input rounding, so the
# feature maps need full precision
_HI = jax.lax.Precision.HIGHEST

# Target T-tile; the actual tile minimizes padding (below).  Swept on
# v5e at ViP train scale (BH=384, T=3137): 512 -> 14.1 ms, 786 -> 13.6,
# 1048 -> 13.0, 1572 -> 24.8 (VMEM-pressure cliff).
_TILE_T = 1048


def _prm(x, w, m_feat: int):
    """Positive random features exp(w x^T - |x|^2/2)/sqrt(m) -> [t, m]."""
    wtx = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32)
    xd = 0.5 * jnp.sum(x * x, axis=-1, keepdims=True)
    return jnp.exp(wtx - xd) * (1.0 / math.sqrt(m_feat))


def _favor_stats_kernel(k_ref, v_ref, w_ref, ksum_ref, kptv_ref, *,
                        m_feat: int, t_valid: int, tb: int):
    """Accumulate sum_t kp [1, m] and kp^T v [m, e] over T tiles."""
    j = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)      # [tb, e]
    v = v_ref[0].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)      # [m, e]
    kp = _prm(k, w, m_feat)               # [tb, m]
    # zero padded rows of kp so they don't contribute to the sums
    row = jax.lax.broadcasted_iota(jnp.int32, kp.shape, 0) + j * tb
    kp = jnp.where(row < t_valid, kp, 0.0)
    ks = jnp.sum(kp, axis=0, keepdims=True)              # [1, m]
    kv = jax.lax.dot_general(kp, v, (((0,), (0,)), ((), ())),
                             precision=_HI,
                             preferred_element_type=jnp.float32)  # [m,e]

    @pl.when(j == 0)
    def _init():
        ksum_ref[0] = ks
        kptv_ref[0] = kv

    @pl.when(j > 0)
    def _accum():
        ksum_ref[0] += ks
        kptv_ref[0] += kv


def _favor_apply_kernel(q_ref, ksum_ref, kptv_ref, w_ref, o_ref, *,
                        m_feat: int):
    """One q tile against the complete (tiny) k statistics."""
    q = q_ref[0].astype(jnp.float32)      # [tb, e]
    w = w_ref[:].astype(jnp.float32)
    qp = _prm(q, w, m_feat)               # [tb, m]
    D = jax.lax.dot_general(qp, ksum_ref[0], (((1,), (1,)), ((), ())),
                            precision=_HI,
                            preferred_element_type=jnp.float32)  # [tb,1]
    y = jax.lax.dot_general(qp, kptv_ref[0], (((1,), (0,)), ((), ())),
                            precision=_HI,
                            preferred_element_type=jnp.float32)  # [tb,e]
    o_ref[0] = (y / D).astype(o_ref.dtype)


def _favor_impl(q, k, v, w):
    """q/k/v: [BH, T, e]; w: [m, e] -> y [BH, T, e]."""
    bh, t, e = q.shape
    m_feat = w.shape[0]
    # T tiling: smallest 8-aligned tile count covering t with tiles
    # <= _TILE_T, sized to minimize padding waste
    nt = max(1, -(-t // _TILE_T))
    tb = max(_round_up(-(-t // nt), 8), 8)
    t_pad = tb * nt

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    interpret = _interpret_mode()
    tile = pl.BlockSpec((1, tb, e), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((m_feat, e), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    ksum_spec = pl.BlockSpec((1, 1, m_feat), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    kptv_spec = pl.BlockSpec((1, m_feat, e), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    ksum, kptv = pl.pallas_call(
        functools.partial(_favor_stats_kernel, m_feat=m_feat,
                          t_valid=t, tb=tb),
        out_shape=(jax.ShapeDtypeStruct((bh, 1, m_feat), jnp.float32),
                   jax.ShapeDtypeStruct((bh, m_feat, e), jnp.float32)),
        grid=(bh, nt),
        in_specs=[tile, tile, w_spec],
        out_specs=(ksum_spec, kptv_spec),
        interpret=interpret,
    )(pad(k), pad(v), w)

    out = pl.pallas_call(
        functools.partial(_favor_apply_kernel, m_feat=m_feat),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, e), q.dtype),
        grid=(bh, nt),
        in_specs=[tile, ksum_spec, kptv_spec, w_spec],
        out_specs=tile,
        interpret=interpret,
    )(pad(q), ksum, kptv, w)
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
