"""Performer (FAVOR+ linear attention) regressor — the ``ViP`` model.

Reference models/vision_performer.py: positive random features
``exp(w^T x - |x|^2/2)/sqrt(m)`` with a frozen Gaussian projection
(prm_exp, :34-43), linear-time attention ``qp (kp^T v) / D`` (:45-53),
pre-LN residual blocks with 4x GELU MLP (:63-68), Unfold patchify +
zero-init pos-embed + cls token + mean-pool + HMR iterative head
(:70-116).

TPU-first: all heads computed in one batched einsum (the reference loops
per head, vision_performer.py:55-61 "poor people implements like this");
the FAVOR+ features and the two contractions are three MXU matmuls with
f32 accumulation.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def favor_precisions(name: str):
    """FAVOR+ precision ladder: (feature-dot, contraction-dot) MXU
    precisions.  The feature dot ``w^T x`` feeds ``exp`` — input
    rounding is amplified exponentially — while the three contraction
    dots (normalizer D, kp^T v, qp (kp^T v)) only average already-
    computed features.  Measured on-chip (benchmarks/
    probe_vip_precision.py, RESULTS.md "ViP precision ladder"):
    ``mixed`` keeps the exp input exact and runs the bandwidth-heavy
    contractions at the MXU's native bf16 rate."""
    P = jax.lax.Precision
    return {
        "highest": (P.HIGHEST, P.HIGHEST),
        "high": (P.HIGH, P.HIGH),
        "default": (P.DEFAULT, P.DEFAULT),
        "mixed": (P.HIGHEST, P.DEFAULT),        # exact exp, fast avg
        "mixed_high": (P.HIGH, P.DEFAULT),
    }[name]


def favor_features(x: jax.Array, w: jax.Array,
                   precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Positive random features for the Gaussian (softmax) kernel.

    ``x`` [..., T, d], ``w`` [m, d] frozen Gaussian; returns [..., T, m]
    = exp(w x - |x|^2/2)/sqrt(m) (reference vision_performer.py:34-43).
    """
    m = w.shape[0]
    xd = jnp.sum(x * x, axis=-1, keepdims=True) / 2.0
    wtx = jnp.einsum("...td,md->...tm", x, w, precision=precision)
    return jnp.exp(wtx - xd) / math.sqrt(m)


def favor_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    w: jax.Array,
                    precision: str = "highest") -> jax.Array:
    """Linear-time attention over [..., T, d] with feature map ``w``:
    ``qp (kp^T v) / (qp sum_t kp)`` (reference vision_performer.py:45-53).
    """
    feat_p, con_p = favor_precisions(precision)
    qp = favor_features(q, w, feat_p)
    kp = favor_features(k, w, feat_p)
    D = jnp.einsum("...tm,...m->...t", qp, kp.sum(axis=-2),
                   precision=con_p)[..., None]
    kptv = jnp.einsum("...tn,...tm->...nm", v, kp, precision=con_p)
    y = jnp.einsum("...tm,...nm->...tn", qp, kptv, precision=con_p)
    return y / D


def _torch_linear_dense(features, fan_in: int, dtype, name: str):
    """``nn.Dense`` with torch ``nn.Linear`` default init: kernel and
    bias both U(+-sqrt(1/fan_in)) (kaiming_uniform(a=sqrt(5)) reduces to
    exactly that bound).  Flax's lecun_normal has 3x the variance —
    benign for most nets, but FAVOR+ exponentiates ||k||^2, so at the
    reference's emb_s=128 the extra variance drives the feature map's
    normalizer D into f32 underflow at init (0/0 -> NaN); matching the
    torch init keeps from-scratch ViP training in the same numeric
    regime as the reference."""
    bound = 1.0 / math.sqrt(fan_in)

    def bias_init(key, shape, bias_dtype=jnp.float32):
        return jax.random.uniform(key, shape, bias_dtype, -bound, bound)

    return nn.Dense(
        features, dtype=dtype, name=name,
        kernel_init=nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"),
        bias_init=bias_init)


class PerformerBlock(nn.Module):
    """Pre-LN performer block (reference vision_performer.py:12-68).

    Per-head layout matches the reference: the embedding splits into
    ``head`` chunks of ``emb_s``; one shared kqv Linear(emb_s -> 3*emb_s)
    is applied per chunk — here as a single batched matmul over heads.
    """

    emb_s: int
    head: int
    kernel_ratio: float = 0.5
    dp_ratio: float = 0.1
    use_pallas: bool = False
    dtype: Any = jnp.float32
    favor_precision: str = "highest"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        emb = self.emb_s * self.head
        m = int(self.emb_s * self.kernel_ratio)
        # frozen Gaussian projection (requires_grad=False in the ref)
        w = self.variable(
            "constants", "w",
            lambda: jax.random.normal(self.make_rng("params"),
                                      (m, self.emb_s))).value
        w = jax.lax.stop_gradient(w)

        y = nn.LayerNorm(name="ln1")(x)
        b, t, _ = y.shape
        yh = y.reshape(b, t, self.head, self.emb_s).transpose(0, 2, 1, 3)
        kqv = _torch_linear_dense(3 * self.emb_s, self.emb_s,
                                  self.dtype, "kqv")(yh)
        k, q, v = jnp.split(kqv, 3, axis=-1)
        # Under sequence parallelism the fused Pallas kernel is opaque
        # to the SPMD partitioner (it would force a full token
        # all-gather); the XLA einsum path partitions cleanly — its
        # cross-token contractions become two tiny moment psums.
        from scat_tpu.parallel.sharding_rules import seq_axis_size
        if self.use_pallas and seq_axis_size() <= 1:
            from scat_tpu.ops.pallas_favor import favor_attention_fused
            attn = favor_attention_fused(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), w)
        else:
            attn = favor_attention(q, k, v, w,    # [b, h, t, emb_s]
                                   precision=self.favor_precision)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, emb)
        attn = _torch_linear_dense(emb, emb, self.dtype, "proj")(attn)
        attn = nn.Dropout(self.dp_ratio)(attn,
                                         deterministic=deterministic)
        x = x + attn

        y = nn.LayerNorm(name="ln2")(x)
        y = _torch_linear_dense(4 * emb, emb, self.dtype, "mlp1")(y)
        y = nn.gelu(y, approximate=False)
        y = _torch_linear_dense(emb, 4 * emb, self.dtype, "mlp2")(y)
        y = nn.Dropout(self.dp_ratio)(y, deterministic=deterministic)
        return x + y


class ViP(nn.Module):
    """Performer regressor, ``--net ViP``
    (reference vision_performer.py:70-116)."""

    mean_params: jax.Array
    out_dim: int = 66
    image_pix: int = 224
    patch_pix: int = 4
    emb_s: int = 128
    heads: int = 4
    depth: int = 3
    kernel_ratio: float = 0.5
    dropout: float = 0.1
    iteration: int = 1
    use_pallas: bool = False
    # rematerialize each block in the backward: ViP's activations are
    # huge (3137 tokens x 512 dim at 224 px) and its train step runs at
    # the sum of its flops- and bytes-bounds rather than their max
    # (benchmarks/RESULTS.md roofline) — recomputing the forward trades
    # cheap MXU flops for the dominant HBM activation traffic.  The
    # opposite verdict from the conv heads, where remat measured slower.
    remat: bool = False
    dtype: Any = jnp.float32
    favor_precision: str = "highest"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 deterministic=None):
        if deterministic is None:
            deterministic = not train
        b, H, W, C = x.shape
        p = self.patch_pix
        emb = self.emb_s * self.heads
        tokens_cnt = (self.image_pix // p) ** 2
        # Unfold patchify: [B, T, p*p*C] with torch's channel-major
        # element order inside each patch (C, ph, pw).
        patches = x.reshape(b, H // p, p, W // p, p, C)
        patches = patches.transpose(0, 1, 3, 5, 2, 4).reshape(
            b, tokens_cnt, C * p * p)
        pos = self.param("pos_emb", nn.initializers.zeros,
                         (1, tokens_cnt, emb))
        tok = _torch_linear_dense(emb, C * p * p, self.dtype,
                                  "patch_emb")(patches)
        tok = tok + pos
        cls = self.param("cls_token", nn.initializers.uniform(1.0),
                         (1, 1, emb))
        tok = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, emb)), tok], axis=1)
        # Sequence parallelism: anchor the 3137-token stream to the
        # ``seq`` mesh axis when one is live (identity otherwise).
        # FAVOR+'s only cross-token math is two moment reductions per
        # block (sum_t kp, kp^T v) — O(m*d) psums independent of T —
        # so SP shards the dominant [B,T,emb] activation traffic at
        # near-zero collective cost (parallel/sharding_rules.py).
        from scat_tpu.parallel.sharding_rules import shard_tokens
        tok = shard_tokens(tok)
        # nn.remat leaves the parameter tree untouched (same block
        # names), so checkpoints are interchangeable across the flag
        block_cls = (nn.remat(PerformerBlock, static_argnums=(2,))
                     if self.remat else PerformerBlock)
        for i in range(self.depth):
            tok = block_cls(self.emb_s, self.heads,
                            self.kernel_ratio, self.dropout,
                            self.use_pallas, self.dtype,
                            self.favor_precision,
                            name=f"block_{i}")(tok, deterministic)
            tok = shard_tokens(tok)  # re-anchor across block boundaries
        feat = tok.mean(axis=1).astype(jnp.float32)
        pred = jnp.broadcast_to(
            self.mean_params.astype(jnp.float32)[:self.out_dim],
            (b, self.out_dim))
        head = _torch_linear_dense(self.out_dim, emb + self.out_dim,
                                   jnp.float32, "head")
        for _ in range(self.iteration):
            pred = pred + head(jnp.concatenate([feat, pred], axis=1))
        return pred, feat
