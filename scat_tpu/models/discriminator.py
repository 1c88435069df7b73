"""Motion discriminator: GRU over pose-parameter sequences.

Reference models/motion_discriminator.py:83-139: stacked GRU ->
pooling ("concat" avg+max over time / "attention" via a SelfAttention
MLP / last hidden state) -> FC(output_size), optional spectral norm.

TPU-first: the GRU runs as ``lax.scan`` over time via flax ``nn.RNN``
(one fused program, weights resident in VMEM across steps) instead of
cuDNN.  Spectral norm uses flax's power-iteration ``nn.SpectralNorm``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class SelfAttention(nn.Module):
    """MLP attention pooling (reference motion_discriminator.py:28-81)."""

    attention_size: int
    layers: int = 1
    dropout: float = 0.0
    non_linearity: str = "tanh"

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        act = nn.relu if self.non_linearity == "relu" else nn.tanh
        x = inputs
        for i in range(self.layers - 1):
            x = nn.Dense(self.attention_size, name=f"attn_{i}")(x)
            x = act(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        scores = nn.Dense(1, name="attn_out")(x)
        scores = act(scores)
        scores = nn.Dropout(self.dropout)(scores,
                                          deterministic=deterministic)
        scores = jax.nn.softmax(scores.squeeze(-1), axis=-1)
        weighted = inputs * scores[..., None]
        return weighted.sum(axis=1), scores


class MotionDiscriminator(nn.Module):
    """reference motion_discriminator.py:83-139; input
    [batch, seqlen, input_size] -> [batch, output_size]."""

    rnn_size: int
    input_size: int
    num_layers: int
    output_size: int = 2
    feature_pool: str = "concat"
    use_spectral_norm: bool = False
    attention_size: int = 1024
    attention_layers: int = 1
    attention_dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sequence: jax.Array, deterministic: bool = True,
                 update_sn_stats: bool = False):
        x = sequence
        for layer in range(self.num_layers):
            x = nn.RNN(nn.GRUCell(self.rnn_size, dtype=self.dtype),
                       name=f"gru_{layer}")(x)
        # x: [batch, seqlen, rnn_size]
        linear_size = (self.rnn_size * 2 if self.feature_pool == "concat"
                       else self.rnn_size)
        fc = nn.Dense(self.output_size, name="fc")
        if self.use_spectral_norm:
            fc = nn.SpectralNorm(fc)

        def apply_fc(h):
            if self.use_spectral_norm:
                return fc(h, update_stats=update_sn_stats)
            return fc(h)

        if self.feature_pool == "concat":
            h = nn.relu(x)
            avg_pool = h.mean(axis=1)
            max_pool = h.max(axis=1)
            return apply_fc(jnp.concatenate([avg_pool, max_pool], axis=1))
        elif self.feature_pool == "attention":
            y, _ = SelfAttention(self.attention_size,
                                 self.attention_layers,
                                 self.attention_dropout,
                                 name="attention")(x, deterministic)
            return apply_fc(y)
        else:
            return apply_fc(x[:, -1])
