"""Token-pyramid transformer — the SCAT core regressor.

Reference models/vision_transformer.py:13-101: depth-D encoder where each
non-final layer is ``Residual(PreNorm(MHSA))`` followed by a
*non-residual* ``PreNorm(FeedForward)`` whose output halves the token dim
(FFN hidden = (dim*3)//4, out = dim//2); the final layer is
``Residual(PreNorm(MHSA))`` then a raw ``FeedForward`` (no PreNorm) with
hidden (dim*3)//4 and out_dim 3.  With dim=784, depth=3: 784 -> 392 ->
196 -> 3, so 21 tokens in -> [B,21,3] per-joint XYZ out.

The attn-returning variant (reference vision_transformer_attn.py:88-113)
differs in residual wiring: ``x = PreNormAttn(attn_out) + x`` (post-norm
on the branch) and returns the last layer's softmax matrix.

Attention math runs through a pluggable impl: the default fused XLA
einsum path, or the Pallas flash kernel (scat_tpu.ops.pallas_attention)
selected via ``use_pallas``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                  scale: float, mask: Optional[jax.Array] = None,
                  return_attn: bool = False):
    """Softmax attention on [B,H,N,Dh] tensors (reference
    vision_transformer.py:59-79).  ``mask`` is a boolean [B,N] keep-mask;
    masked pairs get -finfo.max like the reference's masked_fill_."""
    dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                      precision=jax.lax.Precision.DEFAULT) * scale
    if mask is not None:
        pair = mask[:, None, :, None] & mask[:, None, None, :]
        mask_value = -jnp.finfo(dots.dtype).max
        dots = jnp.where(pair, dots, mask_value)
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                     precision=jax.lax.Precision.DEFAULT)
    if return_attn:
        return out, attn
    return out


class Attention(nn.Module):
    """Multi-head self-attention (reference vision_transformer.py:46-79)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    use_pallas: bool = False
    dtype: Any = jnp.float32
    # vit.py's Transformer scales dots by dim**-0.5 instead of the
    # head dim (reference vit.py:41 vs vision_transformer.py:51);
    # None keeps the standard dim_head**-0.5
    scale_override: Any = None

    @nn.compact
    def __call__(self, x, mask=None, return_attn: bool = False,
                 deterministic: bool = True):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = (dh ** -0.5 if self.scale_override is None
                 else float(self.scale_override))
        attn = None
        if self.use_pallas and not return_attn:
            from scat_tpu.ops.pallas_attention import flash_attention
            out = flash_attention(q, k, v, scale=scale, mask=mask)
        elif return_attn:
            out, attn = mha_reference(q, k, v, scale, mask,
                                      return_attn=True)
        else:
            out = mha_reference(q, k, v, scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if return_attn:
            return out, attn
        return out


class FeedForward(nn.Module):
    """Linear-GELU-Linear; out = dim//2 (pyramid) or explicit out_dim
    (reference vision_transformer.py:28-44)."""

    dim: int
    hidden_dim: int
    out_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = self.out_dim if self.out_dim is not None else self.dim // 2
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(out, dtype=self.dtype)(x)


class PyramidTransformer(nn.Module):
    """The dim-halving pyramid (reference vision_transformer.py:81-101).

    ``mlp_dim`` is accepted for signature parity but — like the
    reference — ignored: FFN hidden is always (dim*3)//4.
    """

    dim: int
    depth: int = 3
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 392
    dropout: float = 0.0
    out_dim: int = 3
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        dim = self.dim
        for layer in range(self.depth):
            final = layer == self.depth - 1
            y = nn.LayerNorm(name=f"attn_norm_{layer}")(x)
            y = Attention(dim, heads=self.heads, dim_head=self.dim_head,
                          dropout=self.dropout, use_pallas=self.use_pallas,
                          dtype=self.dtype, name=f"attn_{layer}")(
                              y, mask, deterministic=deterministic)
            x = y + x  # Residual(PreNorm(Attention))
            if final:
                # raw FeedForward, no PreNorm, out_dim=3 (ref :89)
                x = FeedForward(dim, (dim * 3) // 4, out_dim=self.out_dim,
                                dtype=self.dtype, name=f"ff_{layer}")(x)
            else:
                # non-residual PreNorm FFN halving the dim (ref :92-96)
                y = nn.LayerNorm(name=f"ff_norm_{layer}")(x)
                x = FeedForward(dim, (dim * 3) // 4, dtype=self.dtype,
                                name=f"ff_{layer}")(y)
                dim = dim // 2
        return x


class PyramidTransformerAttn(nn.Module):
    """Attention-returning variant (reference vision_transformer_attn.py:
    88-113): ``x = PreNormAttn(attn_out) + x`` (post-norm on the branch),
    returns ``(x, attn_of_last_layer)``."""

    dim: int
    depth: int = 3
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 392
    dropout: float = 0.0
    out_dim: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        dim = self.dim
        attn = None
        for layer in range(self.depth):
            final = layer == self.depth - 1
            y, attn = Attention(dim, heads=self.heads,
                                dim_head=self.dim_head,
                                dropout=self.dropout, dtype=self.dtype,
                                name=f"attn_{layer}")(
                                    x, mask, return_attn=True,
                                    deterministic=deterministic)
            y = nn.LayerNorm(name=f"attn_norm_{layer}")(y)  # post-norm
            x = y + x
            if final:
                x = FeedForward(dim, (dim * 3) // 4, out_dim=self.out_dim,
                                dtype=self.dtype, name=f"ff_{layer}")(x)
            else:
                y = nn.LayerNorm(name=f"ff_norm_{layer}")(x)
                x = FeedForward(dim, (dim * 3) // 4, dtype=self.dtype,
                                name=f"ff_{layer}")(y)
                dim = dim // 2
        return x, attn


def sinusoidal_position_encoding(max_len: int, d_model: int,
                                 dtype=jnp.float32) -> jax.Array:
    """[max_len, d_model] sin/cos table (reference hand_net.py:61-77)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * (-jnp.log(10000.0) / d_model))
    angles = position * div_term
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles[:, : (d_model - d_model // 2)]))
    return pe.astype(dtype)


def random_token_mask(key: jax.Array, num_tokens: int, mask_rate: float
                      ) -> jax.Array:
    """Boolean [num_tokens] flag vector marking tokens to replace with the
    learned mask token.

    The reference draws ``int(mask_rate * n)`` distinct indices with
    python ``random.shuffle`` per forward call, shared across the batch
    (reference hand_net.py:369-373).  Here the same distribution comes
    from ``jax.random.permutation`` with an explicit key; masking is only
    applied when 0.1 <= mask_rate <= 0.9, like the reference.
    """
    k = int(mask_rate * num_tokens)
    perm = jax.random.permutation(key, num_tokens)
    flags = jnp.zeros((num_tokens,), bool).at[perm[:k]].set(True)
    return flags
