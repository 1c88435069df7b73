"""Whole-image ViT regressor (``--net ViT``).

Reference models/vision_transformer.py:103-153: einops patchify ->
linear patch embed -> cls token + learned pos-embed -> pyramid
transformer -> token mean-pool -> HMR iterative head
``pred += head(cat(feat, pred))`` from the mean params.

Also :class:`YunqianTransformer` (reference models/vit.py:71-101): a
plain non-pyramid transformer + LayerNorm+Linear head to out_dim=61 —
standalone, unused by the drivers but part of the component inventory.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from scat_tpu.models.transformer import Attention, PyramidTransformer


class ViT(nn.Module):
    """reference vision_transformer.py:103-153."""

    mean_params: jax.Array
    image_size: int = 224
    patch_size: int = 16
    num_classes: int = 66       # head output dim (66 = cam + joints)
    dim: int = 256
    depth: int = 3
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 512
    dropout: float = 0.0
    emb_dropout: float = 0.0
    iteration: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = True,
                 deterministic=None):
        if deterministic is None:
            deterministic = not train
        p = self.patch_size
        b, H, W, C = img.shape
        n = (H // p) * (W // p)
        # 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)' on NCHW == patch rows
        # ordered (p1, p2, c) — replicate from NHWC:
        x = img.reshape(b, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, n, p * p * C)
        x = nn.Dense(self.dim, dtype=self.dtype,
                     name="patch_to_embedding")(x)
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        x = x + pos[:, : n + 1]
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)
        # Sequence parallelism: anchor the 197-token stream to a live
        # ``seq`` mesh axis (identity without one).  Softmax attention
        # under a token-sharded Q becomes Megatron-style context
        # parallelism: GSPMD all-gathers K/V per block and every other
        # op stays token-local (parallel/sharding_rules.py).
        from scat_tpu.parallel.sharding_rules import shard_tokens
        x = shard_tokens(x)
        x = PyramidTransformer(
            dim=self.dim, depth=self.depth, heads=self.heads,
            dim_head=self.dim_head, mlp_dim=self.mlp_dim,
            dropout=self.dropout, dtype=self.dtype,
            name="transformer")(x, deterministic=deterministic)
        x = shard_tokens(x)  # re-anchor for the pooled head
        feat = x.mean(axis=1).astype(jnp.float32)
        pred = jnp.broadcast_to(
            self.mean_params.astype(jnp.float32)[:self.num_classes],
            (b, self.num_classes))
        head = nn.Dense(self.num_classes, name="head")
        for _ in range(self.iteration):
            pred = pred + head(jnp.concatenate([feat, pred], axis=1))
        return pred, feat


class YunqianTransformer(nn.Module):
    """Plain (non-pyramid) transformer + LN/Linear head to 61
    (reference models/vit.py:71-101)."""

    dim: int = 256
    depth: int = 3
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 512
    out_dim: int = 61
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        # Reference vit.py:71-85: Residual wraps Attention/FeedForward
        # DIRECTLY — vit.py defines a PreNorm class but never uses it
        # (unlike vision_transformer.py), and its Attention scales dots
        # by dim**-0.5 (vit.py:41), not dim_head**-0.5.  Both pinned by
        # tests/test_literal_reference.py::test_literal_yunqian.
        for i in range(self.depth):
            y = Attention(self.dim, heads=self.heads,
                          dim_head=self.dim_head, dropout=self.dropout,
                          dtype=self.dtype,
                          scale_override=self.dim ** -0.5,
                          name=f"attn_{i}")(
                              x, deterministic=deterministic)
            x = x + y
            y = nn.Dense(self.mlp_dim, dtype=self.dtype,
                         name=f"ff_{i}_1")(x)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            y = nn.Dense(self.dim, dtype=self.dtype, name=f"ff_{i}_2")(y)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = x + y
        x = nn.LayerNorm(name="head_norm")(x)
        return nn.Dense(self.out_dim, name="head")(x)
