"""Encoder heads: backbone -> token transformer -> iterative regressor.

Reference models/hand_net.py.  All heads predict ``pred_params`` =
``[B, 66]`` = camera(3: scale s, tx, ty) ++ 21x3 joint XYZ built from the
mean-template vector (scat_tpu.assets.build_mean_params), except the
61-dim MANO-parameter heads (HRNet/Inception/H3DW variants).

Flagship: :class:`EncoderTransformer` (reference hand_net.py:315-398)
  resnet50 5-tuple -> 1x1 conv 512->21 on x2 [B,28,28,512] -> 21 tokens
  x 784 -> sinusoidal PE -> random token masking with a learned mask
  token -> pyramid transformer -> [B,21,3] offsets -> mean + offsets ->
  iterative refinement ``pred += Linear(1024+66 -> 66)(cat(feat, pred))``
  -> root-center on joint index 1.  With ``pl_reg`` also returns
  d(sum feat_out)/d(conv map) via an in-graph vjp (the StyleGAN2-style
  path-length probe, reference hand_net.py:396).

TPU notes: tokens keep the reference's layout contract — token i is the
row-major flattening of conv channel i's 28x28 map; images and feature
maps are NHWC.  Everything (including the double-backward PL probe)
traces into one XLA program.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from scat_tpu.models import resnet as resnet_lib
from scat_tpu.models.transformer import (
    PyramidTransformer,
    PyramidTransformerAttn,
    random_token_mask,
    sinusoidal_position_encoding,
)


def _mask_tokens(module: nn.Module, tokens: jax.Array, mask_rate: float,
                 mask_token: jax.Array, deterministic: bool) -> jax.Array:
    """Replace a random subset of tokens with the learned mask token
    (reference hand_net.py:369-373).  Active only for
    0.1 <= mask_rate <= 0.9; one mask per step, shared across the batch
    like the reference's python-RNG masking."""
    if not (0.1 <= mask_rate <= 0.9) or deterministic:
        return tokens
    n = tokens.shape[1]
    key = module.make_rng("mask")
    flags = random_token_mask(key, n, mask_rate)
    return jnp.where(flags[None, :, None], mask_token.astype(tokens.dtype),
                     tokens)


def _feature_tokens(fmap_nhwc: jax.Array) -> jax.Array:
    """[B,H,W,C] conv map -> [B,C,H*W] tokens (channel-per-token layout,
    reference hand_net.py:363-364 ``view(bs, 21, -1)`` on NCHW)."""
    b, h, w, c = fmap_nhwc.shape
    return fmap_nhwc.transpose(0, 3, 1, 2).reshape(b, c, h * w)


class EncoderTransformer(nn.Module):
    """Primary SCAT head, ``--net reg_transformer``
    (reference hand_net.py:315-398)."""

    mean_params: jax.Array          # [66]
    iteration: int = 3
    heads: int = 8
    depth: int = 3
    mask_rate: float = 0.0
    pos_embed: bool = True
    pl_reg: bool = False
    num_tokens: int = 21
    token_dim: int = 784  # x2 spatial size squared (28*28 at 224 input)
    backbone: str = "resnet50"
    norm_layer: str = "batch"
    use_pallas: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.main_encoder = resnet_lib.get_model(
            self.backbone, dtype=self.dtype, norm_layer=self.norm_layer)
        self.conv1x1 = nn.Conv(self.num_tokens, (1, 1), use_bias=False,
                               dtype=self.dtype,
                               name="conv1x1_channel_reduction")
        self.transformer = PyramidTransformer(
            dim=self.token_dim, depth=self.depth, heads=self.heads,
            dim_head=64, mlp_dim=392, use_pallas=self.use_pallas,
            dtype=self.dtype)
        self.regressor = nn.Dense(66, name="regressor")
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0),
            (1, 1, self.token_dim))

    def _head(self, feat_visual: jax.Array, deterministic: bool
              ) -> jax.Array:
        """Conv map -> transformer offsets [B,63] (the PL-probe segment:
        everything between the 21-channel map and the summed output,
        reference hand_net.py:364-377,396)."""
        feat = _feature_tokens(feat_visual)  # [B,21,784]
        if self.pos_embed:
            pe = sinusoidal_position_encoding(
                self.num_tokens, self.token_dim, feat.dtype)
            feat = feat + pe[None]
        feat = _mask_tokens(self, feat, self.mask_rate, self.mask_token,
                            deterministic)
        out = self.transformer(feat, deterministic=deterministic)
        return out.reshape(out.shape[0], -1).astype(jnp.float32)

    def __call__(self, x: jax.Array, train: bool = True,
                 deterministic: Optional[bool] = None):
        if deterministic is None:
            deterministic = not train
        main_feat, x1, x2, x3, x4 = self.main_encoder(x, train=train)
        feat_visual = self.conv1x1(x2)  # [B,28,28,21]

        if self.pl_reg:
            feat_out, vjp_fn = nn.vjp(
                lambda mdl, fv: mdl._head(fv, deterministic),
                self, feat_visual, vjp_variables=False)
            cot = vjp_fn(jnp.ones_like(feat_out))
            pl_grad = cot[-1] if isinstance(cot, tuple) else cot
        else:
            feat_out = self._head(feat_visual, deterministic)
            pl_grad = None

        mean = jnp.broadcast_to(self.mean_params.astype(jnp.float32),
                                (x.shape[0], 66))
        pred = mean.at[:, 3:].add(feat_out)

        # HMR iterative refinement (reference hand_net.py:385-387);
        # `iteration` is static and tiny so the loop unrolls into the
        # XLA graph (the matmuls are 1090x66 — MXU noise).
        for _ in range(self.iteration):
            inp = jnp.concatenate([main_feat, pred], axis=1)
            pred = pred + self.regressor(inp)

        pred_3d = pred[:, 3:66].reshape(-1, 21, 3)
        pred_3d = pred_3d - pred_3d[:, 1:2]  # root-center (ref :389-393)
        pred = pred.at[:, 3:].set(pred_3d.reshape(-1, 63))

        if self.pl_reg:
            return pred, feat_visual, pl_grad
        return pred, feat_visual


class EncoderTransformerCoarse(nn.Module):
    """Attention-returning head, ``--net reg_transformer_coarse``
    (reference hand_net.py:216-311): no iterative joint loop; camera from
    a separate Linear(1024+3 -> 3); returns
    ``(pred, feat_visual, attn[, pl_grad])``."""

    mean_params: jax.Array
    heads: int = 8
    depth: int = 3
    mask_rate: float = 0.0
    pos_embed: bool = True
    pl_reg: bool = False
    num_tokens: int = 21
    token_dim: int = 784
    backbone: str = "resnet50"
    dtype: Any = jnp.float32

    def setup(self):
        self.main_encoder = resnet_lib.get_model(self.backbone,
                                                 dtype=self.dtype)
        self.conv1x1 = nn.Conv(self.num_tokens, (1, 1), use_bias=False,
                               dtype=self.dtype,
                               name="conv1x1_channel_reduction")
        self.transformer = PyramidTransformerAttn(
            dim=self.token_dim, depth=self.depth, heads=self.heads,
            dim_head=64, mlp_dim=392, dtype=self.dtype)
        self.regressor = nn.Dense(3, name="regressor")
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0),
            (1, 1, self.token_dim))

    def _head(self, feat_visual: jax.Array, deterministic: bool):
        feat = _feature_tokens(feat_visual)
        if self.pos_embed:
            pe = sinusoidal_position_encoding(
                self.num_tokens, self.token_dim, feat.dtype)
            feat = feat + pe[None]
        feat = _mask_tokens(self, feat, self.mask_rate, self.mask_token,
                            deterministic)
        out, attn = self.transformer(feat, deterministic=deterministic)
        return out.reshape(out.shape[0], -1).astype(jnp.float32), attn

    def __call__(self, x: jax.Array, train: bool = True,
                 deterministic: Optional[bool] = None):
        if deterministic is None:
            deterministic = not train
        main_feat, x1, x2, x3, x4 = self.main_encoder(x, train=train)
        feat_visual = self.conv1x1(x2)

        if self.pl_reg:
            (feat_out, attn), vjp_fn = nn.vjp(
                lambda mdl, fv: mdl._head(fv, deterministic),
                self, feat_visual, vjp_variables=False, has_aux=False)
            cot = vjp_fn((jnp.ones_like(feat_out),
                          jnp.zeros_like(attn)))
            pl_grad = cot[-1] if isinstance(cot, tuple) else cot
        else:
            feat_out, attn = self._head(feat_visual, deterministic)
            pl_grad = None

        mean = jnp.broadcast_to(self.mean_params.astype(jnp.float32),
                                (x.shape[0], 66))
        pred = mean.at[:, 3:].add(feat_out)
        cameras = self.regressor(
            jnp.concatenate([main_feat, pred[:, :3]], axis=1))
        pred_3d = pred[:, 3:66].reshape(-1, 21, 3)
        pred_3d = pred_3d - pred_3d[:, 1:2]
        pred = pred.at[:, 3:].set(pred_3d.reshape(-1, 63))
        pred = pred.at[:, :3].set(cameras)

        if self.pl_reg:
            return pred, feat_visual, attn, pl_grad
        return pred, feat_visual, attn


class H3DWEncoder(nn.Module):
    """FrankMocap-style baseline, ``--net frankmocap``
    (reference hand_net.py:28-58): resnet50 feat -> ReLU/FC(1024)/ReLU ->
    fixed 3-step IEF loop from the 61-dim mean MANO params."""

    mean_params: jax.Array  # [61]
    backbone: str = "resnet50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True):
        main_feat, *_ = resnet_lib.get_model(
            self.backbone, dtype=self.dtype)(x, train=train)
        feat = nn.relu(main_feat)
        feat = nn.Dense(1024, name="fc2")(feat)
        feat = nn.relu(feat)
        pred = jnp.broadcast_to(self.mean_params.astype(jnp.float32),
                                (x.shape[0], 61))
        regressor = nn.Dense(61, name="regressor")
        for _ in range(3):
            pred = pred + regressor(
                jnp.concatenate([feat, pred], axis=1))
        return feat, pred


def _reinterpret_channels(fmap_nhwc: jax.Array, new_c: int) -> jax.Array:
    """NCHW-style raw reinterpret of a feature map to a different
    channel/spatial factorization, matching the reference's ``.view``
    tricks (hand_net.py:123 [768,12,12]->[192,24,24] and :187
    [128,56,56]->[512,28,28]).  Returns NHWC."""
    b, h, w, c = fmap_nhwc.shape
    total = c * h * w
    assert total % new_c == 0
    hw = total // new_c
    side = int(round(hw ** 0.5))
    assert side * side == hw, f"non-square reinterpret {hw}"
    x = fmap_nhwc.transpose(0, 3, 1, 2).reshape(b, new_c, side, side)
    return x.transpose(0, 2, 3, 1)


class _TokenRegressorHead(nn.Module):
    """Shared 128-token head for the HRNet/Inception variants
    (reference hand_net.py:87-213): conv reduction -> 128 tokens -> PE ->
    masking -> pyramid transformer -> token mean-pool -> iterative
    Linear(-> 61) refinement from the 61-dim MANO mean params.

    Note: the reference declares the refinement regressor as
    Linear(196+61 -> 61) but feeds it the pyramid transformer's 3-dim
    mean-pooled output — a shape mismatch that would crash as shipped
    (hand_net.py:102,141-144).  Flax infers the actual input width, so
    this head is the working version of the declared architecture.
    """

    mean_params: jax.Array   # [61]
    iteration: int = 3
    heads: int = 8
    depth: int = 3
    mask_rate: float = 0.0
    pos_embed: bool = True
    num_tokens: int = 128
    token_dim: int = 196
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, tokens: jax.Array, deterministic: bool):
        if self.pos_embed:
            pe = sinusoidal_position_encoding(
                self.num_tokens, self.token_dim, tokens.dtype)
            tokens = tokens + pe[None]
        mask_token = self.param("mask_token", nn.initializers.normal(1.0),
                                (1, 1, self.token_dim))
        tokens = _mask_tokens(self, tokens, self.mask_rate, mask_token,
                              deterministic)
        out = PyramidTransformer(
            dim=self.token_dim, depth=self.depth, heads=self.heads,
            dim_head=64, mlp_dim=392, dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="transformer")(tokens, deterministic=deterministic)
        feat = out.mean(axis=1).astype(jnp.float32)
        pred = jnp.broadcast_to(self.mean_params.astype(jnp.float32),
                                (tokens.shape[0], 61))
        regressor = nn.Dense(61, name="regressor")
        for _ in range(self.iteration):
            pred = pred + regressor(
                jnp.concatenate([feat, pred], axis=1))
        return pred


class EncoderTransformerHRNet(nn.Module):
    """``--net backbone_hrnet`` (reference hand_net.py:150-213):
    HRNet(c=24, 128 joints) 56x56x128 map -> 512-channel reinterpret ->
    conv(512->128, k3 s2 p1) -> 128 tokens x 196 -> token head."""

    mean_params: jax.Array   # [61]
    iteration: int = 3
    heads: int = 8
    depth: int = 3
    mask_rate: float = 0.0
    pos_embed: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 deterministic: Optional[bool] = None):
        from scat_tpu.models.hrnet import HRNet
        if deterministic is None:
            deterministic = not train
        fmap = HRNet(c=24, nof_joints=128, dtype=self.dtype,
                     name="main_encoder")(x, train=train)
        fmap = _reinterpret_channels(fmap, 512)
        fmap = nn.Conv(128, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                       use_bias=False, dtype=self.dtype,
                       name="conv1x1_channel_reduction")(fmap)
        tokens = _feature_tokens(fmap)  # [B,128,tok]
        return _TokenRegressorHead(
            self.mean_params, self.iteration, self.heads, self.depth,
            self.mask_rate, self.pos_embed, tokens.shape[1],
            tokens.shape[2], self.dtype, use_pallas=self.use_pallas,
            name="head")(tokens, deterministic)


class EncoderTransformerInception(nn.Module):
    """``--net backbone_incepv3`` (reference hand_net.py:87-146):
    truncated Inception3 768x12x12 -> 192-channel reinterpret ->
    conv(192->128, k3 s2 p3) -> 128 tokens -> token head."""

    mean_params: jax.Array   # [61]
    iteration: int = 3
    heads: int = 8
    depth: int = 3
    mask_rate: float = 0.0
    pos_embed: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 deterministic: Optional[bool] = None):
        from scat_tpu.models.inception import Inception3
        if deterministic is None:
            deterministic = not train
        fmap = Inception3(dtype=self.dtype, name="main_encoder")(
            x, train=train)
        fmap = _reinterpret_channels(fmap, 192)
        fmap = nn.Conv(128, (3, 3), (2, 2), padding=[(3, 3), (3, 3)],
                       use_bias=False, dtype=self.dtype,
                       name="conv1x1_channel_reduction")(fmap)
        tokens = _feature_tokens(fmap)
        return _TokenRegressorHead(
            self.mean_params, self.iteration, self.heads, self.depth,
            self.mask_rate, self.pos_embed, tokens.shape[1],
            tokens.shape[2], self.dtype, use_pallas=self.use_pallas,
            name="head")(tokens, deterministic)


class H3DWJointsEncoder(nn.Module):
    """H3DW encoder + in-graph MANO decode to the 66-dim camera+joints
    contract, so the frankmocap baseline plugs into the same keypoint
    train/eval steps as the SCAT heads.

    The reference decodes outside the model (test.py:332-348 ->
    mano.py:280-391); fusing the decode keeps eval one XLA program.
    """

    mean_params: jax.Array   # [61]
    backbone: str = "resnet50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 deterministic: Optional[bool] = None):
        from scat_tpu.models import mano as mano_lib
        feat, pred = H3DWEncoder(self.mean_params, self.backbone,
                                 self.dtype, name="h3dw")(x, train=train)
        mano_model = mano_lib.ManoModel.from_data()
        cam = pred[:, :3]
        out = mano_lib.rot_pose_beta_to_mesh(
            mano_model, pred[:, 3:6], pred[:, 6:51], pred[:, 51:61])
        joints = out[:, :21].reshape(-1, 63)
        pred66 = jnp.concatenate([cam, joints], axis=1)
        return pred66, feat
