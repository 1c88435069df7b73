"""Gaussian heatmap rendering and heatmap -> coordinate decoding.

Reference implementations being matched:
  * CenterNet-style splat ``draw_umich_gaussian`` / ``gaussian2D``
    (reference dataset/utils.py:180-202): a (2r+1)^2 Gaussian with
    sigma = diameter/6, max-combined into the map at the int-cast
    center, clipped at the borders.
  * Weighted-average decode ``get_ave_xy``/``transfer_target``
    (reference data_utils/heatmap_coord.py:10-74).

Device versions are fully batched/vectorized: the splat evaluates the
Gaussian over the whole grid with a square radius mask (identical values
inside the box, zero outside, like the reference's windowed write).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def draw_gaussian_heatmaps(centers: jax.Array, height: int, width: int,
                           radius: int = 8, k: float = 1.0) -> jax.Array:
    """``centers`` [..., J, 2] (x, y) -> heatmaps [..., J, H, W].

    Matches draw_umich_gaussian: center int-cast, sigma=(2r+1)/6, values
    only within the square window |dx|<=r (right/bottom edges exclusive
    at radius+1 like the reference slicing), max with existing (maps
    start at zero, so max == write).
    """
    sigma = (2 * radius + 1) / 6.0
    # int() in the reference truncates TOWARD ZERO — floor would shift
    # the window one pixel for coordinates in (-1, 0) (a joint just off
    # the crop edge after rotation/flip)
    cx = jnp.trunc(centers[..., 0]).astype(jnp.int32)
    cy = jnp.trunc(centers[..., 1]).astype(jnp.int32)
    ys = jnp.arange(height)
    xs = jnp.arange(width)
    dy = ys[None, :] - cy[..., None]                    # [..., J, H]
    dx = xs[None, :] - cx[..., None]                    # [..., J, W]
    gy = jnp.exp(-(dy.astype(jnp.float32) ** 2) / (2 * sigma * sigma))
    gx = jnp.exp(-(dx.astype(jnp.float32) ** 2) / (2 * sigma * sigma))
    in_y = (dy >= -radius) & (dy <= radius)
    in_x = (dx >= -radius) & (dx <= radius)
    g = (gy * in_y)[..., :, None] * (gx * in_x)[..., None, :]
    return k * g


def heatmap_to_coords(heatmaps: jax.Array, threshold_rel: float = 0.5
                      ) -> jax.Array:
    """Weighted-average decode (reference heatmap_coord.py:10-45):
    pixels >= threshold_rel * max contribute coordinate * weight.
    ``heatmaps`` [..., J, H, W] -> [..., J, 2] (x, y)."""
    H, W = heatmaps.shape[-2:]
    peak = heatmaps.max(axis=(-2, -1), keepdims=True)
    w = jnp.where(heatmaps >= threshold_rel * peak, heatmaps, 0.0)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    # sign-preserving guard: all-negative maps (an untrained head) have
    # a negative weight sum that divides normally; only a near-zero sum
    # is degenerate and gets the reference's (-1, -1) sentinel
    raw = w.sum(axis=(-2, -1))
    degenerate = jnp.abs(raw) < 1e-8
    denom = jnp.where(degenerate, 1.0, raw)
    y = (w.sum(axis=-1) * ys).sum(axis=-1) / denom
    x = (w.sum(axis=-2) * xs).sum(axis=-1) / denom
    return jnp.where(degenerate[..., None], -1.0,
                     jnp.stack([x, y], axis=-1))
