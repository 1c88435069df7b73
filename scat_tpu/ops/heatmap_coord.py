"""Heatmap -> coordinate decoding, reference-API surface.

Thin wrappers with the reference's function names and array layouts
(reference data_utils/heatmap_coord.py:10-74) over the batched device
implementation in :mod:`scat_tpu.ops.heatmap`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from scat_tpu.ops.heatmap import heatmap_to_coords


def get_ave_xy(hmi: np.ndarray, n_points: int = 4, thresh: float = 0
               ) -> np.ndarray:
    """Weighted-average peak of ONE heatmap [H,W] -> (x, y)
    (reference heatmap_coord.py:10-31)."""
    assert hmi.ndim == 2
    coords = heatmap_to_coords(jnp.asarray(hmi)[None],
                               threshold_rel=0.5)[0]
    return np.asarray(coords)


def transfer_xy_coord(hm: np.ndarray, n_points: int = 64,
                      thresh: float = 0.2) -> np.ndarray:
    """All joints of one sample: [J,H,W] -> [J,2]
    (reference heatmap_coord.py:34-45)."""
    assert hm.ndim == 3
    return np.asarray(heatmap_to_coords(jnp.asarray(hm)))


def transfer_target(y_pred: np.ndarray, thresh: float = 0,
                    n_points: int = 64) -> np.ndarray:
    """Batched NHWC-style input [B,H,W,J] -> [B*J, 2] landmark array
    (reference heatmap_coord.py:48-74 layout)."""
    y_pred = np.transpose(np.asarray(y_pred), (0, 3, 1, 2))  # [B,J,H,W]
    out = np.asarray(heatmap_to_coords(jnp.asarray(y_pred)))
    return out.reshape(-1, 2)
