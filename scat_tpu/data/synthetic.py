"""Synthetic in-memory hand dataset.

The reference has no test fixtures (SURVEY.md §4); this module provides
the fake dataset the new framework's tests and benchmarks run on: 224x224
crops with Gaussian blobs at projected joint locations and analytic
105-wide labels (63 floats 3D + 42 floats 2D pixels, the STB layout,
reference load_STB.py:286-289).  Fully deterministic given a seed, and
generated entirely with jnp so batches can be produced on device.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu import assets
from scat_tpu.ops.geometry import batch_orth_proj_idrot, project_2d


def synth_batch(key: jax.Array, batch_size: int, image_size: int = 224,
                mean_params: Optional[np.ndarray] = None,
                dtype=jnp.float32) -> Dict[str, jax.Array]:
    """One deterministic batch: pose-perturbed template joints, weak-persp
    projection, blob rendering."""
    if mean_params is None:
        mean_params = assets.load_mean_params()
    template = jnp.asarray(mean_params[3:].reshape(21, 3))
    k1, k2, k3 = jax.random.split(key, 3)
    jitter = jax.random.normal(k1, (batch_size, 21, 3)) * 0.01
    joints_3d = template[None] + jitter
    joints_3d = joints_3d - joints_3d[:, 1:2]  # root-centered like labels
    scale = 5.0 + jax.random.normal(k2, (batch_size, 1)) * 0.3
    trans = jax.random.normal(k3, (batch_size, 2)) * 0.02
    cam = jnp.concatenate([scale, trans], axis=1)
    joints_2d = project_2d(batch_orth_proj_idrot(joints_3d, cam))

    # render blobs: image[y,x] peaks at each 2D joint
    ys = jnp.arange(image_size, dtype=jnp.float32)
    xs = jnp.arange(image_size, dtype=jnp.float32)
    dy = ys[None, None, :] - joints_2d[:, :, 1:2]   # [B,21,H]
    dx = xs[None, None, :] - joints_2d[:, :, 0:1]   # [B,21,W]
    gy = jnp.exp(-(dy ** 2) / (2 * 5.0 ** 2))
    gx = jnp.exp(-(dx ** 2) / (2 * 5.0 ** 2))
    blobs = jnp.einsum("bjh,bjw->bhw", gy, gx)
    img = jnp.clip(blobs, 0.0, 1.0) * 2.0 - 1.0     # [-1,1] like Normalize
    images = jnp.repeat(img[..., None], 3, axis=-1).astype(dtype)

    labels = jnp.concatenate(
        [joints_3d.reshape(batch_size, 63),
         joints_2d.reshape(batch_size, 42)], axis=1)
    return {"image": images, "label": labels,
            "valid": jnp.ones((batch_size,), jnp.float32)}


class SyntheticDataset:
    """Iterator with the reference loader's (image, label) contract."""

    def __init__(self, batch_size: int, num_batches: int = 16,
                 seed: int = 0, image_size: int = 224,
                 mean_params: Optional[np.ndarray] = None):
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.seed = seed
        self.image_size = image_size
        self.mean_params = (mean_params if mean_params is not None
                            else assets.load_mean_params())

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        base = jax.random.key(self.seed)
        for i in range(self.num_batches):
            yield synth_batch(jax.random.fold_in(base, i),
                              self.batch_size, self.image_size,
                              self.mean_params)
