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


from functools import partial

from scat_tpu.ops.geometry import rodrigues_guarded


@partial(jax.jit, static_argnums=(1, 2, 4))
def _synth_batch_impl(key: jax.Array, batch_size: int, image_size: int,
                      template: jax.Array, layout: str = "stb"
                      ) -> Dict[str, jax.Array]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # learnable pose: a global rotation of the template + small jitter
    # (rotation is recoverable from the rendered pattern; iid jitter
    # alone would make the image->3D map ill-posed)
    rotvec = jax.random.normal(k4, (batch_size, 3)) * 0.4
    R = rodrigues_guarded(rotvec)
    rotated = jnp.einsum("bij,nj->bni", R, template)
    jitter = jax.random.normal(k1, (batch_size, 21, 3)) * 0.002
    joints_3d = rotated + jitter
    joints_3d = joints_3d - joints_3d[:, 1:2]  # root-centered like labels
    scale = 5.0 + jax.random.normal(k2, (batch_size, 1)) * 0.3
    trans = jax.random.normal(k3, (batch_size, 2)) * 0.02
    cam = jnp.concatenate([scale, trans], axis=1)
    joints_2d = project_2d(batch_orth_proj_idrot(joints_3d, cam))

    # render per-joint-distinct blobs (size + per-channel intensity
    # encode joint identity, so the 2D assignment is learnable).
    # The LABELS stay in the 224-px projection contract (project_2d,
    # geometry.py) at every image_size; the renderer scales the blob
    # centers onto the actual canvas — otherwise small smoke-test sizes
    # (e.g. the 32-px multichip dryrun) draw everything off-canvas and
    # the images are uniformly blank, which turns train-mode BatchNorm
    # into a var~0 noise amplifier (observed: chaotic cross-topology
    # divergence in tests/test_multihost.py before this scaling).
    canvas_scale = image_size / 224.0
    blob_2d = joints_2d * canvas_scale
    j = jnp.arange(21, dtype=jnp.float32)
    sigma = jnp.maximum((3.0 + 0.35 * j) * canvas_scale, 0.75)[None, :,
                                                               None]
    ys = jnp.arange(image_size, dtype=jnp.float32)
    xs = jnp.arange(image_size, dtype=jnp.float32)
    dy = ys[None, None, :] - blob_2d[:, :, 1:2]   # [B,21,H]
    dx = xs[None, None, :] - blob_2d[:, :, 0:1]   # [B,21,W]
    gy = jnp.exp(-(dy ** 2) / (2 * sigma ** 2))
    gx = jnp.exp(-(dx ** 2) / (2 * sigma ** 2))
    chan = jnp.stack([0.3 + 0.7 * jnp.cos(j) ** 2,
                      0.3 + 0.7 * jnp.sin(j) ** 2,
                      0.3 + 0.7 * jnp.cos(2 * j) ** 2], axis=-1)  # [21,3]
    blobs = jnp.einsum("bjh,bjw,jc->bhwc", gy, gx, chan)
    images = jnp.clip(blobs, 0.0, 1.0) * 2.0 - 1.0  # [-1,1]

    if layout == "frei":
        # [cam3 | pose48 | shape10 | 3D63 | 2D42] = 166, the FreiHAND/
        # HO-3D contract (freihand.pack_label_166, reference
        # train.py:193-196).  The global rotation doubles as the pose's
        # global-orient dofs; local pose/shape are zero (the keypoint
        # loss reads only the 3D/2D views, losses.split_labels).
        pose48 = jnp.concatenate(
            [rotvec, jnp.zeros((batch_size, 45))], axis=1)
        labels = jnp.concatenate(
            [cam, pose48, jnp.zeros((batch_size, 10)),
             joints_3d.reshape(batch_size, 63),
             joints_2d.reshape(batch_size, 42)], axis=1)
    else:
        labels = jnp.concatenate(
            [joints_3d.reshape(batch_size, 63),
             joints_2d.reshape(batch_size, 42)], axis=1)
    return {"image": images, "label": labels,
            "valid": jnp.ones((batch_size,), jnp.float32)}


def synth_batch(key: jax.Array, batch_size: int, image_size: int = 224,
                mean_params: Optional[np.ndarray] = None,
                dtype=jnp.float32, layout: str = "stb"
                ) -> Dict[str, jax.Array]:
    """One deterministic batch: globally-rotated template joints,
    weak-persp projection, identity-coded blob rendering.  Jitted (the
    renderer is ~40 fused ops; eager dispatch would dominate step time).

    ``layout``: "stb" = 105-wide labels (3D+2D), "frei" = 166-wide
    (cam|pose|shape|3D|2D) — exercises the second width of the loss/eval
    label dispatch end-to-end.
    """
    if layout not in ("stb", "frei"):
        raise ValueError(f"layout must be 'stb' or 'frei', got {layout!r}")
    if mean_params is None:
        mean_params = assets.load_mean_params()
    template = jnp.asarray(mean_params[3:].reshape(21, 3))
    batch = _synth_batch_impl(key, batch_size, image_size, template,
                              layout)
    if dtype != jnp.float32:
        batch = dict(batch, image=batch["image"].astype(dtype))
    return batch


class SyntheticDataset:
    """Iterator with the reference loader's (image, label) contract."""

    def __init__(self, batch_size: int, num_batches: int = 16,
                 seed: int = 0, image_size: int = 224,
                 mean_params: Optional[np.ndarray] = None,
                 layout: str = "stb"):
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.seed = seed
        self.image_size = image_size
        self.layout = layout
        self.mean_params = (mean_params if mean_params is not None
                            else assets.load_mean_params())

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        base = jax.random.key(self.seed)
        # multi-host: each process draws a disjoint stream (its batch is
        # this host's shard of the global batch; identical streams would
        # train on duplicated data)
        from scat_tpu.data.common import _process_topology
        pi, pc = _process_topology()
        if pc > 1:
            base = jax.random.fold_in(base, pi)
        for i in range(self.num_batches):
            yield synth_batch(jax.random.fold_in(base, i),
                              self.batch_size, self.image_size,
                              self.mean_params, layout=self.layout)
