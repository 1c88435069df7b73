"""scat_tpu — a TPU-native (JAX/XLA/Pallas) hand-pose estimation framework.

A from-scratch rebuild of the capabilities of SCAT ("Stride Consistency with
Auto-regressive regressor and Transformer", ICCVW 2021, reference repo
tomguluson92/SCAT): weak-perspective camera + 21-joint 3D offset regression
from a single 224x224 RGB hand crop, via CNN backbone -> token transformer ->
HMR-style iterative regressor.

Design stance (TPU-first, not a port):
  * functional modules (flax.linen) with explicit PRNG threading,
  * one jitted train step (lax.scan for the iterative regressor),
  * jax.sharding.Mesh + NamedSharding data/model parallelism,
  * Pallas kernels for the hot attention path,
  * on-device fused preprocessing (crop/flip/rotate/normalize as
    gather+matmul) instead of per-sample PIL/cv2,
  * static shapes everywhere; the reference's dynamic empty-sample filter
    becomes a validity mask folded into losses and metrics.

Reference layout is documented in SURVEY.md; per-component reference
citations (file:line into /root/reference) live in each module docstring.
"""

__version__ = "0.5.0"

from scat_tpu.config import BaseOptions, Options  # noqa: F401
