"""Optional tensor-parallel parameter sharding.

Capability parity needs no TP (the ~30M-param model fits one chip,
SURVEY.md §2.10), but the sharding story stays a *config change*: these
rules annotate large kernels over a ``model`` mesh axis and let GSPMD
insert the collectives.  Rules (applied only when the mesh has a
``model`` axis of size > 1):

  * Dense kernels [in, out]: shard ``out`` when divisible (column
    parallel); XLA all-gathers activations where needed.
  * Conv kernels [kh, kw, in, out]: shard output channels.
  * Everything else (biases, norms, small params): replicated.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scat_tpu.parallel.mesh import MODEL_AXIS


def param_partition_spec(path_leaf, leaf, model_size: int,
                         min_elems: int = 1 << 16) -> P:
    shape = np.shape(leaf)
    if np.prod(shape, dtype=np.int64) < min_elems:
        return P()
    if len(shape) == 2 and shape[1] % model_size == 0:
        return P(None, MODEL_AXIS)
    if len(shape) == 4 and shape[3] % model_size == 0:
        return P(None, None, None, MODEL_AXIS)
    return P()


def make_param_shardings(params: Any, mesh: Mesh,
                         min_elems: int = 1 << 16):
    """Pytree of NamedShardings for ``params`` under ``mesh``."""
    if MODEL_AXIS not in mesh.shape or mesh.shape[MODEL_AXIS] == 1:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params)
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, param_partition_spec(None, leaf, model_size,
                                       min_elems)),
        params)


def shard_params(params: Any, mesh: Mesh, min_elems: int = 1 << 16):
    """Place parameters onto the mesh under the TP rules."""
    shardings = make_param_shardings(params, mesh, min_elems)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
