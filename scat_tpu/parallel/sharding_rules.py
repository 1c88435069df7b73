"""Optional tensor-parallel parameter sharding.

Capability parity needs no TP (the ~30M-param model fits one chip,
SURVEY.md §2.10), but the sharding story stays a *config change*: these
rules annotate large kernels over a ``model`` mesh axis and let GSPMD
insert the collectives.  Rules (applied only when the mesh has a
``model`` axis of size > 1):

  * **Megatron pairing inside transformer blocks**: the QKV projection
    (``to_qkv``) and the FFN's first dense shard their OUTPUT dim
    (column parallel, splitting heads / hidden units); the attention
    output projection (``to_out``) and the FFN's second dense shard
    their INPUT dim (row parallel).  The intermediate activation stays
    model-sharded between the pair, so GSPMD emits ONE reduction per
    block (the row matmul's psum) instead of all-gathering every
    column output.
  * Other Dense kernels [in, out]: shard ``out`` when divisible
    (column parallel); XLA all-gathers activations where needed.
  * Conv kernels [kh, kw, in, out]: shard output channels.
  * Everything else (biases, norms, small params): replicated.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scat_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS

# module-name markers for the Megatron column/row pairs in the pyramid
# transformer (models/transformer.py: Attention's to_qkv/to_out; the
# FFN's two anonymous Dense layers are Dense_0/Dense_1 inside ff_*)
_COLUMN_MARKERS = ("to_qkv",)
_ROW_MARKERS = ("to_out",)


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for e in path:
        key = getattr(e, "key", None)
        if key is not None:
            names.append(str(key))
    return tuple(names)


def param_partition_spec(path, leaf, model_size: int,
                         min_elems: int = 1 << 16) -> P:
    shape = np.shape(leaf)
    if np.prod(shape, dtype=np.int64) < min_elems:
        return P()
    names = _path_names(path) if path else ()
    in_ff = any(n.startswith("ff_") for n in names)
    if len(shape) == 2:
        column = (any(m in names for m in _COLUMN_MARKERS)
                  or (in_ff and "Dense_0" in names))
        row = (any(m in names for m in _ROW_MARKERS)
               or (in_ff and "Dense_1" in names))
        if row and shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)
        if shape[1] % model_size == 0:
            return P(None, MODEL_AXIS)
        if column and shape[0] % model_size == 0:
            # fall back to row if the output dim doesn't divide (e.g.
            # the pyramid FFN's odd hidden dims)
            return P(MODEL_AXIS, None)
        return P()
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
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_partition_spec(path, leaf, model_size,
                                       min_elems)),
        params)


def shard_params(params: Any, mesh: Mesh, min_elems: int = 1 << 16):
    """Place parameters onto the mesh under the TP rules."""
    shardings = make_param_shardings(params, mesh, min_elems)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


# ---------------------------------------------------------------------
# Sequence (context) parallelism: activations sharded on the TOKEN axis
# over a ``seq`` mesh axis.  The long-token models anchor their token
# streams with ``shard_tokens`` (ViP: 3137 tokens at 224 px, ViT: 197);
# GSPMD propagates the sharding through the blocks and inserts the
# reductions where a contraction crosses tokens.  FAVOR+ is the ideal
# SP workload: its only cross-token math is ``sum_t kp`` and
# ``kp^T v`` — two psums of [m] / [m, d] moments per block, O(m*d)
# bytes on the wire regardless of sequence length (softmax attention
# under the same constraint all-gathers K/V instead — Megatron-style
# context parallelism).  Parameters stay replicated over ``seq``; the
# token-sharded gradients reduce into replicated weight grads
# automatically.
# ---------------------------------------------------------------------

def seq_axis_size() -> int:
    """Size of the ambient mesh's ``seq`` axis (1 when absent).

    Reads the ABSTRACT mesh that ``jax.set_mesh``/trace context
    provides, so model code can stay mesh-agnostic: without a live
    ``seq`` axis the sequence-parallel anchors are identity."""
    mesh = jax.sharding.get_abstract_mesh()
    shape = getattr(mesh, "shape", None) or {}
    return int(shape.get(SEQ_AXIS, 1) or 1)


def shard_tokens(x: jax.Array, token_axis: int = 1) -> jax.Array:
    """Anchor an activation's token axis to the ``seq`` mesh axis.

    No-op unless the trace runs under a mesh (``jax.set_mesh`` /
    ``mesh.MeshContextStep``) with a ``seq`` axis of size > 1.  All
    other dims are left UNCONSTRAINED so batch sharding (``data``)
    propagates through unchanged."""
    if seq_axis_size() <= 1:
        return x
    from jax.sharding import PartitionSpec as PS
    spec = [PS.UNCONSTRAINED] * x.ndim
    spec[token_axis] = SEQ_AXIS
    return jax.lax.with_sharding_constraint(x, PS(*spec))


# ---------------------------------------------------------------------
# FSDP (ZeRO-3 style): parameters AND optimizer moments sharded over the
# ``data`` axis; GSPMD all-gathers each weight just before use and
# reduce-scatters its gradient, so per-chip memory for params+Adam drops
# by ~the data-axis size while the training math stays bit-identical in
# structure to plain DP (same logical batch, same global BN).  The
# reference has no distributed training at all (SURVEY.md §2.10); this
# is the TPU-native counterpart of torch FSDP / ZeRO.
# ---------------------------------------------------------------------

def fsdp_partition_spec(path, leaf, data_size: int, model_size: int = 1,
                        min_elems: int = 1 << 14) -> P:
    """Spec sharding the largest free axis over ``data``.

    Starts from the TP spec (when the mesh has a model axis) and adds
    the ``data`` axis on the largest remaining dimension that divides,
    yielding hybrid FSDP+TP on 2-D meshes.  Small leaves (biases, norm
    scales) stay replicated — gathering them costs more than they hold.
    """
    shape = np.shape(leaf)
    base = (param_partition_spec(path, leaf, model_size)
            if model_size > 1 else P(*([None] * len(shape))))
    spec = list(base) + [None] * (len(shape) - len(base))
    if np.prod(shape, dtype=np.int64) < min_elems:
        return P(*spec)
    free = [i for i in range(len(shape)) if spec[i] is None]
    for i in sorted(free, key=lambda i: -shape[i]):
        if shape[i] % data_size == 0:
            spec[i] = DATA_AXIS
            break
    return P(*spec)


def make_fsdp_shardings(params: Any, mesh: Mesh,
                        min_elems: int = 1 << 14):
    """Pytree of NamedShardings placing ``params`` FSDP-style."""
    data_size = mesh.shape.get(DATA_AXIS, 1)
    model_size = mesh.shape.get(MODEL_AXIS, 1)
    if data_size == 1:
        return make_param_shardings(params, mesh)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, fsdp_partition_spec(path, leaf, data_size, model_size,
                                      min_elems)),
        params)
