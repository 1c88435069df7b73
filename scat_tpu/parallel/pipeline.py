"""Pipeline parallelism over homogeneous transformer blocks.

GPipe-style schedule expressed TPU-natively: ``shard_map`` over a
``pipe`` mesh axis, each device holding a contiguous stage of
``depth/S`` blocks (their stacked parameters sharded on the leading
layer axis), and a ``lax.scan`` over ``M + S - 1`` ticks rotating
microbatch activations stage-to-stage with ``ppermute`` — the
collective rides ICI neighbor links, never a global reduction.  The
whole schedule (fill, steady state, drain) is one compiled XLA program
and is differentiable end-to-end (``ppermute`` transposes to the
reverse rotation), so the same executor serves forward and backward.

The reference has no distributed training at all (SURVEY.md §2.10);
at this model family's scale (~30 M params, depth 3-4) pipeline
parallelism is a capability demonstration, not a necessity — the
executor is generic over any residual block stack with matching
input/output shapes (ViP's PerformerBlock, YunqianTransformer layers).
Dim-changing stacks (the pyramid transformer halves token dim per
layer) are rejected: stages must be shape-homogeneous to rotate.

Bubble accounting: utilization = M / (M + S - 1) — pick microbatch
count M >= 4*S to keep the bubble under ~20%.

Memory model: what pipelining shrinks per device is the STAGE — each
device holds 1/S of the layer weights and exactly one in-flight
microbatch activation.  The microbatch input stream and the output
buffer are replicated over ``pipe`` (SPMD shard_map needs uniform
shapes; only stage 0 reads the stream, only stage S-1 writes outputs)
— both shard over ``data`` instead.  For token streams at this model
family's scale that replication is a few MB; a weight-bound model is
exactly the case PP serves.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from scat_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS

P = jax.sharding.PartitionSpec


def stack_layer_vars(variables: Dict[str, Any], prefix: str,
                     depth: int) -> Dict[str, Any]:
    """Stack per-layer flax collections into one leading-[depth] pytree.

    ``variables`` holds collections keyed ``{col: {f"{prefix}{i}": ...}}``
    (e.g. ViP's ``params`` and frozen FAVOR+ ``constants`` per block);
    the result is ``{col: stacked}`` with every leaf gaining a leading
    layer axis — the form the pipeline shards over ``pipe``."""
    layers = []
    for i in range(depth):
        name = f"{prefix}{i}"
        lv = {col: variables[col][name] for col in variables
              if isinstance(variables[col], dict) and name in variables[col]}
        if not lv:
            raise ValueError(f"no collection carries layer {name!r}")
        layers.append(lv)
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def pipeline_apply(layer_fn: Callable[[Any, jax.Array], jax.Array],
                   stacked_vars: Any, x: jax.Array,
                   mesh: jax.sharding.Mesh,
                   num_microbatches: int) -> jax.Array:
    """Run ``depth`` layers over ``x`` pipelined across the ``pipe`` axis.

    ``layer_fn(layer_vars, x) -> x`` applies ONE block (input/output
    shapes must match); ``stacked_vars`` carries the leading layer axis
    from :func:`stack_layer_vars`.  ``x`` is the [B, ...] activation
    batch, split into ``num_microbatches`` along axis 0.  Composes with
    a ``data`` mesh axis: microbatch rows shard over ``data``, stages
    over ``pipe``.  Differentiable w.r.t. ``stacked_vars`` and ``x``.
    """
    if PIPE_AXIS not in mesh.shape:
        raise ValueError(f"mesh {mesh.shape} has no '{PIPE_AXIS}' axis")
    S = mesh.shape[PIPE_AXIS]
    depth = jax.tree_util.tree_leaves(stacked_vars)[0].shape[0]
    if depth % S:
        raise ValueError(f"depth {depth} must divide over pipe={S}")
    M = num_microbatches
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} must divide into {M} microbatches")
    xs = x.reshape(M, B // M, *x.shape[1:])

    data_size = mesh.shape.get(DATA_AXIS, 1)
    if (B // M) % data_size:
        raise ValueError(
            f"microbatch rows ({B}/{M}={B // M}) must divide over the "
            f"data axis ({data_size})")
    bspec = DATA_AXIS if data_size > 1 else None
    x_spec = P(None, bspec)
    var_spec = P(PIPE_AXIS)
    out_spec = P(PIPE_AXIS, None, bspec)
    # open chain, not a ring: the S-1 -> 0 edge would carry a payload
    # stage 0 unconditionally overwrites by injection — skipping it
    # saves one microbatch-activation transfer per tick (and its
    # transpose in the backward).  ppermute zero-fills stage 0's
    # non-destination slot; injection replaces it before any use.
    ring = [(j, j + 1) for j in range(S - 1)]

    def stage(local_vars, xs_local):
        # SPMD per-device program: local_vars is this stage's
        # [depth/S, ...] slice; xs_local the microbatch stream.
        i = jax.lax.axis_index(PIPE_AXIS)
        # the carries become varying over every mesh axis inside the
        # loop (axis_index/ppermute vary over pipe; the injected
        # microbatches over data); type the init the same way or the
        # scan's carry types mismatch (shard_map VMA checking).
        # Initialize the activation carry with REAL data (microbatch 0),
        # not zeros: during the fill phase stages i > t run layer_fn on
        # a not-yet-live carry, and while the collect-mask keeps that
        # garbage out of the outputs (and its cotangent is exactly
        # zero), a block whose VJP is NON-FINITE off its input domain
        # (x/|x|, log, rsqrt) would poison the weight gradients through
        # 0 * NaN.  Real-data init keeps every primal on the block's
        # actual input distribution, so dead paths stay finite and
        # their zero cotangents truly vanish.
        state = jax.lax.pcast(xs_local[0], (PIPE_AXIS,), to="varying")
        out_axes = (PIPE_AXIS,) + ((DATA_AXIS,) if bspec else ())
        outputs = jax.lax.pcast(
            jnp.zeros(xs_local.shape, xs_local.dtype),
            out_axes, to="varying")

        def tick(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t during the fill+steady phase
            inject = xs_local[jnp.clip(t, 0, M - 1)]
            state = jnp.where(i == 0, inject, state)
            y, _ = jax.lax.scan(
                lambda c, lv: (layer_fn(lv, c), None), state, local_vars)
            # the LAST stage's y at tick t completes microbatch t-(S-1)
            out_t = jnp.clip(t - (S - 1), 0, M - 1)
            upd = jax.lax.dynamic_update_index_in_dim(outputs, y, out_t, 0)
            collect = jnp.logical_and(i == S - 1, t >= S - 1)
            outputs = jnp.where(collect, upd, outputs)
            # rotate activations one stage forward (S-1 -> 0 wraps; the
            # wrapped value is dead — stage 0 overwrites by injection)
            nxt = jax.lax.ppermute(y, PIPE_AXIS, ring)
            return (nxt, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(M + S - 1))
        # leading stage axis so out_specs can concatenate; only the
        # last stage's buffer holds the real results
        return outputs[None]

    out = jax.shard_map(stage, mesh=mesh,
                        in_specs=(var_spec, x_spec),
                        out_specs=out_spec)(stacked_vars, xs)
    return out[-1].reshape(x.shape)
