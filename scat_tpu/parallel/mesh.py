"""Device mesh + sharding layer (the reference has none — SURVEY.md
§2.10: DDP is imported but never constructed; training is single-device).

TPU-native scale-out design:
  * a ``jax.sharding.Mesh`` over the slice (1-D ``data`` axis by default;
    a ``model`` axis is accepted for future tensor parallelism — the
    ~30M-param model doesn't need TP for capability parity, so sharding
    rules keep params replicated and batch data-sharded),
  * batch arrays sharded on ``data``; gradients reduced by XLA's
    automatic ``psum`` under jit (replaces DDP allreduce),
  * BatchNorm statistics are computed over the full logical batch under
    GSPMD — cross-replica BN for free, no axis_name plumbing,
  * multi-host: ``jax.distributed.initialize`` + the same mesh over all
    processes (DCN between hosts, ICI within).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"      # sequence/context parallelism (token-axis sharding)
PIPE_AXIS = "pipe"    # pipeline parallelism over transformer depth


def make_mesh(mesh_shape: Optional[Sequence[Tuple[str, int]]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh; ``-1`` sizes absorb the remaining devices.

    Default: all devices on one ``data`` axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = ((DATA_AXIS, -1),)
    names = [name for name, _ in mesh_shape]
    sizes = [size for _, size in mesh_shape]
    unknown = [i for i, s in enumerate(sizes) if s == -1]
    known = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    if unknown:
        assert len(unknown) == 1, "at most one -1 axis"
        sizes[unknown[0]] = n // known
    assert int(np.prod(sizes)) == n, (
        f"mesh {list(zip(names, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_multiple(batch, multiple: int):
    """Pad the leading axis of every leaf up to a multiple of the data
    axis, marking padding rows invalid in the ``valid`` mask (the
    static-shape counterpart of the reference's dynamic batch slicing,
    SURVEY.md §2.2)."""
    leaves = jax.tree_util.tree_leaves(batch)
    if not leaves:
        return batch
    n = leaves[0].shape[0]
    rem = n % multiple
    if rem == 0:
        return batch
    pad = multiple - rem

    def pad_leaf(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    padded = {k: pad_leaf(v) for k, v in batch.items()}
    valid = padded.get("valid")
    if valid is None:
        valid = jnp.ones((n + pad,), jnp.float32)
    valid = valid.at[n:].set(0.0)
    padded["valid"] = valid
    return padded


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, batch-axis sharded.
    Batches whose leading dim doesn't divide the data axis are padded
    with masked samples.

    Multi-host: ``batch`` is this PROCESS'S SHARD of the logical batch
    (each host's loader walks a disjoint ``data.common.host_shard`` of
    the epoch; ``data.common.local_batch_size`` sizes it).  The shards
    assemble into one global array via explicit per-device H2D copies
    (``_assemble_global``) — no cross-host copy; each host's rows land
    on its own devices, in ``jax.devices()`` process order.  A plain
    ``device_put`` would be wrong here: the sharding spans devices this
    process cannot address.
    """
    pc = jax.process_count()
    data_size = mesh.shape[DATA_AXIS]
    if pc > 1 and data_size % pc:
        raise ValueError(
            f"data axis ({data_size}) must divide evenly over "
            f"{pc} processes")
    local_shards = data_size // pc if pc > 1 else data_size
    if isinstance(batch, dict):
        # pad the LOCAL batch to the local shard count — every host
        # pads identically (uniform local batch), keeping per-device
        # shard shapes globally consistent
        batch = pad_batch_to_multiple(batch, local_shards)
    sh = batch_sharding(mesh)
    if pc > 1:
        # assemble from explicit per-device H2D copies — GUARANTEED
        # collective-free.  make_array_from_process_local_data may
        # decide to reshard (a compiled program WITH collectives); the
        # prefetch thread calls this concurrently with the train step's
        # collectives, and two programs' collectives interleaving across
        # processes in different orders crosses their payloads (observed
        # as Gloo 'received data size doesn't match expected size').
        def to_local(x):
            # device-resident leaves (e.g. jitted synthetic batches)
            # stay on device and slice there — np.asarray would add a
            # full D2H roundtrip per leaf per step; the slice/device_put
            # programs are single-device local (no collectives), so they
            # are prefetch-thread-safe like the H2D copies
            if isinstance(x, jax.Array) and x.is_fully_addressable:
                return x
            return np.asarray(x)
        return jax.tree_util.tree_map(
            lambda x: _assemble_global(sh, to_local(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def _local_row_base(row_slices, n_local_rows: int) -> int:
    """Validate this process's global batch-row window is exactly its
    contiguous local block and return its start.

    e.g. ``--mesh_shape model:2,data:4`` on 2 hosts x 4 devices passes
    the divisibility check but each process's devices span ALL data
    blocks while its loader holds only its own rows — fail with the
    config fix instead of a shard-shape mismatch deep in the prefetch
    thread."""
    base = min((s.start or 0) for s in row_slices)
    top = max(s.stop for s in row_slices)
    if top - base != n_local_rows:
        raise ValueError(
            f"this process's devices cover global batch rows "
            f"[{base}, {top}) but the host loader holds "
            f"{n_local_rows} rows: the '{DATA_AXIS}' mesh axis must "
            f"be the process-major (leading) axis so each host's rows "
            f"are a contiguous block — reorder --mesh_shape to put "
            f"'{DATA_AXIS}' first")
    return base


def _assemble_global(sh: NamedSharding, local):
    """Build a global batch-sharded array from this process's local
    rows (numpy, or an already-local ``jax.Array``): slice per
    addressable device, place each slice, wrap with
    ``make_array_from_single_device_arrays``.  No global program, no
    collective — safe to run on a background thread."""
    pc = jax.process_count()
    global_shape = (local.shape[0] * pc,) + local.shape[1:]
    imap = sh.addressable_devices_indices_map(global_shape)
    # this process owns a contiguous row block in jax.devices() order;
    # rebase the global row indices onto the local array
    base = _local_row_base(
        [idx[0] for idx in imap.values()], local.shape[0])
    bufs = [
        jax.device_put(local[(idx[0].start or 0) - base:
                             idx[0].stop - base], d)
        for d, idx in imap.items()]
    return jax.make_array_from_single_device_arrays(
        global_shape, sh, bufs)


def _put_global(x, sh: NamedSharding):
    """``device_put`` onto a (possibly multi-host) sharding.

    Single process: direct.  Multi-process: ``device_put`` onto a
    sharding spanning non-addressable devices accepts HOST values but
    not committed device arrays, so leaves are converted first; typed
    PRNG keys detour through key_data/wrap (no numpy representation
    exists for extended dtypes).  Every process must hold the same
    host-side value (same init seed) — each leaf becomes one global
    array."""
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        impl = jax.random.key_impl(x)
        data = jax.device_put(
            np.asarray(jax.random.key_data(x)), sh)
        return jax.random.wrap_key_data(data, impl=impl)
    return jax.device_put(np.asarray(x), sh)


def replicate_state(mesh: Mesh, state):
    """Replicate a train-state pytree across the mesh (multi-host safe,
    see ``_put_global``)."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _put_global(x, sh), state)


def jit_train_step(train_step, mesh: Mesh, donate_state: bool = True):
    """Jit a ``(state, batch) -> (state, stats)`` step with data-parallel
    input/output shardings pinned (params replicated, batch sharded).

    XLA inserts the gradient all-reduce automatically; BN statistics are
    global because the batch is one logical array.
    """
    state_sh = replicated(mesh)
    batch_sh = batch_sharding(mesh)
    jitted = jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,) if donate_state else (),
    )
    if needs_mesh_context(mesh):
        jitted = MeshContextStep(jitted, mesh)
    return jitted


def state_shardings(state):
    """The pytree of actual placements of an already-placed state."""
    return jax.tree_util.tree_map(lambda x: x.sharding, state)


def jit_train_step_sharded(train_step, mesh: Mesh, state,
                           donate_state: bool = True):
    """Jit a step pinning the state to its CURRENT placement (e.g. an
    FSDP-sharded state from :func:`fsdp_state`) instead of forcing
    replication.  GSPMD turns the per-param placements into
    all-gather-before-use / reduce-scatter-of-grad; stats come out
    replicated."""
    st_sh = state_shardings(state)
    jitted = jax.jit(
        train_step,
        in_shardings=(st_sh, batch_sharding(mesh)),
        out_shardings=(st_sh, replicated(mesh)),
        donate_argnums=(0,) if donate_state else (),
    )
    if needs_mesh_context(mesh):
        jitted = MeshContextStep(jitted, mesh)
    return jitted


def fsdp_state(mesh: Mesh, state):
    """Re-place a train state FSDP-style: params shard over ``data``
    per ``sharding_rules.make_fsdp_shardings``; the Adam moments that
    mirror them take their param's placement (ZeRO); everything else
    (step, BN stats, PL-EMA, PRNG, schedule counts) replicates."""
    from scat_tpu.parallel import sharding_rules

    params_sh = sharding_rules.make_fsdp_shardings(state.params, mesh)
    rep = replicated(mesh)
    # Adam moments mirror the params TREE: place them by structure, not
    # by a (shape, dtype) lookup — on a hybrid FSDP+TP mesh two
    # same-shaped kernels can carry different TP placements and a
    # shape-keyed table would pin one param's moments to the other's
    # sharding.  Any opt-state subtree whose treedef equals the params'
    # takes the param shardings leaf-for-leaf; every other leaf
    # (counts, schedule scalars) replicates.
    params_treedef = jax.tree_util.tree_structure(state.params)

    def _is_params_like(x):
        return (params_treedef.num_leaves > 1
                and jax.tree_util.tree_structure(x) == params_treedef)

    opt_sh = jax.tree_util.tree_map(
        lambda x: params_sh if _is_params_like(x) else rep,
        state.opt_state, is_leaf=_is_params_like)

    # every placement goes through _put_global: multi-host, the leaves
    # here are device arrays (model.init / TrainState.create) and the
    # PRNG key is typed — device_put'ing those onto global shardings is
    # exactly what replicate_state documents as unsupported
    def place_rep(tree):
        return jax.tree_util.tree_map(
            lambda x: _put_global(x, rep), tree)

    return state.replace(
        params=jax.tree_util.tree_map(_put_global, state.params,
                                      params_sh),
        opt_state=jax.tree_util.tree_map(
            lambda x, sh: _put_global(x, sh), state.opt_state, opt_sh),
        batch_stats=place_rep(state.batch_stats),
        constants=place_rep(state.constants),
        step=_put_global(state.step, rep),
        pl_mean=_put_global(state.pl_mean, rep),
        rng=_put_global(state.rng, rep),
    )


def jit_eval_step(eval_step, mesh: Mesh):
    state_sh = replicated(mesh)
    batch_sh = batch_sharding(mesh)
    jitted = jax.jit(
        eval_step,
        in_shardings=(state_sh, state_sh, batch_sh),
    )
    if needs_mesh_context(mesh):
        jitted = MeshContextStep(jitted, mesh)
    return jitted


def host_local_rows(x) -> np.ndarray:
    """This process's rows of a (possibly multi-host) batch-sharded
    array, as numpy, in global row order.

    ``np.asarray`` on a multi-process sharded array raises (it spans
    devices this process cannot address) and a ``x[i]`` slice would
    dispatch a one-process program whose collectives cross other
    processes' in-flight steps (see ``Trainer._host_row0``); reading
    the addressable shards is the only safe path.  Fully-addressable
    arrays (single process) convert directly."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        parts, last = [], None
        for s in shards:
            # the dim-0 dedup below assumes batch-(dim 0)-only sharding;
            # a shard split on ANY other dim would be silently dropped
            # as a "replicated duplicate" (truncating that dim), so fail
            # loudly instead
            for d, sl in enumerate(s.index[1:], start=1):
                if (sl.start or 0) != 0 or (
                        sl.stop is not None and sl.stop != x.shape[d]):
                    raise ValueError(
                        "host_local_rows needs a batch-(dim 0)-sharded "
                        f"array; got a shard covering {s.index} of "
                        f"global {x.shape} (dim {d} is split) — "
                        "constrain the step's output sharding to "
                        "PartitionSpec('data') first")
            start = s.index[0].start or 0
            if start != last:  # skip replicated duplicates
                parts.append(np.asarray(s.data))
                last = start
        return np.concatenate(parts)
    return np.asarray(x)


def wait_for_all_processes(tag: str, timeout_ms: int = 1_800_000) -> None:
    """Coordination-service barrier (RPC only — no device collective).

    Used to re-align processes after per-host work of very different
    duration, above all first-touch XLA compiles: if host A finishes
    compiling the train step minutes before host B, A's first collective
    sits in the transport's connect window (Gloo: ~30 s) while B is
    still compiling, and the whole run dies with a connect timeout or
    crossed-collective payloads.  A device-collective barrier
    (multihost_utils.sync_global_devices) has the same problem — it IS
    a collective; the coordination client waits over RPC instead.
    No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed
    client = getattr(distributed.global_state, "client", None)
    if client is None:  # process_count>1 without the coord service
        return
    client.wait_at_barrier(tag, timeout_in_ms=timeout_ms)


class CompileBarrierStep:
    """Multi-host wrapper for a jitted step: AOT-compile each new batch
    signature locally, rendezvous ALL processes at a coordination-service
    barrier, THEN dispatch — so the step's collectives start within
    milliseconds of each other on every host (see
    ``wait_for_all_processes`` for why compile skew is fatal).

    Donation/sharding semantics come from the wrapped jit;
    ``lower().compile()`` preserves them."""

    def __init__(self, jitted, tag: str):
        self._jitted = jitted
        self._tag = tag
        self._compiled = {}

    @staticmethod
    def _signature(batch):
        return tuple(sorted(
            (k, v.shape, str(v.dtype)) for k, v in batch.items()))

    def __call__(self, *args):
        # the batch dict is the last argument by step convention
        # (train: (state, batch); eval: (params, batch_stats, batch))
        sig = self._signature(args[-1])
        compiled = self._compiled.get(sig)
        if compiled is None:
            compiled = self._jitted.lower(*args).compile()
            wait_for_all_processes(f"{self._tag}:{len(self._compiled)}")
            self._compiled[sig] = compiled
        return compiled(*args)


class MeshContextStep:
    """Run a (jitted) step under ``jax.set_mesh(mesh)``.

    Bare-``PartitionSpec`` sharding constraints inside model code — the
    sequence-parallel ``sharding_rules.shard_tokens`` anchors — resolve
    against the AMBIENT abstract mesh at trace time; a jitted step
    traced without one silently drops them (they are identity).  This
    wrapper makes the ambient mesh part of the step object, so callers
    (trainer, dryrun, tests) don't have to wrap every call site.
    Execution of an already-compiled program doesn't need the context,
    but entering it is nanoseconds — keep every call uniform."""

    def __init__(self, fn, mesh: Mesh):
        self._fn = fn
        self._mesh = mesh

    def __call__(self, *args):
        with jax.set_mesh(self._mesh):
            return self._fn(*args)

    def lower(self, *args):
        """AOT lowering under the same ambient mesh (CompileBarrierStep
        composes on top for multi-host runs)."""
        with jax.set_mesh(self._mesh):
            return self._fn.lower(*args)


def needs_mesh_context(mesh: Mesh) -> bool:
    """True when models traced under ``mesh`` carry activation-sharding
    anchors that need an ambient mesh (any seq/pipe axis of size > 1)."""
    return (mesh.shape.get(SEQ_AXIS, 1) > 1
            or mesh.shape.get(PIPE_AXIS, 1) > 1)


def maybe_initialize_distributed() -> None:
    """Multi-host init (no-op single host).  Controlled by the standard
    JAX coordination env vars; replaces the reference's absent
    process-group bootstrap (SURVEY.md §2.10)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
