"""Shared loader plumbing.

Every dataset here iterates with torch-DataLoader(shuffle=True)
semantics: each pass over the data advances an epoch counter and
derives a fresh deterministic permutation from (seed, epoch).  ONE
implementation of that dance (the 9973 epoch-stride constant, the
counter attribute, the permutation) so the scheme cannot drift between
the five loaders (stb/freihand/ho3d/mhp/rhd).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

EPOCH_STRIDE = 9973   # prime stride decorrelates per-epoch RNG streams


def _process_topology() -> Tuple[int, int]:
    """(process_index, process_count) — (0, 1) when JAX (or its
    distributed runtime) isn't initialized, so loaders stay importable
    and identical in single-host runs."""
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def local_batch_size(global_batch_size: int) -> int:
    """Per-host share of a global batch (multi-host training feeds each
    process ``1/process_count`` of every logical batch; ``shard_batch``
    reassembles them into one global array).  Single process: identity."""
    _, pc = _process_topology()
    if pc == 1:
        return global_batch_size
    if global_batch_size % pc:
        raise ValueError(
            f"--batch_size {global_batch_size} must divide evenly over "
            f"{pc} processes (each host feeds its own shard of the "
            "global batch)")
    return global_batch_size // pc


def host_shard(order: np.ndarray) -> np.ndarray:
    """This process's disjoint slice of a per-epoch sample order.

    Strided slice + truncation to a UNIFORM per-host length: every host
    must run the same number of steps per epoch or the lockstep
    collectives in the jitted train step deadlock on the host that got
    one extra batch.  Single process: identity."""
    pi, pc = _process_topology()
    if pc == 1:
        return order
    per_host = len(order) // pc
    return order[pi::pc][:per_host]


def num_batches(n_samples: int, batch_size: int) -> int:
    """Batches per epoch for THIS process: the host-sharded sample count
    over the (per-host) batch size.  Loaders' ``__len__`` must agree
    with the ``host_shard``-ed order their ``__iter__`` walks, or a
    multi-host run would slice past the local order and emit short
    batches.  Single process: the usual ``n // batch_size``."""
    _, pc = _process_topology()
    return (n_samples // pc) // batch_size


def epoch_order(dataset, n: int) -> Tuple[np.ndarray, int]:
    """(permutation over ``n`` samples, epoch index) for this pass.

    ``dataset`` provides ``.shuffle`` / ``.seed`` and carries the
    ``_epoch`` counter; the permutation is a pure function of
    (seed, epoch) so runs are reproducible.  Under multi-host training
    the permutation is identical on every host (same seed/epoch) and
    each host takes a disjoint ``host_shard`` of it — together the
    hosts cover the epoch exactly once, like a DistributedSampler.
    """
    epoch = getattr(dataset, "_epoch", 0)
    dataset._epoch = epoch + 1
    order = np.arange(n)
    if dataset.shuffle:
        np.random.RandomState(
            dataset.seed + EPOCH_STRIDE * epoch).shuffle(order)
    return host_shard(order), epoch
