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


def epoch_order(dataset, n: int) -> Tuple[np.ndarray, int]:
    """(permutation over ``n`` samples, epoch index) for this pass.

    ``dataset`` provides ``.shuffle`` / ``.seed`` and carries the
    ``_epoch`` counter; the permutation is a pure function of
    (seed, epoch) so runs are reproducible.
    """
    epoch = getattr(dataset, "_epoch", 0)
    dataset._epoch = epoch + 1
    order = np.arange(n)
    if dataset.shuffle:
        np.random.RandomState(
            dataset.seed + EPOCH_STRIDE * epoch).shuffle(order)
    return order, epoch
