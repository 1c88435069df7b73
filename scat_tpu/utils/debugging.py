"""Numerical sanity / consistency checks (SURVEY.md §5 "race detection /
sanitizers" replacement — the reference has none).

* :func:`check_jit_consistency` — jit-vs-eager output agreement for a
  pure function (catches tracing bugs, stale closures, donation hazards).
* :func:`assert_all_finite` — batched NaN/Inf audit over a pytree.
* :func:`check_determinism` — same PRNG key twice -> identical outputs
  (catches hidden host randomness like the reference's python-RNG token
  masking, hand_net.py:369-373).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def check_jit_consistency(fn: Callable, *args, atol: float = 1e-5,
                          rtol: float = 1e-5) -> None:
    eager = fn(*args)
    jitted = jax.jit(fn)(*args)
    for e, j in zip(jax.tree_util.tree_leaves(eager),
                    jax.tree_util.tree_leaves(jitted)):
        np.testing.assert_allclose(np.asarray(e, np.float32),
                                   np.asarray(j, np.float32),
                                   atol=atol, rtol=rtol)


def assert_all_finite(tree, name: str = "tree") -> None:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and \
                not np.all(np.isfinite(arr)):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name}: {bad[:10]}")


def check_determinism(fn: Callable[[jax.Array], object],
                      key: jax.Array) -> None:
    a = fn(key)
    b = fn(key)
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def count_params(params) -> int:
    return sum(int(np.prod(np.shape(p)))
               for p in jax.tree_util.tree_leaves(params))
