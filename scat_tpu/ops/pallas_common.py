"""Shared plumbing for the Pallas TPU kernels (attention, FAVOR+).

One force-interpret switch for BOTH kernels: Mosaic only lowers on TPU,
so interpret mode runs everywhere else (the CPU test platform), and
tests/debug sessions flip ``FORCE_INTERPRET`` once instead of touching
per-module state.
"""

from __future__ import annotations

import jax

FORCE_INTERPRET = False


def interpret_mode() -> bool:
    return FORCE_INTERPRET or jax.default_backend() != "tpu"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
