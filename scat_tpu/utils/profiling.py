"""Tracing / profiling harness.

The reference captures t0..t6 wall-clock checkpoints around
data/forward/loss/backward and never reports them (reference
train.py:128-208); eval prints per-batch FPS (eval.py:955-957).  This
module is the structured replacement: device-synchronized step timing,
samples/sec/chip counters (the BASELINE metric), and a context manager
around ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


def enable_compilation_cache(path: str = "~/.cache/scat_tpu_xla"):
    """Persistent XLA compilation cache — first compiles of the fused
    train step take minutes on TPU; cached reruns are near-instant.
    Single source for the trainer and every benchmark script."""
    try:
        import os
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1)
    except Exception:
        pass


class StepTimer:
    """Rolling samples/sec + ms/step with correct device sync."""

    def __init__(self, batch_size: int, warmup: int = 1):
        self.batch_size = batch_size
        self.warmup = warmup
        self.reset()

    def reset(self):
        self._steps = 0
        self._t0 = None
        self._elapsed = 0.0

    def tick(self, result=None):
        """Call once per step with the step output (synced before the
        clock stops so async dispatch doesn't hide device time)."""
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        if self._steps >= self.warmup and self._t0 is not None:
            self._elapsed += now - self._t0
        self._t0 = now
        self._steps += 1

    @property
    def counted_steps(self) -> int:
        return max(self._steps - self.warmup, 0)

    @property
    def ms_per_step(self) -> float:
        n = self.counted_steps
        return self._elapsed / n * 1000 if n else float("nan")

    @property
    def samples_per_sec(self) -> float:
        n = self.counted_steps
        return (self.batch_size * n / self._elapsed
                if n and self._elapsed else float("nan"))

    def samples_per_sec_per_chip(self) -> float:
        return self.samples_per_sec / jax.device_count()


class TraceWindow:
    """Capture a ``jax.profiler`` trace of steps ``[start, start+n)``
    of a training loop (``--profile_trace_dir``); viewable in
    TensorBoard/XProf.  The window starts after the first steps so the
    trace shows steady-state device time, not compilation.  Syncs only
    at the window edges — no per-step overhead outside the window."""

    def __init__(self, log_dir: Optional[str], n_steps: int = 20,
                 start_step: int = 3):
        self._dir = log_dir or None
        self._start = start_step
        self._end = start_step + max(n_steps, 1)
        self._active = False
        self._captured = False
        self._done = self._dir is None

    def step(self, step: int, sync=None) -> None:
        """Call once per loop iteration with a monotonically increasing
        step counter (the trainer passes its 1-based global step, so
        the default window starts at the 3rd step)."""
        if self._done:
            return
        if not self._active and step >= self._start:
            if sync is not None:
                jax.block_until_ready(sync)
            jax.profiler.start_trace(self._dir)
            self._active = True
            self._captured = True
        elif self._active and step >= self._end:
            self.stop(sync)

    def stop(self, sync=None) -> None:
        """Idempotent; also safe when the loop ended inside the window."""
        if self._active:
            if sync is not None:
                jax.block_until_ready(sync)
            jax.profiler.stop_trace()
            self._active = False
        if self._dir is not None and not self._captured:
            # a short run can end before the window opens; an empty
            # trace dir with no explanation is a debugging trap
            print(f"WARNING: the run ended before step {self._start}; "
                  f"no profiler trace was captured in {self._dir}")
        self._done = True


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(fn: Callable, *args, iters: int = 20, warmup: int = 1,
                 batch_size: Optional[int] = None) -> Dict[str, float]:
    """Compile + time a jitted callable; returns ms/step and optional
    samples/sec figures."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(max(warmup - 1, 0)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    res = {"ms_per_step": dt / iters * 1000}
    if batch_size is not None:
        res["samples_per_sec"] = batch_size * iters / dt
        res["samples_per_sec_per_chip"] = (res["samples_per_sec"]
                                           / jax.device_count())
    return res
