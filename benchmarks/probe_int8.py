"""Probe: would int8 quantized inference beat bf16 on this chip?

v5e's MXU lists 2x int8 peak over bf16, so a quantized serving path
(per-channel weight scales + calibrated activation scales through the
ResNet) is the obvious candidate for the next inference-throughput
step.  Before building it, measure whether XLA actually delivers int8
conv speedups at THIS model's shapes (bs 96, ResNet-50 bottleneck
convs) — the repo rule is no path ships without a measured win
(see benchmarks/RESULTS.md, FAVOR+/token-head verdicts).

Timing methodology (two axon-tunnel traps, discovered here):
  1. ``jax.block_until_ready`` does NOT reliably block for small
     K-rolled scan programs on the tunnel backend — the value must be
     forced to host (``float(out)``) before the clock stops.
  2. The value fetch costs ~30 ms/launch fixed, so the per-op cost is
     the SLOPE between two K values (K=40 vs K=200), not a division.
  3. ``sum(conv(x, w))`` gets algebraically folded through the linear
     conv by XLA (reduce-through-conv rewrite) — consume outputs
     nonlinearly (``sum(abs(y))``) or the probe measures nothing.

Usage: PYTHONPATH=/root/repo python benchmarks/probe_int8.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("shape_x", "shape_w", "n", "dt",
                                   "acc"))
def rolled_conv(key, shape_x, shape_w, n, dt, acc):
    def body(c, k):
        if dt == jnp.int8:
            x = jax.random.randint(k, shape_x, -127, 127, jnp.int8)
            w = jax.random.randint(jax.random.fold_in(k, 1), shape_w,
                                   -127, 127, jnp.int8)
        else:
            x = jax.random.normal(k, shape_x, dt)
            w = jax.random.normal(jax.random.fold_in(k, 1), shape_w, dt)
        y = lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)
        # abs() blocks the reduce-through-conv simplification (trap 3)
        return c + jnp.sum(jnp.abs(y.astype(jnp.float32))), None

    s, _ = lax.scan(body, 0.0, jax.random.split(key, n))
    return s


def _t_launch(sx, sw, dt, acc, n, seed):
    t0 = time.perf_counter()
    float(rolled_conv(jax.random.key(seed), sx, sw, n, dt, acc))
    return (time.perf_counter() - t0) * 1000


def marginal_ms(sx, sw, dt, acc):
    """Per-conv cost via the K=40 vs K=200 slope (traps 1+2)."""
    for n in (40, 200):
        float(rolled_conv(jax.random.key(999), sx, sw, n, dt, acc))
    lo = sorted(_t_launch(sx, sw, dt, acc, 40, r) for r in range(3))[1]
    hi = sorted(_t_launch(sx, sw, dt, acc, 200, r + 10)
                for r in range(3))[1]
    return (hi - lo) / 160.0


def main():
    B = 96
    shapes = [  # (H, W, Cin, Cout, k): ResNet-50 bottleneck stages
        (56, 56, 64, 64, 3), (28, 28, 128, 512, 1),
        (14, 14, 256, 256, 3), (7, 7, 2048, 512, 1),
    ]
    print(f"{'shape':>26} | {'bf16 ms':>8} | {'int8 ms':>8} | "
          f"{'GFLOP':>6} | bf16 TF/s | int8 TOP/s | speedup")
    tot_b = tot_i = 0.0
    for (H, W, Ci, Co, k) in shapes:
        sx, sw = (B, H, W, Ci), (k, k, Ci, Co)
        gflop = 2 * B * H * W * Ci * Co * k * k / 1e9
        tb = marginal_ms(sx, sw, jnp.bfloat16, jnp.float32)
        ti = marginal_ms(sx, sw, jnp.int8, jnp.int32)
        tot_b += tb
        tot_i += ti
        print(f"{str((H, W, Ci, Co, k)):>26} | {tb:8.4f} | {ti:8.4f} | "
              f"{gflop:6.1f} | {gflop / tb:9.0f} | {gflop / ti:10.0f} "
              f"| {tb / ti:5.2f}x")
    print(f"sum over probed shapes: bf16 {tot_b:.3f} ms vs int8 "
          f"{tot_i:.3f} ms -> {tot_b / tot_i:.2f}x")


if __name__ == "__main__":
    main()
