"""Probe: can a Pallas fused '1x1-conv link' beat XLA's decomposed
BN-apply -> conv1x1 -> BN-stats chain?

The link is the repeating unit around every 1x1 conv in a bottleneck:
    xn = relu(x * scale + shift)        # previous BN's apply
    y  = xn @ w                         # the 1x1 conv (pure matmul)
    s, ss = column sums of y, y^2       # this BN's statistics
XLA materializes xn and re-reads y for the stats (4 HBM passes over
activations); the fused kernel does one read of x and one write of y
with the prologue/epilogue free in VMEM (2 passes).

Decision gate for building the full fused-BN bottleneck: the kernel must
win by >20% on representative mid-network shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_fused_link.py
"""

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _link_kernel(x_ref, w_ref, scale_ref, shift_ref, y_ref, s_ref,
                 ss_ref):
    i = pl.program_id(1)   # M tile index (innermost grid dim)
    x = x_ref[...].astype(jnp.float32)
    scale = scale_ref[...].astype(jnp.float32)
    shift = shift_ref[...].astype(jnp.float32)
    xn = jnp.maximum(x * scale[None, :] + shift[None, :], 0.0)
    y = jax.lax.dot(xn.astype(jnp.bfloat16), w_ref[...],
                    preferred_element_type=jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    ps = jnp.sum(y, axis=0)
    pss = jnp.sum(y * y, axis=0)

    @pl.when(i == 0)
    def _init():
        s_ref[...] = ps
        ss_ref[...] = pss

    @pl.when(i != 0)
    def _acc():
        s_ref[...] += ps
        ss_ref[...] += pss


def fused_link(x, w, scale, shift, bm=None):
    """x [M,K] bf16, w [K,N] bf16, scale/shift [K] f32 ->
    (y [M,N] bf16, s [N] f32, ss [N] f32)."""
    M, K = x.shape
    N = w.shape[1]
    if bm is None:  # largest MXU-aligned tile that divides M exactly
        bm = next(b for b in (4096, 2048, 1024, 896, 784, 512, 256, 128)
                  if M % b == 0)
    assert M % bm == 0, (M, bm)
    grid = (N // min(N, 512), M // bm)
    bn = N // grid[0]
    return pl.pallas_call(
        _link_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda j, i: (i, 0)),
            pl.BlockSpec((K, bn), lambda j, i: (0, j)),
            pl.BlockSpec((K,), lambda j, i: (0,)),
            pl.BlockSpec((K,), lambda j, i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda j, i: (i, j)),
            pl.BlockSpec((bn,), lambda j, i: (j,)),
            pl.BlockSpec((bn,), lambda j, i: (j,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((N,), jnp.float32),
            jax.ShapeDtypeStruct((N,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, w, scale, shift)


def xla_link(x, w, scale, shift):
    xn = jnp.maximum(x.astype(jnp.float32) * scale + shift, 0.0)
    y = jax.lax.dot(xn.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32).astype(
                        jnp.bfloat16)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, 0), jnp.sum(yf * yf, 0)


def timed(f, args, K=30):
    def prog(seed):
        def body(i, acc):
            y, s, ss = f(args[0] * (1 + 0.001 * jnp.float32(i + seed)),
                         *args[1:])
            return acc + jnp.sum(s) + jnp.sum(y[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, 0.0)
    g = jax.jit(prog)
    jax.block_until_ready(g(jnp.float32(0)))
    t0 = time.perf_counter()
    jax.block_until_ready(g(jnp.float32(1)))
    return (time.perf_counter() - t0) / K * 1000


def main():
    from scat_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    shapes = [  # (M, K, N) — bottleneck 1x1s at bs 96
        (96 * 56 * 56, 256, 64),    # layer1 conv1
        (96 * 56 * 56, 64, 256),    # layer1 conv3
        (96 * 28 * 28, 512, 128),   # layer2 conv1
        (96 * 28 * 28, 128, 512),   # layer2 conv3
        (96 * 14 * 14, 1024, 256),  # layer3 conv1
    ]
    out = {}
    for (M, K, N) in shapes:
        kx, kw = jax.random.split(jax.random.key(0))
        x = (jax.random.normal(kx, (M, K), jnp.float32) * 0.5
             ).astype(jnp.bfloat16)
        w = (jax.random.normal(kw, (K, N), jnp.float32)
             * (1.0 / K ** 0.5)).astype(jnp.bfloat16)
        scale = jnp.ones((K,), jnp.float32) * 1.1
        shift = jnp.zeros((K,), jnp.float32) - 0.05
        # correctness
        y1, s1, ss1 = jax.jit(xla_link)(x, w, scale, shift)
        y2, s2, ss2 = jax.jit(fused_link)(x, w, scale, shift)
        err_y = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                      - y2.astype(jnp.float32))))
        rel_s = float(jnp.max(jnp.abs(s1 - s2)
                              / (jnp.abs(s1) + 1.0)))
        t_xla = timed(xla_link, (x, w, scale, shift))
        t_pl = timed(fused_link, (x, w, scale, shift))
        key = f"M{M}_K{K}_N{N}"
        out[key] = {"xla_ms": round(t_xla, 3),
                    "pallas_ms": round(t_pl, 3),
                    "speedup": round(t_xla / t_pl, 2),
                    "err_y": err_y, "rel_s": rel_s}
        print(f"{key:24s} xla {t_xla:7.3f}  pallas {t_pl:7.3f}  "
              f"x{t_xla / t_pl:.2f}  err_y {err_y:.2e} rel_s {rel_s:.1e}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
