"""HRNet floor probes (VERDICT r03 item 5).

The HRNet head runs at 39.8 eff TF/s vs 57-58 for the ResNet heads and
sits nearest its bytes bound (72.6 ms vs 99 ms un-fused, RESULTS.md
roofline) — but unlike the flagship it never had its floor EARNED by
probing.  This measures the two traffic levers the verdict names plus
the per-stage accounting:

  1. channel alignment: HRNet-W24's branch widths (24/48/96/192) vs a
     32-aligned W32 variant (32/64/128/256) — non-parity experiment;
     the decision metric is ms per TFLOP (time normalized by XLA's own
     flop count), which isolates MXU-tiling efficiency from the extra
     work the wider net does
  2. fuse-layer restructuring: reference per-source 1x1+BN+add fuse
     ("sum") vs concat-all-sources + ONE 1x1 conv + ONE BN ("concat")
     — fewer HBM round trips and a larger-K matmul at identical
     asymptotic flops for the up path
  3. per-stage segment accounting (stop_after=layer1/stage2/stage3/
     full): measured ms + XLA flops/bytes per prefix, the HBM
     accounting that defends (or indicts) the 72.6 ms step

All at bs 96, 224 px, bf16, K=10 rolled with fresh on-device inputs,
train = fwd+bwd+Adam on an L2 proxy of the 56x56x128 backbone output
(the head's consumption contract; the reference has no HRNet trainer,
bench_variants.py note).

Usage: PYTHONPATH=/root/repo python benchmarks/probe_hrnet.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scat_tpu.models.hrnet import HRNet
from scat_tpu.training import schedule
from scat_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()
K = 10
BS = int(os.environ.get("SCAT_BENCH_BS", 96))
IMG = int(os.environ.get("SCAT_BENCH_IMG", 224))


def gen(key):
    return jax.random.uniform(key, (BS, IMG, IMG, 3), jnp.float32,
                              -1.0, 1.0)


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return (float(ca.get("flops", float("nan"))),
            float(ca.get("bytes accessed", float("nan"))))


def bench_train(c: int, fuse_mode: str):
    """K-rolled train step (fwd+bwd+Adam, L2 proxy) of the bare
    backbone at HRNet(c, nof_joints=128)."""
    model = HRNet(c=c, nof_joints=128, dtype=jnp.bfloat16,
                  fuse_mode=fuse_mode)
    x0 = gen(jax.random.key(0))
    variables = model.init(jax.random.key(1), x0, train=True)
    params, bstats = variables["params"], variables["batch_stats"]
    tx = schedule.make_optimizer(5e-4, steps_per_epoch=100)
    opt_state = tx.init(params)

    def step(carry, x):
        params, bstats, opt_state = carry

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, x, train=True,
                mutable=["batch_stats"])
            return jnp.mean(out.astype(jnp.float32) ** 2), mut

        (l, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, mut["batch_stats"], opt_state), l

    def train_k(carry, seed):
        def body(c_, i):
            x = gen(jax.random.fold_in(jax.random.key(1), seed + i))
            return step(c_, x)
        return jax.lax.scan(body, carry, jnp.arange(K))

    train_jit = jax.jit(train_k, donate_argnums=(0,))
    carry = (params, bstats, opt_state)
    carry, losses = train_jit(carry, jnp.int32(0))
    # np.asarray = host fetch: the D2H cannot complete before the
    # computation, unlike block_until_ready which has been observed to
    # return early through the tunnel (the bogus 2.34 ms/step first
    # read of this probe; same caveat as probe_int8's docstring)
    np.asarray(losses)
    t0 = time.perf_counter()
    carry, losses = train_jit(carry, jnp.int32(1))
    np.asarray(losses)
    dt = (time.perf_counter() - t0) / K
    t0 = time.perf_counter()
    carry, losses = train_jit(carry, jnp.int32(2))
    np.asarray(losses)
    dt2 = (time.perf_counter() - t0) / K
    dt = min(dt, dt2)

    # bare single-step accounting (no datagen) for flops/bytes
    single = jax.jit(step).lower(
        (params, bstats, opt_state), x0).compile()
    flops, nbytes = cost(single)
    return {
        "c": c, "fuse_mode": fuse_mode,
        "train_ms_step": round(dt * 1e3, 2),
        "crops_s": round(BS / dt, 1),
        "step_tflop": round(flops / 1e12, 3),
        "step_gb": round(nbytes / 1e9, 2),
        "ms_per_tflop": round(dt * 1e3 / (flops / 1e12), 2),
        "eff_tf_s": round(flops / 1e12 / dt, 1),
        "flops_bound_ms": round(flops / 197e12 * 1e3, 2),
        "bytes_bound_ms": round(nbytes / 820e9 * 1e3, 2),
    }


def bench_stages():
    """Cumulative-prefix timing: eval fwd and train fwd per
    stop_after, plus per-prefix XLA accounting."""
    rows = []
    for stop in ("layer1", "stage2", "stage3", "full"):
        model = HRNet(c=24, nof_joints=128, dtype=jnp.bfloat16,
                      stop_after=stop)
        x0 = gen(jax.random.key(0))
        variables = model.init(jax.random.key(1), x0, train=True)

        def fwd_k(variables, seed, train):
            def body(i, acc):
                x = gen(jax.random.fold_in(jax.random.key(2), seed + i))
                if train:
                    out, _ = model.apply(variables, x, train=True,
                                         mutable=["batch_stats"])
                else:
                    out = model.apply(variables, x, train=False)
                return acc + jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, K, body, 0.0)

        row = {"stop_after": stop}
        for train in (False, True):
            fn = jax.jit(lambda v, s: fwd_k(v, s, train))
            np.asarray(fn(variables, jnp.int32(0)))   # host fetch
            t0 = time.perf_counter()
            np.asarray(fn(variables, jnp.int32(1)))
            dt1 = (time.perf_counter() - t0) / K
            t0 = time.perf_counter()
            np.asarray(fn(variables, jnp.int32(2)))
            dt = min(dt1, (time.perf_counter() - t0) / K)
            key = "train_fwd_ms" if train else "eval_fwd_ms"
            row[key] = round(dt * 1e3, 2)
            if train:
                single = jax.jit(
                    lambda v, x: model.apply(v, x, train=True,
                                             mutable=["batch_stats"])
                ).lower(variables, x0).compile()
                flops, nbytes = cost(single)
                row["fwd_tflop"] = round(flops / 1e12, 3)
                row["fwd_gb"] = round(nbytes / 1e9, 2)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main():
    rows = []
    for c, fuse in ((24, "sum"), (32, "sum"), (24, "concat")):
        row = bench_train(c, fuse)
        rows.append(row)
        print(json.dumps(row), flush=True)
    stages = bench_stages()
    print(json.dumps({"variants": rows, "stages": stages}))


if __name__ == "__main__":
    main()
