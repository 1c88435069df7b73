"""Probe: eval-forward cost with params as runtime arguments vs baked
compile-time constants (the serving case — weights never change between
requests, so the predictor can close over them and let XLA constant-fold
the BN running-stats affine into the conv weights and pre-pack layouts).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/probe_frozen_weights.py
"""

import json
import time

import jax
import jax.numpy as jnp


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    from scat_tpu import assets
    from scat_tpu.data.synthetic import _synth_batch_impl

    import os

    import __graft_entry__
    bs, img, K = int(os.environ.get("SCAT_BENCH_BS", 96)), 224, 20
    mean = assets.load_mean_params()
    model, _ = __graft_entry__._flagship(img)
    template = jnp.asarray(mean[3:].reshape(21, 3))
    x = jnp.zeros((bs, img, img, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x,
        train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def gen(key, i):
        return _synth_batch_impl(jax.random.fold_in(key, i), bs, img,
                                 template)["image"]

    def loop(body, key):
        def f(i, acc):
            return acc + body(i, key)
        return jax.lax.fori_loop(0, K, f, 0.0)

    # datagen-only (subtracted)
    gen_j = jax.jit(lambda key: loop(
        lambda i, k: jnp.sum(gen(k, i)), key))

    # A: params as runtime arguments (today's bench/serving program)
    def fwd_args(p, b, key):
        def body(i, k):
            img_ = gen(k, i)
            pred = model.apply({"params": p, "batch_stats": b}, img_,
                               train=False)[0]
            return jnp.sum(pred) + jnp.sum(img_)
        return loop(body, key)

    args_j = jax.jit(fwd_args)

    # B: params baked as compile-time constants (frozen-weight serving)
    def fwd_const(key):
        def body(i, k):
            img_ = gen(k, i)
            pred = model.apply(
                {"params": params, "batch_stats": batch_stats}, img_,
                train=False)[0]
            return jnp.sum(pred) + jnp.sum(img_)
        return loop(body, key)

    const_j = jax.jit(fwd_const)

    t_gen = timed(gen_j, jax.random.key(1)) / K * 1000
    t_args = timed(args_j, params, batch_stats, jax.random.key(2)) \
        / K * 1000
    t_const = timed(const_j, jax.random.key(3)) / K * 1000
    out = {
        "datagen_ms": round(t_gen, 2),
        "fwd_args_ms": round(t_args - t_gen, 2),
        "fwd_const_ms": round(t_const - t_gen, 2),
        "speedup": round((t_args - t_gen) / max(t_const - t_gen, 1e-9),
                         2),
        "infer_sps_args": round(bs / (t_args - t_gen) * 1000, 1),
        "infer_sps_const": round(bs / (t_const - t_gen) * 1000, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
