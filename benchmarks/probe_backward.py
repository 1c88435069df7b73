"""Backward-pass probes for the canonical train step (VERDICT r2 #4).

The 39.7 ms step at bs 96 is ~1/3 forward, ~2/3 backward+update; the
forward was dissected in round 2 (BN stats, conv epilogue, stem, XLA
flags) but the backward never was.  This probe measures, on the chip:

  1. segment times: eval fwd / train fwd+loss / fwd+bwd (grad only) /
     full step (grad + Adam + BN update)
  2. remat policies on the whole loss closure: saving fewer activations
     trades HBM reads in the bwd for recompute FLOPs —
     none (XLA default saves), dots_saveable,
     dots_with_no_batch_dims_saveable, nothing_saveable
  3. gradient accumulation dtype: params f32 vs all-bf16 grads
  4. the compiled step's own cost analysis (FLOPs, HBM bytes) for a
     roofline account of where the backward sits vs speed-of-light.

Timing methodology per MEMORY (axon tunnel memoizes identical
launches): K steps rolled into one lax.scan program; inputs derived
on-device from a fresh seed per launch.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_backward.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import optax

K = 20
BS = int(os.environ.get("SCAT_BENCH_BS", 96))
IMG = int(os.environ.get("SCAT_BENCH_IMG", 224))


def setup():
    from scat_tpu import assets
    from scat_tpu.data.synthetic import _synth_batch_impl
    from scat_tpu.training import schedule
    from scat_tpu.training.state import TrainState
    from scat_tpu.utils.profiling import enable_compilation_cache
    import __graft_entry__

    enable_compilation_cache()
    on_tpu = jax.devices()[0].platform != "cpu"
    mean = assets.load_mean_params()
    model, _ = __graft_entry__._flagship(IMG, use_pallas=on_tpu)
    template = jnp.asarray(mean[3:].reshape(21, 3))

    def gen(key):
        return _synth_batch_impl(key, BS, IMG, template)

    batch0 = gen(jax.random.key(0))
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch0["image"], train=True)
    tx = schedule.make_optimizer(5e-4, steps_per_epoch=100)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.key(2))
    return model, tx, state, gen, template


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / K * 1000.0


def k_rolled(body_fn):
    """seed -> scalar; body folded K times with per-iter keys."""

    def prog(seed):
        def body(i, acc):
            return acc + body_fn(jax.random.fold_in(jax.random.key(0),
                                                    seed + i))
        return jax.lax.fori_loop(0, K, body, 0.0)

    return jax.jit(prog)


def main():
    import argparse
    from scat_tpu.models import losses as losses_lib
    from scat_tpu.training import steps

    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="segments,full,remat,bf16,cost",
                    help="comma list: segments,full,remat,bf16,cost")
    sel = set(ap.parse_args().probes.split(","))

    model, tx, state, gen, template = setup()
    results = {}

    def emit(k, v):
        results[k] = round(v, 3) if isinstance(v, float) else v
        print(json.dumps({k: results[k]}), flush=True)

    # ---- 1. segment times ----
    params, bstats = state.params, state.batch_stats

    def eval_fwd(key):
        b = gen(key)
        out = model.apply({"params": params, "batch_stats": bstats},
                          b["image"], train=False)
        return jnp.sum(out[0])

    def make_loss(p, b, key):
        def loss_fn(p):
            outputs, mut = model.apply(
                {"params": p, "batch_stats": bstats}, b["image"],
                train=True, rngs={"mask": key}, mutable=["batch_stats"])
            pred = outputs[0]
            _, j3d, j2d = steps.predictions_to_keypoints(pred)
            bd, _ = losses_lib.scat_loss(
                j3d.reshape(-1, 63), j2d.reshape(-1, 42), b["label"],
                1e5, 10.0, valid=b["valid"])
            return bd.total
        return loss_fn

    def train_fwd(key):
        b = gen(key)
        return make_loss(params, b, key)(params)

    def fwd_bwd(key):
        b = gen(key)
        g = jax.grad(make_loss(params, b, key))(params)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    if "segments" in sel:
        emit("eval_fwd_ms", timed(k_rolled(eval_fwd), jnp.int32(7)))
        emit("train_fwd_ms", timed(k_rolled(train_fwd), jnp.int32(11)))
        emit("fwd_bwd_ms", timed(k_rolled(fwd_bwd), jnp.int32(13)))

    # full step baseline (scan threads state like bench.py)
    raw_step = steps.make_train_step(model, tx, 1e5, 10.0)

    def full_k(state, seed):
        def body(s, i):
            b = gen(jax.random.fold_in(jax.random.key(1), seed + i))
            s2, st = raw_step(s, b)
            return s2, st["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))

    if "full" in sel:
        full_jit = jax.jit(full_k, donate_argnums=(0,))
        state2, _ = full_jit(state, jnp.int32(0))
        jax.block_until_ready(state2.params)
        t0 = time.perf_counter()
        state3, _ = full_jit(state2, jnp.int32(1))
        jax.block_until_ready(state3.params)
        emit("full_step_ms", (time.perf_counter() - t0) / K * 1000.0)
        state = state3

    # ---- 2. remat policies over the loss closure ----
    policies = {
        "remat_dots_saveable":
            jax.checkpoint_policies.dots_saveable,
        "remat_dots_no_batch_dims":
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "remat_nothing_saveable": None,  # plain jax.checkpoint
    }
    for name, pol in (policies.items() if "remat" in sel else ()):
        def fwd_bwd_remat(key, _pol=pol):
            b = gen(key)
            lf = make_loss(params, b, key)
            lf = (jax.checkpoint(lf) if _pol is None
                  else jax.checkpoint(lf, policy=_pol))
            g = jax.grad(lf)(params)
            return sum(jnp.sum(x)
                       for x in jax.tree_util.tree_leaves(g))
        emit(name + "_ms", timed(k_rolled(fwd_bwd_remat),
                                 jnp.int32(17)))

    # ---- 3. bf16 gradient path ----
    def fwd_bwd_bf16(key):
        b = gen(key)
        p16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params)

        def lf(p):
            return make_loss(params, b, key)(
                jax.tree_util.tree_map(
                    lambda a, ref: a.astype(ref.dtype), p, params))
        g = jax.grad(lf)(p16)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(g))

    if "bf16" in sel:
        emit("fwd_bwd_bf16_grads_ms", timed(k_rolled(fwd_bwd_bf16),
                                            jnp.int32(19)))

    # ---- 4. cost analysis of ONE full step ----
    one_step = jax.jit(raw_step)
    b0 = gen(jax.random.key(5))
    if "cost" not in sel:
        print(json.dumps(results, indent=1))
        return
    try:
        ca = one_step.lower(state, b0).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        results["step_flops"] = float(ca.get("flops", float("nan")))
        results["step_bytes_accessed"] = float(
            ca.get("bytes accessed", float("nan")))
        for k_, v in ca.items():
            if "bytes accessed" in k_ and k_ != "bytes accessed":
                results["cost_" + k_.replace(" ", "_")] = float(v)
    except Exception as e:
        results["cost_analysis_error"] = str(e)

    results = {k_: (round(v, 3) if isinstance(v, float) else v)
               for k_, v in results.items()}
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
