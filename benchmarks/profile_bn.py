"""Step-time ablation on the chip: where does the train/eval forward gap
come from, and what does each segment cost?

Methodology (see benchmarks/RESULTS.md): K iterations rolled into ONE
jitted program with fori_loop/scan over varying inputs (the remote
execution layer memoizes identical launches), timed as a single launch.

Segments:
  * flagship fwd, eval vs train (BN statistics cost)
  * backbone-only fwd, eval vs train (isolates the head)
  * backbone-only fwd with GroupNorm (mode-free stats reference point)
  * fwd+bwd (grad of sum) vs full train step (optimizer/EMA overhead)

Usage: python benchmarks/profile_bn.py [--bs 96] [--img 224]
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=96)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from scat_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    from scat_tpu import assets
    from scat_tpu.models import resnet as resnet_lib
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState

    bs, img, K = args.bs, args.img, args.iters
    mean = assets.load_mean_params()
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16

    def timed_loop(make_body, label, results):
        """Roll K body(i) calls into one program; body must consume i so
        every iteration differs (memoization + DCE safety)."""
        def prog(seed):
            def body(i, acc):
                return acc + make_body(i + seed)
            return jax.lax.fori_loop(0, K, body, 0.0)
        f = jax.jit(prog)
        jax.block_until_ready(f(jnp.int32(0)))     # compile+warm
        t0 = time.perf_counter()
        jax.block_until_ready(f(jnp.int32(1)))
        dt = (time.perf_counter() - t0) / K * 1000
        results[label] = round(dt, 2)
        print(f"{label:42s} {dt:8.2f} ms")

    def an_image(i):
        # cheap, shape-static varying input
        base = jax.random.normal(jax.random.key(0), (bs, img, img, 3),
                                 jnp.float32)
        return base * (1.0 + 0.001 * jnp.float32(i))

    results = {"bs": bs, "img": img,
               "platform": jax.devices()[0].platform}

    # --- backbone only, batch vs group norm, train vs eval
    for norm in ("batch", "group"):
        net = resnet_lib.resnet50(dtype=dtype, norm_layer=norm)
        variables = net.init(jax.random.key(0),
                             jnp.zeros((1, img, img, 3)), train=False)
        params, bstats = variables["params"], variables.get(
            "batch_stats", {})

        def fwd(i, train):
            out = net.apply({"params": params, "batch_stats": bstats},
                            an_image(i), train=train,
                            mutable=["batch_stats"] if train else False)
            o = out[0] if train else out
            return jnp.sum(o[0]) + sum(jnp.sum(s.astype(jnp.float32))
                                       for s in o[1:])
        timed_loop(lambda i: fwd(i, False),
                   f"backbone fwd eval ({norm})", results)
        timed_loop(lambda i: fwd(i, True),
                   f"backbone fwd train ({norm})", results)
        if norm == "batch":
            # fwd+bwd: grad wrt params of summed outputs
            def fwdbwd(i):
                def loss(p):
                    out, _ = net.apply(
                        {"params": p, "batch_stats": bstats},
                        an_image(i), train=True,
                        mutable=["batch_stats"])
                    return (jnp.sum(out[0])
                            + sum(jnp.sum(s.astype(jnp.float32))
                                  for s in out[1:]))
                g = jax.grad(loss)(params)
                return sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(g))
            timed_loop(fwdbwd, "backbone fwd+bwd train (batch)", results)

    # --- flagship model
    model = EncoderTransformer(
        mean_params=jnp.asarray(mean), iteration=3, heads=8,
        mask_rate=0.0, token_dim=(img // 8) ** 2, use_pallas=on_tpu,
        dtype=dtype)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.zeros((1, img, img, 3)), train=False)
    params, bstats = variables["params"], variables["batch_stats"]

    def model_fwd(i, train):
        out = model.apply({"params": params, "batch_stats": bstats},
                          an_image(i), train=train, deterministic=True,
                          mutable=["batch_stats"] if train else False)
        o = out[0] if train else out
        return jnp.sum(o[0])
    timed_loop(lambda i: model_fwd(i, False), "flagship fwd eval",
               results)
    timed_loop(lambda i: model_fwd(i, True), "flagship fwd train",
               results)

    # --- full train step (loss+bwd+Adam), state threaded through scan
    tx = schedule.make_optimizer(5e-4, steps_per_epoch=100)
    state = TrainState.create(params, bstats, tx, jax.random.key(2))
    step_fn = steps.make_train_step(model, tx, 1e5, 10.0)
    from scat_tpu.data.synthetic import synth_batch
    batch = synth_batch(jax.random.key(0), bs, img, mean)

    def train_k(state, batch):
        def body(s, _):
            s2, st = step_fn(s, batch)
            return s2, st["loss"]
        return jax.lax.scan(body, state, None, length=K)
    f = jax.jit(train_k, donate_argnums=(0,))
    state, losses = f(state, batch)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    state, losses = f(state, batch)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / K * 1000
    results["full train step"] = round(dt, 2)
    print(f"{'full train step':42s} {dt:8.2f} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
