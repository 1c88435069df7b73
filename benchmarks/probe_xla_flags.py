"""XLA compiler-option sweep for the canonical train step (one chip).

Measures ONLY the full jitted train step (fwd + loss + bwd + Adam) at
the canonical config, K iterations rolled into one program.  Options
are passed through ``jax.jit(compiler_options=...)`` — NOT XLA_FLAGS:
the remote-execution client rejects TPU-only flags in XLA_FLAGS
(parse_flags_from_env aborts), while compiler_options ride the compile
request to the server-side compiler.  Sweep:

    SCAT_COMPILER_OPTS='{"xla_tpu_scoped_vmem_limit_kib": "65536"}' \
        python benchmarks/probe_xla_flags.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from scat_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from scat_tpu import assets
    from scat_tpu.data.synthetic import synth_batch
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState
    import __graft_entry__

    bs = int(os.environ.get("SCAT_BENCH_BS", 96))
    K = int(os.environ.get("SCAT_BENCH_ITERS", 20))
    # vary the seed to defeat the remote layer's launch memoization
    # (a repeat of a previously-run (program, inputs) pair returns
    # cached results in ~0.2 ms)
    seed = int(os.environ.get("SCAT_BENCH_SEED", 0))
    mean = assets.load_mean_params()
    norm = os.environ.get("SCAT_BENCH_NORM", "batch")
    model, _ = __graft_entry__._flagship(
        224, use_pallas=jax.devices()[0].platform != "cpu",
        norm_layer=norm)
    batch = synth_batch(jax.random.key(seed), bs, image_size=224,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"], train=True)
    tx = schedule.make_optimizer(5e-4, steps_per_epoch=100)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.key(seed + 2))
    step_fn = steps.make_train_step(model, tx, 1e5, 10.0)

    def train_k(state, batch):
        def body(s, _):
            s2, st = step_fn(s, batch)
            return s2, st["loss"]
        return jax.lax.scan(body, state, None, length=K)

    opts = json.loads(os.environ.get("SCAT_COMPILER_OPTS", "{}"))
    f = jax.jit(train_k, donate_argnums=(0,),
                compiler_options=opts or None)
    state, losses = f(state, batch)
    jax.block_until_ready(losses)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = f(state, batch)
        jax.block_until_ready(losses)
        times.append((time.perf_counter() - t0) / K * 1000)
    # the remote-execution layer can memoize repeat launches; the FIRST
    # post-warmup launch is the honest one (matches bench.py protocol)
    step_ms = times[0]
    print(json.dumps({"compiler_options": opts, "norm": norm,
                      "bs": bs, "step_ms": round(step_ms, 2),
                      "all_ms": [round(t, 2) for t in times],
                      "crops_per_s": round(bs / step_ms * 1000, 1)}))


if __name__ == "__main__":
    main()
