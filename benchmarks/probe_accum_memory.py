"""Gradient-accumulation memory probe: the lever ``--grad_accum`` claims.

Compiles the flagship train step at a large batch with accum 1/4/8 and
reports XLA's own memory accounting (``compiled.memory_analysis()``):
temp (activation) bytes, argument bytes, and peak estimate, plus the
measured step time.  Accumulation should cut temp memory roughly by the
accumulation factor (activations are microbatch-sized inside the scan)
at the cost of one params-sized f32 gradient carry.

The reference has no accumulation (one optimizer step per DataLoader
batch, /root/reference/train.py:136-209); this quantifies the TPU-side
extension documented in README/MIGRATING.

Timing methodology (fixed in round 4 — VERDICT r03 item 2): the
original probe timed per-dispatch python launches, exactly what
bench.py's note rejects for this environment (the remote-execution
tunnel adds per-launch input-processing overhead and memoizes repeated
identical launches); its 264 ms bs-384 figure disagreed with the
K-rolled batch-size-scaling table's 164.5 ms for the same config by a
tunnel-launch constant.  The step time now comes from K steps rolled
into ONE program (lax.scan, donated state), the same harness as
bench.py and the canary; memory numbers are XLA's static accounting of
the single compiled step and are launch-independent (unchanged).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/probe_accum_memory.py [--bs 384] [--accums 1,4,8]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=384)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--accums", default="1,4,8")
    ap.add_argument("--time_steps", type=int, default=5)
    args = ap.parse_args()

    from scat_tpu import assets
    from scat_tpu.data.synthetic import _synth_batch_impl
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState
    from scat_tpu.utils.profiling import enable_compilation_cache
    import __graft_entry__

    enable_compilation_cache()
    on_tpu = jax.devices()[0].platform != "cpu"
    mean = assets.load_mean_params()
    model, _ = __graft_entry__._flagship(args.img, use_pallas=on_tpu)
    template = jnp.asarray(mean[3:].reshape(21, 3))
    batch = jax.block_until_ready(
        _synth_batch_impl(jax.random.key(0), args.bs, args.img, template))
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"][:2], train=True)
    tx = schedule.make_optimizer(5e-4, steps_per_epoch=100)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.key(2))

    K = args.time_steps
    for accum in (int(a) for a in args.accums.split(",")):
        step_fn = steps.make_train_step(model, tx, 1e5, 10.0,
                                        grad_accum=accum)
        compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(
            state, batch).compile()
        ma = compiled.memory_analysis()
        row = {"accum": accum, "bs": args.bs,
               "temp_MB": round(ma.temp_size_in_bytes / 2**20, 1),
               "args_MB": round(ma.argument_size_in_bytes / 2**20, 1),
               "output_MB": round(ma.output_size_in_bytes / 2**20, 1)}
        # K-rolled step time (ONE launch of a lax.scan over K steps;
        # donated state makes every launch unique, so the tunnel can
        # neither memoize it nor tax each step with launch overhead)
        def train_k(s, b):
            def body(si, _):
                s2, st = step_fn(si, b)
                return s2, st["loss"]
            return jax.lax.scan(body, s, None, length=K)

        train_jit = jax.jit(train_k, donate_argnums=(0,))
        # Rebuild the state from COPIED leaves per accum setting:
        # TrainState.create shares the `variables` buffers and
        # device_put of an already-committed array is a no-op, so the
        # donated run would delete the shared arrays and the next
        # accum's run would hit "Array has been deleted".
        s = TrainState.create(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables.get("batch_stats", {})),
            tx, jax.random.key(2))
        s, losses = train_jit(s, batch)   # compile + warm
        np.asarray(losses)   # host fetch: D2H cannot finish early
        # (block_until_ready has been seen returning before execution
        # through the tunnel — probe_hrnet.py's bogus first read)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            s, losses = train_jit(s, batch)
            np.asarray(losses)
            times.append((time.perf_counter() - t0) / K)
        row["step_ms"] = round(min(times) * 1000.0, 2)
        row["step_ms_reps"] = [round(t * 1000.0, 2) for t in times]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
