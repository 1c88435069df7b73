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

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/probe_accum_memory.py [--bs 384] [--accums 1,4,8]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


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

    for accum in (int(a) for a in args.accums.split(",")):
        step = jax.jit(
            steps.make_train_step(model, tx, 1e5, 10.0,
                                  grad_accum=accum),
            donate_argnums=(0,))
        compiled = step.lower(state, batch).compile()
        ma = compiled.memory_analysis()
        row = {"accum": accum, "bs": args.bs,
               "temp_MB": round(ma.temp_size_in_bytes / 2**20, 1),
               "args_MB": round(ma.argument_size_in_bytes / 2**20, 1),
               "output_MB": round(ma.output_size_in_bytes / 2**20, 1)}
        # measured step time.  Rebuild the state from COPIED leaves per
        # accum setting: TrainState.create shares the `variables`
        # buffers and device_put of an already-committed array is a
        # no-op, so the donated run would delete the shared arrays and
        # the next accum's run would hit "Array has been deleted".
        s = TrainState.create(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables.get("batch_stats", {})),
            tx, jax.random.key(2))
        out = compiled(s, batch)  # warmup (s consumed)
        jax.block_until_ready(out)
        times = []
        for _ in range(args.time_steps):
            s, _ = out
            t0 = time.perf_counter()
            out = compiled(s, batch)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        row["step_ms"] = round(min(times) * 1000.0, 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
