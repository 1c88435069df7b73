"""ViP block rematerialization probe (roofline follow-up).

The per-variant roofline (RESULTS.md) shows ViP's train step running at
flops_bound + bytes_bound (84 + 199 ms ~= 305 ms measured) instead of
their max: the forward writes ~600 MB-class activation tensors
(bs 96 x 3137 tokens x 512 dim) that the backward re-reads, and there
is no conv-style fusion to hide the traffic.  ``ViP(remat=True)``
recomputes each performer block in the backward — trading MXU flops
(cheap here: 27% utilization) for HBM activation traffic (the binding
resource).  The flagship measured the OPPOSITE verdict (full remat +2%,
probe_backward.py) because its backward is flop-dominated.

Timing: K steps rolled into one lax.scan program, fresh on-device
inputs per iteration (axon memoization-safe), first post-warmup launch
timed.  Also reports XLA's own temp-memory accounting per variant.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python benchmarks/probe_vip_remat.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp

K = 10
BS = int(os.environ.get("SCAT_BENCH_BS", 96))
IMG = int(os.environ.get("SCAT_BENCH_IMG", 224))


def build(remat: bool):
    from scat_tpu import assets
    from scat_tpu.data.synthetic import _synth_batch_impl
    from scat_tpu.models.performer import ViP
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState

    mean_arr = assets.load_mean_params()
    template = jnp.asarray(mean_arr[3:].reshape(21, 3))
    model = ViP(mean_params=jnp.asarray(mean_arr), image_pix=IMG,
                iteration=3, remat=remat, dtype=jnp.bfloat16)

    def gen(key):
        return _synth_batch_impl(key, BS, IMG, template)

    batch0 = gen(jax.random.key(0))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(2)},
        batch0["image"], train=True)
    tx = schedule.make_optimizer(5e-4, steps_per_epoch=100)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}), tx,
        jax.random.key(9), constants=variables.get("constants", {}))
    raw_step = steps.make_train_step(model, tx, 1e5, 10.0)

    def train_k(state, seed):
        def body(s, i):
            b = gen(jax.random.fold_in(jax.random.key(1), seed + i))
            s2, st = raw_step(s, b)
            return s2, st["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))

    return state, batch0, raw_step, jax.jit(train_k, donate_argnums=(0,))


def main():
    out = {"bs": BS, "img": IMG, "k": K}
    for remat in (False, True):
        tag = "remat" if remat else "baseline"
        state, batch0, raw_step, train_jit = build(remat)
        # XLA memory accounting of the bare step
        try:
            ma = jax.jit(raw_step).lower(
                state, batch0).compile().memory_analysis()
            out[f"{tag}_temp_mb"] = round(
                getattr(ma, "temp_size_in_bytes", float("nan")) / 2**20)
        except Exception as e:
            out[f"{tag}_mem_error"] = str(e)[:200]
        state, _ = train_jit(state, jnp.int32(0))      # compile+warm
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        state, losses = train_jit(state, jnp.int32(1))
        jax.block_until_ready(losses)
        dt = (time.perf_counter() - t0) / K
        out[f"{tag}_ms"] = round(dt * 1e3, 2)
        out[f"{tag}_sps"] = round(BS / dt, 1)
    if "remat_ms" in out and "baseline_ms" in out:
        out["speedup"] = round(out["baseline_ms"] / out["remat_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
