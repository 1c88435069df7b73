"""Benchmark: train throughput of the flagship SCAT model on one chip.

Prints ONE JSON line:
  {"metric": "train_samples_per_sec_per_chip", "value": N,
   "unit": "hand-crops/s/chip", "vs_baseline": R}

Protocol: canonical config (--net reg_transformer, bs 96, iteration 3,
heads 8, mask 0.2, PE on — reference script/ablation_pose.sh:5) on
synthetic 224x224 crops; the measured quantity is full train steps
(forward + 3D/2D loss + backward + Adam) per second times batch size.
``vs_baseline`` divides by the reference's torch single-GPU figure from
BASELINE.md when one exists; the reference publishes none, so a locally
measured torch-CPU proxy is used if available, else null.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "torch_baseline_result.json")


def _load_torch_baseline():
    """Locally measured torch-CPU throughput of the reference
    architecture (benchmarks/torch_baseline.py); the reference repo
    publishes no numbers (BASELINE.md)."""
    try:
        with open(_BASELINE_FILE) as f:
            return json.load(f)["torch_cpu_samples_per_sec"]
    except Exception:
        return None


def main():
    from scat_tpu import assets
    from scat_tpu.data.synthetic import synth_batch
    from scat_tpu.parallel import mesh as mesh_lib
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState

    from scat_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    # env overrides let CI/CPU smoke runs use tiny shapes
    batch_size = int(os.environ.get("SCAT_BENCH_BS", 96))
    image_size = int(os.environ.get("SCAT_BENCH_IMG", 224))
    mean = assets.load_mean_params()
    on_tpu = jax.devices()[0].platform != "cpu"
    # single source of truth for the flagship config: the driver hook
    import __graft_entry__
    model, _ = __graft_entry__._flagship(image_size,
                                         use_pallas=on_tpu)

    batch = synth_batch(jax.random.key(0), batch_size,
                        image_size=image_size, mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"], train=True)
    tx = schedule.make_optimizer(5e-4, steps_per_epoch=100)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.key(2))
    mesh = mesh_lib.make_mesh()
    state = mesh_lib.replicate_state(mesh, state)
    batch = mesh_lib.shard_batch(mesh, batch)

    # Timing methodology: the remote-execution layer both memoizes
    # identical launches and adds per-launch input-processing overhead,
    # so per-dispatch python loops mismeasure in both directions.  The
    # device-true numbers come from rolling K steps into ONE program
    # with lax.scan/lax.map and timing that single launch.
    iters = 20 if on_tpu else 3

    def train_k(state, batch):
        def body(s, _):
            s2, st = step_fn(s, batch)
            return s2, st["loss"]
        return jax.lax.scan(body, state, None, length=iters)

    step_fn = steps.make_train_step(model, tx, 1e5, 10.0)
    train_k_jit = jax.jit(train_k, donate_argnums=(0,))
    state, losses = train_k_jit(state, batch)
    jax.block_until_ready(losses)     # compile + warm
    # 3 reps, median reported: RESULTS.md documents a few percent of
    # single-rep noise even at K=32 — the committed per-round record
    # should be self-denoised (round-4 review, Weak #3)
    reps = int(os.environ.get("SCAT_BENCH_REPS", 3))
    n_chips = jax.device_count()
    train_rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, losses = train_k_jit(state, batch)
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        train_rates.append(batch_size * iters / dt / n_chips)
    train_rates.sort()
    samples_per_sec_chip = train_rates[len(train_rates) // 2]

    # inference (reference eval FPS protocol, eval.py:955-957):
    # generate inputs ON DEVICE inside the program (the launch input is
    # a tiny PRNG key, sidestepping per-launch input-processing costs),
    # run K forwards, and subtract the separately-measured datagen time.
    from scat_tpu.data.synthetic import _synth_batch_impl
    template = jnp.asarray(mean[3:].reshape(21, 3))
    # K=32: the round-4 canary (benchmarks/canary.py, RESULTS.md
    # "Inference canary") showed the original K=8 subtraction has a
    # +-10% single-rep spread (the entire r01->r03 "drift" band) while
    # K=32/64 reps agree within ~1% across every round's tree.
    K = 32 if on_tpu else 2

    from jax.sharding import NamedSharding, PartitionSpec as P
    data_sh = NamedSharding(mesh, P("data"))

    def _gen(key, i):
        b = _synth_batch_impl(jax.random.fold_in(key, i),
                              batch_size, image_size, template)
        # shard over the data axis so multi-chip runs measure per-chip
        # work (replicated compute would inflate /n_chips math)
        return jax.lax.with_sharding_constraint(b["image"], data_sh)

    def gen_only(key):
        # consume the FULL image so XLA can't dead-code-eliminate the
        # generation work being subtracted from the timed total
        def body(i, acc):
            return acc + jnp.sum(_gen(key, i))
        return jax.lax.fori_loop(0, K, body, 0.0)

    def gen_and_infer(p, bs_, key):
        def body(i, acc):
            img = _gen(key, i)
            pred = model.apply({"params": p, "batch_stats": bs_},
                               img, train=False)[0]
            return acc + jnp.sum(pred) + jnp.sum(img)
        return jax.lax.fori_loop(0, K, body, 0.0)

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        return out

    gen_jit = jax.jit(gen_only)
    both_jit = jax.jit(gen_and_infer)
    timed(gen_jit, jax.random.key(1))
    timed(both_jit, state.params, state.batch_stats, jax.random.key(2))
    infer_rates = []
    for r in range(reps):
        t0 = time.perf_counter()
        timed(gen_jit, jax.random.key(3 + 2 * r))
        t_gen = time.perf_counter() - t0
        t0 = time.perf_counter()
        timed(both_jit, state.params, state.batch_stats,
              jax.random.key(4 + 2 * r))
        t_both = time.perf_counter() - t0
        infer_rates.append(
            batch_size * K / max(t_both - t_gen, 1e-6) / n_chips)
    infer_rates.sort()
    infer_sps = infer_rates[len(infer_rates) // 2]

    def rel_spread(rates):
        return round((max(rates) - min(rates)) / rates[len(rates) // 2],
                     4)

    baseline = _load_torch_baseline()
    result = {
        "metric": "train_samples_per_sec_per_chip",
        "value": round(samples_per_sec_chip, 2),
        "unit": "hand-crops/s/chip",
        "vs_baseline": (round(samples_per_sec_chip / baseline, 2)
                        if baseline else None),
        "spread": rel_spread(train_rates),
        "infer_samples_per_sec_per_chip": round(infer_sps, 2),
        "infer_spread": rel_spread(infer_rates),
        "reps": reps,
        "batch_size": batch_size,
        "n_chips": n_chips,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
