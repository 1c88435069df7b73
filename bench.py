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
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.parallel import mesh as mesh_lib
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/scat_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    batch_size = 96
    image_size = 224
    mean = assets.load_mean_params()
    on_tpu = jax.devices()[0].platform != "cpu"
    model = EncoderTransformer(
        mean_params=jnp.asarray(mean), iteration=3, heads=8, depth=3,
        mask_rate=0.2, pos_embed=True,
        token_dim=(image_size // 8) ** 2,
        use_pallas=on_tpu, dtype=jnp.bfloat16)

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
    step = mesh_lib.jit_train_step(
        steps.make_train_step(model, tx, 1e5, 10.0), mesh)

    # warmup / compile
    state, stats = step(state, batch)
    jax.block_until_ready(stats)

    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = step(state, batch)
    jax.block_until_ready(stats)
    dt = time.perf_counter() - t0
    n_chips = jax.device_count()
    samples_per_sec_chip = batch_size * iters / dt / n_chips

    # inference throughput (reference eval FPS protocol, eval.py:955-957)
    infer = jax.jit(lambda p, bs_, img: model.apply(
        {"params": p, "batch_stats": bs_}, img, train=False)[0])
    out = infer(state.params, state.batch_stats, batch["image"])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(state.params, state.batch_stats, batch["image"])
    jax.block_until_ready(out)
    infer_sps = batch_size * iters / (time.perf_counter() - t0) / n_chips

    baseline = _load_torch_baseline()
    result = {
        "metric": "train_samples_per_sec_per_chip",
        "value": round(samples_per_sec_chip, 2),
        "unit": "hand-crops/s/chip",
        "vs_baseline": (round(samples_per_sec_chip / baseline, 2)
                        if baseline else None),
        "infer_samples_per_sec_per_chip": round(infer_sps, 2),
        "batch_size": batch_size,
        "n_chips": n_chips,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
