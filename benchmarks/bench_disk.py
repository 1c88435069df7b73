"""END-TO-END from-disk training throughput (VERDICT round-1 item 3).

Measures the real pipeline: PNG files on disk -> native C++ decode +
fused affine warp (native/scat_native.cpp) -> host->device staging with
the background prefetcher -> jitted train step, on the chip.  Also
measures the host pipeline alone, giving the host-saturation margin
(how many chips one host core can feed).  Compare with the device-only
figure in RESULTS.md / BENCH_r*.json.

The tree is a synthetic STB layout (the tests/test_stb.py fixture scaled
up) with compressible gradient frames so generation stays fast; decode
cost is the same libpng path real STB frames take.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_disk.py
       [--bs 96] [--batches 6] [--train_epochs 2]
"""

import argparse
import json
import os
import pickle
import time

import numpy as np


def ensure_tree(root: str, frames_per_seq: int) -> str:
    marker = os.path.join(root, f".complete_{frames_per_seq}")
    if os.path.exists(marker):
        return root
    from PIL import Image
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:480, 0:640]
    base = np.stack([(yy / 480 * 255), (xx / 640 * 255),
                     ((yy + xx) % 256)], -1).astype(np.uint8)
    seqs = ["B2Counting", "B2Random", "B3Counting", "B3Random",
            "B4Counting", "B4Random", "B5Counting", "B5Random",
            "B6Counting", "B6Random", "B1Counting", "B1Random"]
    for seq in seqs:
        d = os.path.join(root, seq)
        os.makedirs(d, exist_ok=True)
        labels = os.path.join(root, "labels")
        os.makedirs(labels, exist_ok=True)
        hand = (rng.rand(3, 21, frames_per_seq) * 100
                + np.array([0, 0, 500])[:, None, None])
        with open(os.path.join(labels, f"{seq}_SK.pkl"), "wb") as f:
            pickle.dump({"handPara": hand}, f)
        for i in range(frames_per_seq):
            img = base.copy()
            # distinct content per frame (a moving bright square)
            y0 = (37 * i) % 400
            x0 = (53 * i) % 560
            img[y0:y0 + 60, x0:x0 + 60] = rng.randint(
                0, 255, (60, 60, 3), np.uint8)
            Image.fromarray(img).save(
                os.path.join(d, f"SK_color_{i}.png"))
    open(marker, "w").close()
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=96)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--train_epochs", type=int, default=2)
    ap.add_argument("--root", default="/tmp/scat_disk_bench/STB")
    args = ap.parse_args()

    import jax
    from scat_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    from scat_tpu import assets
    from scat_tpu.config import Options
    from scat_tpu.data import native_loader
    from scat_tpu.data.prefetch import prefetch_to_device
    from scat_tpu.data.stb import get_loader_STB
    from scat_tpu.parallel import mesh as mesh_lib
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState
    import __graft_entry__

    bs = args.bs
    # 12 sequences x frames = batches*bs images
    frames = max(args.batches * bs // 12 + 1, 8)
    t0 = time.perf_counter()
    ensure_tree(args.root, frames)
    gen_s = time.perf_counter() - t0

    opt = Options(data_dir=args.root, batch_size=bs)
    loader = get_loader_STB("training", bs=bs, opt=opt)
    assert loader.use_native, "native pipeline unavailable"
    n_batches = len(loader)

    # --- host pipeline alone (native decode+warp+label math); one
    # unmeasured warmup epoch first so the label-math jnp ops' one-time
    # compiles don't pollute the steady-state rate
    import jax.numpy as jnp
    for batch in loader:
        jax.block_until_ready(batch["image"])
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        jax.block_until_ready(batch["image"])
        n += bs
    host_rate = n / (time.perf_counter() - t0)

    # --- full from-disk training (prefetch overlaps decode with step)
    mean = assets.load_mean_params()
    on_tpu = jax.devices()[0].platform != "cpu"
    model, _ = __graft_entry__._flagship(224, use_pallas=on_tpu)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.zeros((1, 224, 224, 3)), train=True)
    tx = schedule.make_optimizer(5e-4, steps_per_epoch=n_batches)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.key(2))
    mesh = mesh_lib.make_mesh()
    state = mesh_lib.replicate_state(mesh, state)
    step = mesh_lib.jit_train_step(
        steps.make_train_step(model, tx, 1e5, 10.0), mesh,
        donate_state=True)

    e2e_rate = None
    for epoch in range(args.train_epochs):
        t0 = time.perf_counter()
        n = 0
        last = None
        for batch in prefetch_to_device(loader, mesh):
            state, stats = step(state, batch)
            last = stats["loss"]
            n += bs
        jax.block_until_ready(last)
        dt = time.perf_counter() - t0
        e2e_rate = n / dt   # keep the last (warm) epoch
        print(f"epoch {epoch}: {e2e_rate:.1f} crops/s from disk "
              f"({n} crops, {dt:.2f}s)")

    device_only = 2386.0   # BENCH_r01 device-rate reference point
    print(json.dumps({
        "metric": "from_disk_train_crops_per_sec",
        "value": round(e2e_rate, 1),
        "host_pipeline_crops_per_sec": round(host_rate, 1),
        "device_only_crops_per_sec": device_only,
        "host_chips_feedable": round(host_rate / device_only, 3),
        "host_cores": os.cpu_count(),
        "batches": n_batches, "batch_size": bs,
        "tree_gen_s": round(gen_s, 1),
    }))


if __name__ == "__main__":
    main()
