"""On-chip throughput for EVERY --net variant (VERDICT r2 #9).

One row per variant at its canonical config (bs 96, iteration 3,
heads 8, mask 0.2 — script/ablation_pose.sh:5): inference crops/s/chip
(reference eval FPS protocol) and train crops/s/chip.  The 66-dim
keypoint heads (reg_transformer, coarse, ViT, ViP) train through the
real SCAT keypoint step; the 61-dim MANO-parameter heads (hrnet,
incepv3, frankmocap) have NO training driver in the reference
(train.py:53-57 handles only reg_transformer), so their "train" row is
fwd+bwd+Adam under an L2 proxy loss on the 61-dim output — labeled as
such.

Timing: K steps rolled into one program, fresh on-device inputs per
launch (axon memoization, see MEMORY).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_variants.py [--nets a,b]
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import optax

K = 10
BS = int(os.environ.get("SCAT_BENCH_BS", 96))
IMG = int(os.environ.get("SCAT_BENCH_IMG", 224))

KEYPOINT_NETS = ("reg_transformer", "reg_transformer_coarse",
                 "ViT", "ViP")
ALL_NETS = KEYPOINT_NETS + ("backbone_hrnet", "backbone_incepv3",
                            "frankmocap")


def bench_net(net: str, roofline: bool = False):
    from scat_tpu.config import Options
    from scat_tpu.data.synthetic import _synth_batch_impl
    from scat_tpu.models import build_model
    from scat_tpu.models import losses as losses_lib
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState
    from scat_tpu import assets

    on_tpu = jax.devices()[0].platform != "cpu"
    use_pallas = on_tpu and not os.environ.get("SCAT_BENCH_NO_PALLAS")
    opt = Options(net=net, iteration=3, vit_heads=8, mask_rate=0.2,
                  batch_size=BS, use_pallas_attention=use_pallas)
    model, mean = build_model(opt, IMG)
    mean_arr = assets.load_mean_params()
    template = jnp.asarray(mean_arr[3:].reshape(21, 3))

    def gen(key):
        return _synth_batch_impl(key, BS, IMG, template)

    batch0 = gen(jax.random.key(0))
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1),
         "dropout": jax.random.key(2)}, batch0["image"], train=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    consts = variables.get("constants", {})  # ViP's frozen projection

    def mkvars(p, bs):
        v = {"params": p, "batch_stats": bs}
        if consts:
            v["constants"] = consts
        return v

    def timed_once(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / K

    # --- inference ---
    def infer_k(seed):
        def body(i, acc):
            b = gen(jax.random.fold_in(jax.random.key(0), seed + i))
            out = model.apply(mkvars(params, bstats),
                              b["image"], train=False)
            pred = out[0] if isinstance(out, tuple) else out
            return acc + jnp.sum(pred.astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, 0.0)

    infer_dt = timed_once(jax.jit(infer_k), jnp.int32(3))
    row = {"net": net, "infer_sps_chip": round(BS / infer_dt, 1)}

    # --- training ---
    tx = schedule.make_optimizer(5e-4, steps_per_epoch=100)
    if net in KEYPOINT_NETS:
        raw_step = steps.make_train_step(model, tx, 1e5, 10.0)
        row["train_loss"] = "scat_keypoint"
    else:
        def raw_step(state, b):
            def loss_fn(p):
                outputs, mut = model.apply(
                    mkvars(p, state.batch_stats),
                    b["image"], train=True,
                    rngs={"mask": jax.random.key(1),
                          "dropout": jax.random.key(2)},
                    mutable=["batch_stats"])
                pred = outputs[0] if isinstance(outputs, tuple) \
                    else outputs
                return jnp.mean(pred.astype(jnp.float32) ** 2), mut
            (l, mut), g = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(g, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=mut["batch_stats"],
                opt_state=new_opt), {"loss": l}
        row["train_loss"] = "l2_proxy (no reference trainer)"

    state = TrainState.create(params, bstats, tx, jax.random.key(9),
                              constants=consts)

    def train_k(state, seed):
        def body(s, i):
            b = gen(jax.random.fold_in(jax.random.key(1), seed + i))
            s2, st = raw_step(s, b)
            return s2, st["loss"]
        return jax.lax.scan(body, state, jnp.arange(K))

    train_jit = jax.jit(train_k, donate_argnums=(0,))
    state, _ = train_jit(state, jnp.int32(0))
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    state, losses = train_jit(state, jnp.int32(1))
    jax.block_until_ready(losses)
    train_dt = (time.perf_counter() - t0) / K
    row["train_sps_chip"] = round(BS / train_dt, 1)
    row["train_ms_step"] = round(train_dt * 1000, 2)

    if roofline:
        # XLA's own accounting of the BARE step (no in-loop datagen):
        # flops + pre-fusion "bytes accessed" (an upper bound on HBM
        # traffic), as in probe_backward.py.  Effective TFLOP/s uses
        # the K-rolled time above, which INCLUDES datagen (~5-10%
        # padding) — the derived utilization is therefore a floor.
        try:
            ca = jax.jit(raw_step).lower(
                state, batch0).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", float("nan")))
            nbytes = float(ca.get("bytes accessed", float("nan")))
            row["step_tflop"] = round(flops / 1e12, 3)
            row["step_gbytes_accessed"] = round(nbytes / 1e9, 2)
            row["eff_tflops"] = round(flops / 1e12 / train_dt, 1)
            row["flops_bound_ms"] = round(flops / 197e12 * 1e3, 2)
            row["bytes_bound_ms"] = round(nbytes / 820e9 * 1e3, 2)
        except Exception as e:
            row["cost_analysis_error"] = str(e)[:500]
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nets", default=",".join(ALL_NETS))
    ap.add_argument("--roofline", action="store_true",
                    help="add XLA cost_analysis (flops / bytes / "
                         "effective TFLOP/s) per variant")
    args = ap.parse_args()
    rows = []
    for net in args.nets.split(","):
        try:
            row = bench_net(net.strip(), roofline=args.roofline)
        except Exception as e:  # keep the sweep alive; report the hole
            row = {"net": net, "error": repr(e)[:2000]}
        print(json.dumps(row), flush=True)
        rows.append(row)
    print(json.dumps({"variants": rows}))


if __name__ == "__main__":
    main()
