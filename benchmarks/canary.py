"""Pinned per-round throughput canary (VERDICT r03 item 3).

Motivation: the headline inference number drifted monotonically across
rounds (12649 -> 11907 -> 11441 crops/s/chip in BENCH_r0{1,2,3}.json)
while train stayed flat.  Each of those is a single rep of bench.py's
K=8 gen-subtraction harness; this script pins a richer protocol and can
run it against ANY round's source tree (``--tree``), so the drift can
be attributed to code or to harness noise with data.

Protocol (all pinned — do not change without renaming the canary):
  * flagship model via __graft_entry__._flagship(224, use_pallas=on_tpu)
  * bs 96, fp32 inputs, canonical head config
  * infer gen-subtraction at K in {8, 32, 64}: jit(gen_only) and
    jit(gen_and_infer) timed on their 2nd launch with fresh PRNG keys
    per rep (the tunnel memoizes identical (program, input) pairs)
  * resident-image scan at K=64 (no datagen in the program at all);
    a scalar rep index perturbs the input to defeat memoization
  * train K=20 rolled scan (bench.py protocol); state donation makes
    every launch unique
  * REPS=3 of everything; all reps reported, median quoted

Usage:
  python benchmarks/canary.py                 # HEAD tree
  python benchmarks/canary.py --tree /tmp/wt_r01 --label r01

Appends one JSON line per run to benchmarks/canary_history.jsonl.
"""
import argparse
import json
import os
import statistics
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--tree", default=os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
parser.add_argument("--label", default="HEAD")
parser.add_argument("--out", default=None,
                    help="history file (default <this dir>/canary_history.jsonl)")
args = parser.parse_args()
sys.path.insert(0, args.tree)

import jax
import jax.numpy as jnp

from scat_tpu import assets
from scat_tpu.data.synthetic import _synth_batch_impl, synth_batch
from scat_tpu.training import schedule, steps
from scat_tpu.training.state import TrainState
import __graft_entry__

assert __graft_entry__.__file__.startswith(args.tree), __graft_entry__.__file__

try:        # round-1 trees predate the compilation-cache helper
    from scat_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
except ImportError:
    pass
REPS = 3
BS, IMG = 96, 224
on_tpu = jax.devices()[0].platform != "cpu"
mean = assets.load_mean_params()
model, _ = __graft_entry__._flagship(IMG, use_pallas=on_tpu)
batch = synth_batch(jax.random.key(0), BS, image_size=IMG, mean_params=mean)
variables = model.init({"params": jax.random.key(0), "mask": jax.random.key(1)},
                       batch["image"], train=True)
params = variables["params"]
bstats = variables.get("batch_stats", {})
template = jnp.asarray(mean[3:].reshape(21, 3))
result = {"label": args.label, "tree": args.tree, "bs": BS}


def launch(fn, *a):
    out = fn(*a)
    jax.block_until_ready(out)


def timed(fn, *a):
    t0 = time.perf_counter()
    launch(fn, *a)
    return time.perf_counter() - t0


# ---- infer: gen-subtraction at K in {8, 32, 64} --------------------
for K in (8, 32, 64):
    def _gen(key, i):
        b = _synth_batch_impl(jax.random.fold_in(key, i), BS, IMG, template)
        return b["image"]

    def gen_only(key):
        def body(i, acc):
            return acc + jnp.sum(_gen(key, i))
        return jax.lax.fori_loop(0, K, body, 0.0)

    def gen_and_infer(p, bs_, key):
        def body(i, acc):
            x = _gen(key, i)
            pred = model.apply({"params": p, "batch_stats": bs_}, x,
                               train=False)[0]
            return acc + jnp.sum(pred) + jnp.sum(x)
        return jax.lax.fori_loop(0, K, body, 0.0)

    gen_jit, both_jit = jax.jit(gen_only), jax.jit(gen_and_infer)
    launch(gen_jit, jax.random.key(1))            # compile
    launch(both_jit, params, bstats, jax.random.key(2))
    reps = []
    for r in range(REPS):
        t_gen = timed(gen_jit, jax.random.key(10 + 2 * r))
        t_both = timed(both_jit, params, bstats, jax.random.key(11 + 2 * r))
        reps.append(BS * K / max(t_both - t_gen, 1e-6))
    result[f"infer_gensub_K{K}"] = [round(x, 1) for x in reps]
    print(f"gen-sub K={K}: {[f'{x:.0f}' for x in reps]} crops/s")

# ---- infer: resident-image scan, K=64 ------------------------------
K = 64
x0 = batch["image"]


def infer_k(p, bs_, x, r):
    def body(acc, _):
        pred = model.apply({"params": p, "batch_stats": bs_},
                           x + (acc + r) * 1e-9, train=False)[0]
        return jnp.sum(pred), None
    out, _ = jax.lax.scan(body, 0.0, None, length=K)
    return out


infer_jit = jax.jit(infer_k)
launch(infer_jit, params, bstats, x0, 99.0)
reps = []
for r in range(REPS):
    t = timed(infer_jit, params, bstats, x0, float(r))
    reps.append(BS * K / t)
result["infer_resident_K64"] = [round(x, 1) for x in reps]
print(f"resident K=64: {[f'{x:.0f}' for x in reps]} crops/s")

# ---- train: K=20 rolled (bench.py protocol) ------------------------
iters = 20 if on_tpu else 3
tx = schedule.make_optimizer(5e-4, steps_per_epoch=100)
state = TrainState.create(params, bstats, tx, jax.random.key(2))
step_fn = steps.make_train_step(model, tx, 1e5, 10.0)


def train_k(state, batch):
    def body(s, _):
        s2, st = step_fn(s, batch)
        return s2, st["loss"]
    return jax.lax.scan(body, state, None, length=iters)


train_jit = jax.jit(train_k, donate_argnums=(0,))
state, losses = train_jit(state, batch)
jax.block_until_ready(losses)
reps = []
for r in range(REPS):
    t0 = time.perf_counter()
    state, losses = train_jit(state, batch)
    jax.block_until_ready(losses)
    reps.append(BS * iters / (time.perf_counter() - t0))
result["train_K20"] = [round(x, 1) for x in reps]
print(f"train K=20: {[f'{x:.0f}' for x in reps]} crops/s")

result["median"] = {k: round(statistics.median(v), 1)
                    for k, v in result.items() if isinstance(v, list)}
out_path = args.out or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "canary_history.jsonl")
with open(out_path, "a") as f:
    f.write(json.dumps(result) + "\n")
print(json.dumps(result))
