"""ViP FAVOR+ precision ladder (VERDICT r03 item 1).

ViP is the one head at its COMPOSITE roofline bound (305 ms/step ~
flops-bound 84 + bytes-bound 199, RESULTS.md), with the repo's own
diagnosis placing the time in the HIGHEST-precision exp dots of the
FAVOR+ feature chain (models/performer.py).  Every rung below HIGHEST
was unmeasured — this probe measures them all, at train scale:

  ladder (feature-dot w^T x feeding exp / contraction dots D, kp^T v,
  qp kptv — models/performer.py favor_precisions):
    highest    = HIGHEST / HIGHEST   (round-3 default)
    high       = HIGH / HIGH         (bf16x3 passes)
    default    = DEFAULT / DEFAULT   (native bf16 MXU rate)
    mixed      = HIGHEST / DEFAULT   (exact exp input, fast averaging)
    mixed_high = HIGH / DEFAULT

Measurements per rung:
  1. full ViP train step, bs 96, K=10 rolled (the decision number)
  2. full ViP eval forward, same harness
  3. numeric error of the ViP forward (66-dim pred) vs the
     highest-rung forward on identical params/input
  4. FAVOR-vs-exact-softmax attention error at matched scale — the
     context that decides whether a rung's *precision* error matters:
     FAVOR+ is itself an approximation; a rung whose added error is
     << the approximation error is numerically free.

Usage: PYTHONPATH=/root/repo python benchmarks/probe_vip_precision.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu import assets
from scat_tpu.config import Options
from scat_tpu.data.synthetic import _synth_batch_impl
from scat_tpu.models import build_model
from scat_tpu.models.performer import favor_attention
from scat_tpu.training import schedule, steps
from scat_tpu.training.state import TrainState
from scat_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()
K = 10
BS = int(os.environ.get("SCAT_BENCH_BS", 96))
IMG = int(os.environ.get("SCAT_BENCH_IMG", 224))
RUNGS = ("highest", "high", "default", "mixed", "mixed_high")

mean_arr = assets.load_mean_params()
template = jnp.asarray(mean_arr[3:].reshape(21, 3))


def gen(key):
    return _synth_batch_impl(key, BS, IMG, template)


def timed_once(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / K


# --------------------------------------------------------------------
# 4) FAVOR-vs-softmax approximation context (small scale, f64-capable)
# --------------------------------------------------------------------
def softmax_attention_exact(q, k, v):
    logits = jnp.einsum("...td,...sd->...ts", q, k,
                        precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("...ts,...sd->...td", jax.nn.softmax(logits), v,
                      precision=jax.lax.Precision.HIGHEST)


def approximation_context():
    """max|err| of FAVOR+ vs exact softmax per rung, plus rung-vs-
    HIGHEST deltas, at B4 H4 T512 e128 m64 f32."""
    kq, kk, kv, kw = jax.random.split(jax.random.key(7), 4)
    shape = (4, 4, 512, 128)
    # the reference scales q,k by emb^-1/4 before FAVOR
    # (vision_performer.py:49-50 uses unscaled; LN keeps |x| ~ O(1))
    q = jax.random.normal(kq, shape) * 0.3
    k = jax.random.normal(kk, shape) * 0.3
    v = jax.random.normal(kv, shape)
    w = jax.random.normal(kw, (64, 128))
    exact = softmax_attention_exact(q, k, v)
    ref = favor_attention(q, k, v, w, precision="highest")
    rows = {}
    approx_err = float(jnp.max(jnp.abs(ref - exact)))
    for rung in RUNGS:
        out = favor_attention(q, k, v, w, precision=rung)
        rows[rung] = {
            "vs_highest_rung": float(jnp.max(jnp.abs(out - ref))),
            "vs_exact_softmax": float(jnp.max(jnp.abs(out - exact))),
        }
    return approx_err, rows


# --------------------------------------------------------------------
# 1-3) full ViP step per rung
# --------------------------------------------------------------------
def bench_rung(rung: str):
    opt = Options(net="ViP", iteration=3, batch_size=BS,
                  favor_precision=rung)
    model, _ = build_model(opt, IMG)
    batch0 = gen(jax.random.key(0))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(2)},
        batch0["image"], train=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    consts = variables["constants"]

    def mkvars(p):
        return {"params": p, "batch_stats": bstats,
                "constants": consts}

    # numeric error of the forward vs this input's highest-rung forward
    pred = jax.jit(lambda p, x: model.apply(
        mkvars(p), x, train=False)[0])(params, batch0["image"])

    def infer_k(seed):
        def body(i, acc):
            b = gen(jax.random.fold_in(jax.random.key(0), seed + i))
            out = model.apply(mkvars(params), b["image"], train=False)
            return acc + jnp.sum(out[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, K, body, 0.0)

    infer_dt = timed_once(jax.jit(infer_k), jnp.int32(3))

    tx = schedule.make_optimizer(5e-4, steps_per_epoch=100)
    raw_step = steps.make_train_step(model, tx, 1e5, 10.0)
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
    return {
        "rung": rung,
        "train_ms_step": round(train_dt * 1e3, 1),
        "train_sps_chip": round(BS / train_dt, 1),
        "infer_ms": round(infer_dt * 1e3, 2),
        "infer_sps_chip": round(BS / infer_dt, 1),
        "final_loss": float(losses[-1]),
    }, np.asarray(pred)


def main():
    approx_err, ctx = approximation_context()
    print(f"FAVOR-vs-exact-softmax approximation err (B4H4T512, "
          f"m=64): {approx_err:.3e}", flush=True)
    for rung, row in ctx.items():
        print(f"  {rung:11s}: vs HIGHEST rung {row['vs_highest_rung']:.3e}"
              f", vs exact softmax {row['vs_exact_softmax']:.3e}",
              flush=True)

    rows, preds = [], {}
    for rung in RUNGS:
        row, pred = bench_rung(rung)
        preds[rung] = pred
        err = float(np.max(np.abs(pred - preds["highest"]))) \
            if "highest" in preds else 0.0
        row["pred_err_vs_highest"] = err
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"approximation_err": approx_err,
                      "context": ctx, "rungs": rows}))


if __name__ == "__main__":
    main()
