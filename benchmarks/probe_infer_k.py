"""Probe: does bench.py's K=8 inference harness underestimate infer throughput?

Measures gen-only vs gen+infer at several K, plus an infer-only variant
that keeps images resident (generated once, reused) to isolate the pure
forward cost.
"""
import time
import jax
import jax.numpy as jnp

from scat_tpu import assets
from scat_tpu.data.synthetic import _synth_batch_impl, synth_batch
from scat_tpu.training import schedule
from scat_tpu.training.state import TrainState
from scat_tpu.utils.profiling import enable_compilation_cache
import __graft_entry__

enable_compilation_cache()
bs, img = 96, 224
mean = assets.load_mean_params()
on_tpu = jax.devices()[0].platform != "cpu"
model, _ = __graft_entry__._flagship(img, use_pallas=on_tpu)
batch = synth_batch(jax.random.key(0), bs, image_size=img, mean_params=mean)
variables = model.init({"params": jax.random.key(0), "mask": jax.random.key(1)},
                       batch["image"], train=True)
params = variables["params"]
bstats = variables.get("batch_stats", {})
template = jnp.asarray(mean[3:].reshape(21, 3))

def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0

for K in (8, 32, 64):
    def _gen(key, i):
        b = _synth_batch_impl(jax.random.fold_in(key, i), bs, img, template)
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

    t_gen = timed(jax.jit(gen_only), jax.random.key(3))
    t_both = timed(jax.jit(gen_and_infer), params, bstats, jax.random.key(4))
    sps = bs * K / max(t_both - t_gen, 1e-6)
    print(f"K={K}: gen {t_gen*1e3:.1f} ms, both {t_both*1e3:.1f} ms, "
          f"diff/K {(t_both-t_gen)/K*1e3:.2f} ms -> {sps:.0f} crops/s")

# infer-only on a resident image, K rolled into one scan
K = 64
x0 = batch["image"]
def infer_k(p, bs_, x):
    def body(acc, _):
        pred = model.apply({"params": p, "batch_stats": bs_},
                           x + acc * 1e-9, train=False)[0]
        return jnp.sum(pred), None
    out, _ = jax.lax.scan(body, 0.0, None, length=K)
    return out
t = timed(jax.jit(infer_k), params, bstats, x0)
print(f"resident-image scan: {t/K*1e3:.2f} ms/fwd -> {bs*K/t:.0f} crops/s")
