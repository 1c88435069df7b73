"""Inference batch-size scaling on the chip (round-4 review, Weak #5).

The train step has a batch-scaling table; inference was only ever
benched at bs 96.  This probe runs the bench.py gen-subtraction
protocol (on-device input generation inside the program, K rolled
forwards, datagen time subtracted) across bs {96, 192, 384, 768, 1024},
3 reps each, reporting median crops/s and relative spread — locating
the serving sweet spot instead of extrapolating from one point.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python benchmarks/probe_infer_scaling.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from scat_tpu import assets
    from scat_tpu.data.synthetic import _synth_batch_impl
    from scat_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    import __graft_entry__

    image_size = 224
    on_tpu = jax.devices()[0].platform != "cpu"
    model, mean = __graft_entry__._flagship(image_size,
                                            use_pallas=on_tpu)
    template = jnp.asarray(mean[3:].reshape(21, 3))
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.zeros((2, image_size, image_size, 3), jnp.float32),
        train=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    sizes = tuple(int(s) for s in os.environ.get(
        "SCAT_INFER_SIZES", "96,192,384,768,1024").split(","))
    reps = int(os.environ.get("SCAT_BENCH_REPS", 3))
    results = {}
    for bs in sizes:
        # keep each timed window ~2k-8k crops so launch overhead
        # stays amortized without minutes-long windows at bs 1024
        K = max(4, 4096 // bs) if on_tpu else 2

        def gen(key, i):
            return _synth_batch_impl(jax.random.fold_in(key, i), bs,
                                     image_size, template)["image"]

        def gen_only(key):
            def body(i, acc):
                return acc + jnp.sum(gen(key, i))
            return jax.lax.fori_loop(0, K, body, 0.0)

        def gen_and_infer(p, b, key):
            def body(i, acc):
                img = gen(key, i)
                pred = model.apply({"params": p, "batch_stats": b},
                                   img, train=False)[0]
                return acc + jnp.sum(pred) + jnp.sum(img)
            return jax.lax.fori_loop(0, K, body, 0.0)

        gen_jit = jax.jit(gen_only)
        both_jit = jax.jit(gen_and_infer)
        float(gen_jit(jax.random.key(1)))       # compile+warm (fetch)
        float(both_jit(params, bstats, jax.random.key(2)))
        rates = []
        for r in range(reps):
            t0 = time.perf_counter()
            float(gen_jit(jax.random.key(3 + 2 * r)))
            t_gen = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(both_jit(params, bstats, jax.random.key(4 + 2 * r)))
            t_both = time.perf_counter() - t0
            rates.append(bs * K / max(t_both - t_gen, 1e-6))
        rates.sort()
        med = rates[len(rates) // 2]
        results[f"bs{bs}"] = {
            "crops_per_sec": round(med, 1),
            "spread": round((max(rates) - min(rates)) / med, 4),
            "K": K,
            "ms_per_batch": round(bs / med * 1000, 3),
        }
        r = results[f"bs{bs}"]
        print(f"bs{bs:5d}: {r['crops_per_sec']:9.1f} crops/s  "
              f"({r['ms_per_batch']:7.3f} ms/batch, K={K}, "
              f"spread {r['spread'] * 100:.1f}%)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
