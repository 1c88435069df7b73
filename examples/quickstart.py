"""Quickstart: the full user journey in one script.

  1. train the flagship SCAT model a few steps on the in-memory
     synthetic dataset (no downloads needed),
  2. evaluate it (PA-MPJPE / AUC / PCK, the reference's protocol),
  3. export the trained weights as a reference-keyed ``hand_net.pth``
     that the original torch code loads unchanged,
  4. reload that .pth back through the eval path.

Run on CPU anywhere:
  JAX_PLATFORMS=cpu python examples/quickstart.py
On a TPU host just drop the env var.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from scat_tpu import assets
    from scat_tpu.config import BaseOptions
    from scat_tpu.data.synthetic import synth_batch
    from scat_tpu.evaluation.evaluator import Evaluator
    from scat_tpu.models import build_model
    from scat_tpu.parallel import mesh as mesh_lib
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState
    from scat_tpu.utils.torch_import import (
        export_torch_encoder_transformer)

    on_cpu = jax.devices()[0].platform == "cpu"
    img = 64 if on_cpu else 224
    opt = BaseOptions().parse(
        ("--net reg_transformer --vit_heads 2 --iteration 1 "
         "--batch_size 8 --mask_rate 0.2 --l_weight_3d 100000 "
         "--l_weight_2d 10 --compute_dtype float32 "
         "--use_pallas_attention " + str(not on_cpu)).split())

    # 1. train
    model, mean = build_model(opt, image_size=img)
    batch = synth_batch(jax.random.key(0), opt.batch_size, img, mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"])
    tx = schedule.make_optimizer(opt.lr, steps_per_epoch=8)
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx,
                              jax.random.key(2))
    mesh = mesh_lib.make_mesh()
    state = mesh_lib.replicate_state(mesh, state)
    step = mesh_lib.jit_train_step(
        steps.make_train_step(model, tx, opt.l_weight_3d,
                              opt.l_weight_2d), mesh)
    for i in range(24):
        b = synth_batch(jax.random.key(10 + i), opt.batch_size, img,
                        mean)
        state, stats = step(state, mesh_lib.shard_batch(mesh, b))
        if i % 8 == 0:
            print(f"step {i:3d}  loss {float(stats['loss']):12.1f}")

    # 2. evaluate on held-out synthetic batches
    held_out = [synth_batch(jax.random.key(999 + i), opt.batch_size,
                            img, mean) for i in range(2)]
    ev = Evaluator(opt, image_size=img, dataset=held_out,
                   variables={"params": state.params,
                              "batch_stats": state.batch_stats})
    res = ev.eval()

    # 3. export for the torch reference
    sd = export_torch_encoder_transformer(
        jax.device_get(state.params), jax.device_get(state.batch_stats))
    try:
        import torch
        pth = os.path.join(opt.result_dir, "hand_net.pth")
        os.makedirs(opt.result_dir, exist_ok=True)
        torch.save({k: torch.as_tensor(np.array(v))
                    for k, v in sd.items()}, pth)
        print(f"exported {len(sd)} tensors -> {pth}")

        # 4. and reload it through the .pth eval path
        opt2 = BaseOptions().parse(
            ["--net", "reg_transformer", "--vit_heads", "2",
             "--iteration", "1", "--batch_size", "8",
             "--compute_dtype", "float32", "--use_pallas_attention",
             "False", "--result_dir", opt.result_dir,
             "--checkpoint_path_eval", pth])
        ev2 = Evaluator(opt2, image_size=img, dataset=held_out)
        res2 = ev2.eval()
        assert abs(res2["mpjpe_mm"] - res["mpjpe_mm"]) < 1e-3
        print("reloaded .pth reproduces the evaluation exactly")
    except ImportError:
        print("torch unavailable; skipping export demo")
    print(f"done: PA-MPJPE {res['mpjpe_mm']:.2f} mm, "
          f"AUC {res['auc']:.1f}")


if __name__ == "__main__":
    main()
