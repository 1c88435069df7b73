"""Subprocess worker for tests/test_multihost.py — one PROCESS of a
2-process CPU "multi-host" run (jax.distributed + Gloo collectives,
4 virtual devices per process, 8 global).

Exercises the real multi-host contract end to end:
  * ``data.common`` host sharding (disjoint per-host epoch orders,
    per-host batch sizes),
  * ``mesh.shard_batch`` assembling per-host batches into ONE global
    array via explicit per-device placement (``_assemble_global``),
  * ``mesh.replicate_state`` placing the state across processes,
  * the full jitted train step (forward+loss+backward+Adam) running
    lockstep over both processes.

Process 0 writes a JSON result for the oracle comparison in the test.
The reference has no distributed layer at all (SURVEY.md §2.10).
"""

import json
import os
import sys

# env must be pinned BEFORE jax imports: 4 local CPU devices per
# process, and stretched collective watchdogs (8 virtual devices
# time-share one physical core here)
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=240"
    " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")


def main() -> None:
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    jax.distributed.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_index() == pid
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import numpy as np

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)
    from scat_tpu.data import common
    from scat_tpu.parallel import mesh as mesh_lib
    import mh_common

    # --- host-sharding contract -------------------------------------
    global_bs = mh_common.LOCAL_BS * nproc
    local_bs = common.local_batch_size(global_bs)
    assert local_bs == mh_common.LOCAL_BS, local_bs

    class _D:
        shuffle, seed = True, 7
    order, epoch = common.epoch_order(_D(), 10)
    assert epoch == 0
    assert len(order) == 10 // nproc, order

    # --- global train steps from per-host batches --------------------
    mesh = mesh_lib.make_mesh()  # all 8 global devices on ``data``
    model, mean = mh_common.build_model()
    state, step = mh_common.init_state(model, mesh)
    losses = []
    for s in range(mh_common.N_STEPS):
        gbatch = mesh_lib.shard_batch(mesh,
                                      mh_common.host_batch(pid, s, mean))
        assert gbatch["image"].shape[0] == global_bs, gbatch["image"].shape
        state, stats = step(state, gbatch)
        losses.append(float(np.asarray(stats["loss"])))
    fingerprint = mh_common.params_fingerprint(state)

    # --- FSDP placement + steps (multi-host regression) ---------------
    # fsdp_state must place device-resident init leaves (and the typed
    # PRNG key) onto global shardings — the thing plain device_put
    # rejects multi-process.  The math is the same logical batch/model
    # as plain DP, so the loss trajectory must track the DP one.
    state_f, step_f = mh_common.init_state_fsdp(model, mesh)
    fsdp_losses = []
    for s in range(mh_common.N_STEPS):
        gbatch = mesh_lib.shard_batch(mesh,
                                      mh_common.host_batch(pid, s, mean))
        state_f, stats_f = step_f(state_f, gbatch)
        fsdp_losses.append(float(np.asarray(stats_f["loss"])))

    # --- full Trainer.train() host surface -----------------------------
    # the step loop above exercises the compute path; this exercises
    # everything AROUND it that runs per-host — debug-grid rendering
    # (default --debug True), CSV logger, async checkpoint saver,
    # prefetch thread, CompileBarrierStep.  Regression for: the debug
    # grid's ``batch["image"][0]`` dispatching a slice program on a
    # GLOBAL array from process 0 only, crossing its collectives with
    # process 1's train step (Gloo payload-size abort).
    from scat_tpu.config import BaseOptions
    from scat_tpu.training.trainer import Trainer
    # checkpoint saves are COLLECTIVE (orbax: every process participates
    # in the same save) — the folder must be SHARED across processes
    ck = f"{out_path}.ckpt"
    os.makedirs(ck, exist_ok=True)
    os.chdir(ck)  # debug grid PNG lands here, not in the repo
    topt = BaseOptions().parse(
        ("--net reg_transformer --batch_size 8 --lr 1e-4 --epoch 1 "
         "--synthetic_data True --steps_per_epoch 2 --seed 3 "
         f"--mask_rate 0.2 --checkpoint_folder {ck}").split())
    trainer = Trainer(topt, image_size=32)
    assert trainer.is_main == (pid == 0)
    assert trainer.train_loader.batch_size == 8 // nproc
    trainer.train()

    # --- multi-host eval: full Evaluator surface ----------------------
    # each process injects ITS half of the same logical eval batches;
    # the per-sample MPJPE comes back host-sharded and the final number
    # aggregates across processes (evaluator.py) — the test compares it
    # against a 1-process oracle over the whole batches
    local_eval = [
        {k: v[pid * mh_common.LOCAL_BS:(pid + 1) * mh_common.LOCAL_BS]
         for k, v in mh_common.eval_batch(s, mean).items()}
        for s in range(mh_common.EVAL_BATCHES)]
    ev = mh_common.build_evaluator(
        ("--net reg_transformer --batch_size 16 --compute_dtype float32 "
         f"--result_dir {ck}/eval_out").split(),
        mh_common.IMAGE_SIZE, local_eval)
    eres = ev.eval()

    result = {"pid": pid, "global_devices": jax.device_count(),
              "order": [int(i) for i in order],
              "losses": losses, "fingerprint": fingerprint,
              "fsdp_losses": fsdp_losses,
              "trainer_ok": True,
              "eval_mpjpe_mm": float(eres["mpjpe_mm"]),
              "eval_auc": float(eres["auc"])}
    # every process writes its own file; the test cross-checks both
    with open(f"{out_path}.{pid}", "w") as f:
        json.dump(result, f)
    print(f"[worker {pid}] ok losses={losses}", flush=True)


if __name__ == "__main__":
    main()
