"""CLI entry-point smoke tests (subprocess, CPU-forced) — the
``python -m scat_tpu.train`` / ``scat_tpu.eval`` surfaces."""

import json
import os
import subprocess
import sys

import pytest

ENV = dict(os.environ,
           XLA_FLAGS="--xla_force_host_platform_device_count=8",
           SCAT_FORCE_CPU="1")

BOOT = ("import jax; jax.config.update('jax_platforms','cpu'); "
        "import runpy, sys; ")


def _run(module, argv, timeout=420):
    cmd = [sys.executable, "-c",
           BOOT + f"sys.argv=['{module}']+{argv!r}; "
           f"runpy.run_module('{module}', run_name='__main__')"]
    return subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout, env=ENV)


@pytest.mark.slow
def test_train_cli_synthetic(tmp_path):
    r = _run("scat_tpu.train", [
        "--net", "reg_transformer", "--batch_size", "8", "--epoch", "1",
        "--lr", "1e-3", "--l_weight_3d", "1000", "--l_weight_2d", "1",
        "--vit_heads", "2", "--iteration", "1", "--mask_rate", "0.2",
        "--synthetic_data", "True", "--steps_per_epoch", "2",
        "--compute_dtype", "float32", "--use_pallas_attention", "False",
        "--checkpoint_folder", str(tmp_path), "--log_every", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Finished Training" in r.stdout
    assert "loss:" in r.stdout  # reference print format
    assert (tmp_path / "hand_net_final").exists()


@pytest.mark.slow
def test_bench_cli_cpu():
    env = dict(ENV, SCAT_BENCH_BS="4", SCAT_BENCH_IMG="64")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu'); "
         "import bench; bench.main()"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    assert data["metric"] == "train_samples_per_sec_per_chip"
    assert data["value"] > 0
    assert data["unit"] == "hand-crops/s/chip"
