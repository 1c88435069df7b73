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


def _run(module, argv, timeout=900):
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
    # single virtual device: the 8-device rendezvous on this 1-core
    # host stalls under concurrent suite load; the JSON contract and
    # the train/infer measurement path are device-count independent
    env = dict(ENV, SCAT_BENCH_BS="4", SCAT_BENCH_IMG="64",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu'); "
         "import bench; bench.main()"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    assert data["metric"] == "train_samples_per_sec_per_chip"
    assert data["value"] > 0
    assert data["unit"] == "hand-crops/s/chip"


def test_demo_and_test_cli_importable():
    """The demo/test entry shims exist, import, and expose the
    reference's shipped-__main__ flows (eval.py:1073-1076 runs demo())."""
    import importlib
    for mod in ("scat_tpu.demo", "scat_tpu.test"):
        m = importlib.import_module(mod)
        assert callable(m.main)


@pytest.mark.slow
def test_test_cli_runs_on_rgb_folder(tmp_path):
    """python -m scat_tpu.test over a folder of crops (reference
    test.py:297-303 uses ./rgb/) produces overlays + param dumps."""
    import numpy as np
    from PIL import Image
    rgb = tmp_path / "rgb"
    rgb.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray((rng.rand(224, 224, 3) * 255).astype(np.uint8)
                        ).save(rgb / f"im{i}.jpg")
    out = tmp_path / "out"
    # empty checkpoint path = explicit from-scratch weights (a missing
    # .pth now fails loudly, matching torch.load)
    code = (BOOT + "from scat_tpu.config import BaseOptions; "
            "from scat_tpu.evaluation.tester import Tester; "
            f"opt = BaseOptions().parse(['--result_dir', r'{out}', "
            "'--compute_dtype', 'float32', "
            "'--checkpoint_path_eval', '']); "
            f"Tester(opt).test(r'{rgb}')")
    r = subprocess.run([sys.executable, "-c", code], env=ENV,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    dumps = list(out.glob("*_params.txt"))
    assert len(dumps) == 2, list(out.iterdir())


@pytest.mark.slow
def test_validate_then_train_from_disk_contract(tmp_path):
    """The validator's literal contract (README "Real datasets"):
    scat-validate-data exit 0 on a tree => training runs from THAT
    tree.  Validate a synthetic STB tree through the CLI, then run a
    real 1-epoch stage-3 train with --data_dir pointing at it."""
    from tests.test_stb import _write_synthetic_stb
    data_dir = str(_write_synthetic_stb(tmp_path, n=8))
    r = _run("scat_tpu.validate_data",
             ["--data_dir", data_dir, "--dataset", "stb"])
    assert r.returncode == 0, r.stdout[-2000:]
    ckpt = tmp_path / "ckpt"
    r2 = _run("scat_tpu.train", [
        "--net", "reg_transformer", "--batch_size", "4", "--epoch", "1",
        "--lr", "1e-3", "--l_weight_3d", "1000", "--l_weight_2d", "1",
        "--vit_heads", "2", "--iteration", "1", "--mask_rate", "0.0",
        "--stage", "3", "--data_dir", data_dir,
        "--compute_dtype", "float32", "--use_pallas_attention", "False",
        "--checkpoint_folder", str(ckpt), "--log_every", "1"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Finished Training" in r2.stdout
    assert (ckpt / "hand_net_final").exists()
