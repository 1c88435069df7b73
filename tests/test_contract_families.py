"""validate -> train -> eval contract for all five dataset families
(round-4 review, Next #8).

Each test generates a synthetic-but-schema-exact disk tree, runs the
REAL CLIs end to end on it — ``scat-validate-data`` exit 0, then
``python -m scat_tpu.train`` from the same tree, then the family's
reference consumption surface from the same tree:

  * STB / FreiHAND / HO-3D -> ``python -m scat_tpu.eval`` (the
    benchmark eval, reference eval.py:788-1053);
  * MHP -> ``python -m scat_tpu.demo`` (MHP has no benchmark eval in
    the reference; its eval-side surface is the MHP_eval temporal demo,
    eval.py:601-634);
  * RHD -> the stage-2 training mix (RHD's ONLY reference surface —
    train.py names it in the finetune mix and nothing else consumes
    it), then ``scat_tpu.eval`` on the co-resident STB tree.

This extends the round-4 validate->train contract (tests/test_cli.py)
to the eval leg and to every family.
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# CPU-forced like tests/test_cli.py: the axon sitecustomize (on
# PYTHONPATH) force-selects the TPU tunnel at interpreter start even
# with JAX_PLATFORMS=cpu in the env — the BOOT must re-pin the platform
# before the module runs, or these "CPU" subprocesses silently contend
# for the single-chip tunnel
ENV = dict(os.environ,
           JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=8",
           SCAT_FORCE_CPU="1",
           PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                         ""))
BOOT = ("import jax; jax.config.update('jax_platforms','cpu'); "
        "import runpy, sys; ")


def _run(module, argv, timeout=900):
    cmd = [sys.executable, "-c",
           BOOT + f"sys.argv=['{module}']+{argv!r}; "
           f"runpy.run_module('{module}', run_name='__main__')"]
    return subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout, env=ENV)


_TRAIN_COMMON = [
    "--net", "reg_transformer", "--batch_size", "4", "--epoch", "1",
    "--lr", "1e-3", "--l_weight_3d", "1000", "--l_weight_2d", "1",
    "--vit_heads", "2", "--iteration", "1", "--mask_rate", "0.0",
    "--compute_dtype", "float32", "--use_pallas_attention", "False",
    "--log_every", "1"]

_EVAL_COMMON = [
    "--net", "reg_transformer", "--batch_size", "4", "--vit_heads", "2",
    "--iteration", "1", "--mask_rate", "0.0",
    "--compute_dtype", "float32", "--use_pallas_attention", "False"]


def _validate(data_dir, family):
    r = _run("scat_tpu.validate_data",
             ["--data_dir", data_dir, "--dataset", family])
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-1000:])


def _train(data_dir, stage, ckpt):
    r = _run("scat_tpu.train", _TRAIN_COMMON + [
        "--stage", str(stage), "--data_dir", data_dir,
        "--checkpoint_folder", str(ckpt)])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Finished Training" in r.stdout
    final = os.path.join(str(ckpt), "hand_net_final")
    assert os.path.exists(final), os.listdir(str(ckpt))
    return final, r


def _eval(data_dir, eval_dataset, final, out):
    r = _run("scat_tpu.eval", _EVAL_COMMON + [
        "--eval_dataset", eval_dataset, "--data_dir", data_dir,
        "--checkpoint_path_eval", final, "--result_dir", str(out)])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "*** Final Results ***" in r.stdout, r.stdout[-2000:]
    mpjpe = [ln for ln in r.stdout.splitlines()
             if ln.startswith("MPJPE:")]
    assert mpjpe and np.isfinite(float(mpjpe[-1].split()[-1]))
    assert os.path.exists(os.path.join(str(out), "eval_metrics.csv"))
    return r


@pytest.mark.slow
def test_contract_stb(tmp_path):
    from tests.test_stb import _write_synthetic_stb
    (tmp_path / "STB").mkdir()
    data_dir = str(_write_synthetic_stb(tmp_path / "STB", n=4))
    _validate(data_dir, "stb")
    final, _ = _train(data_dir, 3, tmp_path / "ckpt")
    _eval(data_dir, "STB", final, tmp_path / "out")


@pytest.mark.slow
def test_contract_frei(tmp_path):
    from tests.test_freihand import _write_synthetic_frei
    root = str(_write_synthetic_frei(tmp_path, n=8, img_size=224)[0])
    _validate(root, "frei")
    final, _ = _train(root, 4, tmp_path / "ckpt")
    _eval(root, "frei", final, tmp_path / "out")


@pytest.mark.slow
def test_contract_ho3d(tmp_path):
    from tests.test_ho3d import _write_synthetic_ho3d
    root = str(_write_synthetic_ho3d(tmp_path, frames=8)[0])
    _validate(root, "ho3d")
    final, _ = _train(root, 5, tmp_path / "ckpt")
    _eval(root, "ho3d", final, tmp_path / "out")


@pytest.mark.slow
def test_contract_mhp(tmp_path):
    """MHP: stage-6 train, then the MHP_eval demo flow (the reference's
    eval-side MHP surface) over the SAME tree's data_15_cam_1 — the
    hardcoded demo sequence (reference eval.py:605)."""
    from tests.test_validate_data import _write_mhp_valid
    root = tmp_path / "MHP"
    root.mkdir()
    _write_mhp_valid(str(root), n_frames=8)
    # the demo flow reads the reference-hardcoded sequence name
    os.rename(root / "annotated_frames" / "data_1",
              root / "annotated_frames" / "data_15")
    os.rename(root / "calibrations" / "data_1",
              root / "calibrations" / "data_15")
    _validate(str(root), "mhp")
    final, _ = _train(str(root), 6, tmp_path / "ckpt")
    out = tmp_path / "out"
    r = _run("scat_tpu.demo", _EVAL_COMMON + [
        "--eval_dataset", "MHP", "--data_dir", str(root),
        "--checkpoint_path_eval", final, "--result_dir", str(out)])
    assert r.returncode == 0, r.stderr[-3000:]
    imgs = list((out / "img").iterdir())
    assert imgs, "demo produced no frames"


@pytest.mark.slow
def test_contract_rhd(tmp_path):
    """RHD: its only reference surface is the stage-2 finetune mix
    (train.py / MultiDataset.py) — build the full sibling-convention
    tree (STB + FreiHAND + HO3D + RHD_published_v2), validate the RHD
    subtree, train stage 2, and prove RHD actually joined the mix: it
    is authored as the SHORTEST member, and ConcatDataset truncates the
    epoch to the shortest member's length."""
    from tests.test_stb import _write_synthetic_stb
    from tests.test_freihand import _write_synthetic_frei
    from tests.test_ho3d import _write_synthetic_ho3d
    from tests.test_validate_data import _write_rhd_valid

    root = tmp_path
    stb_dir = root / "STB"
    stb_dir.mkdir()
    _write_synthetic_stb(stb_dir, n=4)          # 40 train samples
    _write_synthetic_frei(root, n=8, img_size=224)   # root/FreiHAND
    _write_synthetic_ho3d(root, frames=8)       # root/HO3D
    rhd_dir = root / "RHD_published_v2"
    rhd_dir.mkdir()
    # RHD yields a crop per HAND (2/frame): 2 frames -> 4 crops -> the
    # SHORTEST member at bs 4 (1 batch; frei/ho3d/STB give >= 2)
    _write_rhd_valid(str(rhd_dir), n=2)
    _validate(str(rhd_dir), "rhd")

    final, r = _train(str(stb_dir), 2, tmp_path / "ckpt")
    assert "[STAGE][2]" in r.stdout
    assert "RHD tree present but unreadable" not in r.stdout
    # shortest-member truncation: every other member yields >= 2
    # batches at bs 4, so "batch num 1" proves the 4-sample RHD member
    # joined the zip and bounded the epoch (trainer.py:144-145)
    assert "batch num 1" in r.stdout, r.stdout[-2000:]
    _eval(str(stb_dir), "STB", final, tmp_path / "out")
