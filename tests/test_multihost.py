"""True multi-process ("multi-host") training-path test.

Spawns TWO OS processes, each with 4 virtual CPU devices, joined by
``jax.distributed.initialize`` into one 8-device platform — the same
topology as two TPU hosts on a pod slice (DCN between processes).
Each process feeds its own half of every logical batch (the
``data.common`` host-sharding contract) and the jitted train step runs
lockstep over the global mesh.

The oracle is the SAME two steps run single-process on this suite's
8 virtual devices with the per-host batches concatenated in process
order — losses and updated-parameter fingerprints must agree to
reduction-order tolerance.

The reference has no distributed execution at all (DDP is imported but
never constructed, reference train.py:18; SURVEY.md §2.10).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mh") / "result.json")
    port = _free_port()
    env = dict(os.environ)
    # the worker pins its own XLA_FLAGS/platform before importing jax
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), out],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in range(2)]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"
    results = []
    for pid in range(2):
        with open(f"{out}.{pid}") as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
def test_two_process_topology_and_host_sharding(worker_results):
    r0, r1 = worker_results
    assert r0["global_devices"] == r1["global_devices"] == 8
    # per-host epoch orders: equal length, disjoint, same permutation
    # sharded (together they tile the epoch like a DistributedSampler)
    o0, o1 = set(r0["order"]), set(r1["order"])
    assert len(r0["order"]) == len(r1["order"]) == 5
    assert not (o0 & o1), (o0, o1)
    assert (o0 | o1) <= set(range(10))
    # the full Trainer.train() host surface (debug grid, CSV logger,
    # async saver, prefetch, compile barrier) completed on both hosts
    assert r0["trainer_ok"] and r1["trainer_ok"]


@pytest.mark.slow
def test_two_process_step_matches_single_process_oracle(worker_results):
    r0, r1 = worker_results
    # both processes computed identical (replicated) losses/params
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-5)
    np.testing.assert_allclose(r0["fingerprint"], r1["fingerprint"],
                               rtol=1e-5)

    # oracle: same two steps, single process, global batches formed by
    # concatenating the per-host halves in process order
    import jax
    from scat_tpu.parallel import mesh as mesh_lib
    import mh_common

    mesh = mesh_lib.make_mesh(devices=jax.devices()[:8])
    model, mean = mh_common.build_model()
    state, step = mh_common.init_state(model, mesh)
    losses = []
    for s in range(mh_common.N_STEPS):
        halves = [mh_common.host_batch(pid, s, mean) for pid in range(2)]
        batch = {k: np.concatenate([h[k] for h in halves])
                 for k in halves[0]}
        state, stats = step(state, mesh_lib.shard_batch(mesh, batch))
        losses.append(float(np.asarray(stats["loss"])))
    fingerprint = mh_common.params_fingerprint(state)

    # step 1 runs on IDENTICAL state+data in both topologies — only
    # collective reduction order differs, so the match is tight.  Step 2
    # runs on post-Adam params: Adam's first update is ~sign(grad)*lr,
    # and any param whose gradient magnitude is at reduction-noise level
    # flips sign between topologies, so the trajectory comparison is
    # inherently looser (it still catches the real failure modes this
    # test exists for — wrong batch assembly / per-host duplication /
    # partial BN statistics showed up as 35-45%% here).
    np.testing.assert_allclose(r0["losses"][:1], losses[:1], rtol=1e-4)
    np.testing.assert_allclose(r0["losses"][1:], losses[1:], rtol=1e-2)
    np.testing.assert_allclose(r0["fingerprint"], fingerprint, rtol=1e-4)


@pytest.mark.slow
def test_two_process_fsdp_tracks_dp(worker_results):
    """FSDP placement works multi-process (fsdp_state via _put_global)
    and its loss trajectory tracks plain DP: same logical math, only
    all-gather/reduce-scatter order differs."""
    r0, r1 = worker_results
    np.testing.assert_allclose(r0["fsdp_losses"], r1["fsdp_losses"],
                               rtol=1e-5)
    np.testing.assert_allclose(r0["fsdp_losses"][:1], r0["losses"][:1],
                               rtol=1e-4)
    np.testing.assert_allclose(r0["fsdp_losses"][1:], r0["losses"][1:],
                               rtol=1e-2)


@pytest.mark.slow
def test_two_process_eval_matches_single_process_oracle(
        worker_results, tmp_path):
    """Multi-host eval: both processes report the SAME full-set
    MPJPE/AUC (cross-host aggregation), equal to a 1-process run over
    the whole eval batches."""
    r0, r1 = worker_results
    # aggregation makes the number identical on every process
    np.testing.assert_allclose(r0["eval_mpjpe_mm"], r1["eval_mpjpe_mm"],
                               rtol=1e-6)
    np.testing.assert_allclose(r0["eval_auc"], r1["eval_auc"], rtol=1e-6)

    import mh_common
    from scat_tpu import assets
    mean = assets.load_mean_params()
    batches = [mh_common.eval_batch(s, mean)
               for s in range(mh_common.EVAL_BATCHES)]
    ev = mh_common.build_evaluator(
        ("--net reg_transformer --batch_size 16 --compute_dtype float32 "
         f"--result_dir {tmp_path}/eval_oracle").split(),
        mh_common.IMAGE_SIZE, batches)
    oracle = ev.eval()
    # same samples, same weights; only collective reduction order
    # differs between the topologies
    np.testing.assert_allclose(r0["eval_mpjpe_mm"], oracle["mpjpe_mm"],
                               rtol=1e-4)
    np.testing.assert_allclose(r0["eval_auc"], oracle["auc"], rtol=1e-4)


def test_host_local_rows_rejects_non_batch_sharding():
    """A shard split on a non-leading dim must fail loudly — the dim-0
    dedup would otherwise silently drop it as a replicated duplicate,
    truncating that dim."""
    from scat_tpu.parallel.mesh import host_local_rows

    class _Shard:
        def __init__(self, index, data):
            self.index, self.data = index, data

    class _FakeGlobal:
        is_fully_addressable = False
        shape = (8, 4)

        def __init__(self, shards):
            self.addressable_shards = shards

    # batch-sharded: two row blocks concatenate in global order
    ok = _FakeGlobal([
        _Shard((slice(4, 8), slice(None)), np.ones((4, 4))),
        _Shard((slice(0, 4), slice(None)), np.zeros((4, 4)))])
    out = host_local_rows(ok)
    assert out.shape == (8, 4) and out[0, 0] == 0 and out[4, 0] == 1

    # dim-1 split: loud error, not silent truncation
    bad = _FakeGlobal([
        _Shard((slice(0, 4), slice(0, 2)), np.zeros((4, 2))),
        _Shard((slice(0, 4), slice(2, 4)), np.zeros((4, 2)))])
    with pytest.raises(ValueError, match="dim 1 is split"):
        host_local_rows(bad)


def test_local_row_base_rejects_non_process_major_data_axis():
    """mesh._assemble_global must fail loudly (with the --mesh_shape
    fix) when a process's device row blocks are not one contiguous
    local window — e.g. model:2,data:4 on 2 hosts, where each host's
    devices span every data block."""
    from scat_tpu.parallel.mesh import _local_row_base

    # process-major data axis: rows [4, 8) on a host holding 4 rows
    assert _local_row_base([slice(4, 6), slice(6, 8)], 4) == 4
    # replicated model axis repeats the same block — still contiguous
    assert _local_row_base([slice(0, 2), slice(0, 2), slice(2, 4)], 4) == 0
    # non-process-major: this host's devices cover rows 0-2 and 6-8
    with pytest.raises(ValueError, match="process-major"):
        _local_row_base([slice(0, 2), slice(6, 8)], 4)
