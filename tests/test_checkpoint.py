"""Checkpoint writer behavior: async periodic saves (overlap the disk
write with training, reference train.py:237-246 blocks on torch.save)
and the single-deserialization variables restore."""

import numpy as np
import orbax.checkpoint as ocp
import pytest

from scat_tpu.utils import checkpoint as ckpt_lib


def _restore_raw(path):
    return ocp.PyTreeCheckpointer().restore(path)


def test_async_saver_roundtrip_and_overwrite(tmp_path):
    saver = ckpt_lib.AsyncSaver()
    state1 = {"params": {"w": np.arange(6.0)}, "step": np.int32(1)}
    path = saver.save(str(tmp_path), state1, name="hand_net")
    saver.wait()
    got = _restore_raw(path)
    np.testing.assert_array_equal(got["params"]["w"], np.arange(6.0))
    # second save to the same name must overwrite atomically, even with
    # the first write already finalized
    state2 = {"params": {"w": np.full(6, 9.0)}, "step": np.int32(2)}
    saver.save(str(tmp_path), state2, name="hand_net")
    saver.close()
    got = _restore_raw(path)
    np.testing.assert_array_equal(got["params"]["w"], np.full(6, 9.0))
    assert int(got["step"]) == 2


def test_async_saver_close_finalizes_inflight(tmp_path):
    """close() without an explicit wait() must still land the write —
    the trainer calls close() right before the final blocking save."""
    saver = ckpt_lib.AsyncSaver()
    path = saver.save(str(tmp_path), {"a": np.ones(3)}, name="hand_net")
    saver.close()
    np.testing.assert_array_equal(_restore_raw(path)["a"], np.ones(3))


def test_restore_variables_single_deserialization(tmp_path, monkeypatch):
    """params AND batch_stats come out of ONE checkpoint read (a
    restore per collection doubles serving cold-start I/O)."""
    path = str(tmp_path / "ckpt")
    ocp.PyTreeCheckpointer().save(path, {
        "params": {"w": np.arange(4.0)},
        "batch_stats": {"mean": np.full(3, 7.0)}})
    calls = []
    orig = ocp.PyTreeCheckpointer.restore

    def counting(self, *a, **k):
        calls.append(a)
        return orig(self, *a, **k)

    monkeypatch.setattr(ocp.PyTreeCheckpointer, "restore", counting)
    p, bs = ckpt_lib.restore_variables_nonstrict(
        path, {"w": np.zeros(4)}, {"mean": np.zeros(3)})
    np.testing.assert_array_equal(p["w"], np.arange(4.0))
    np.testing.assert_array_equal(bs["mean"], np.full(3, 7.0))
    assert len(calls) == 1


def test_restore_variables_resharded_checkpoint(tmp_path):
    """A checkpoint saved with NON-replicated placements (FSDP params
    from --param_sharding fsdp) must restore into something a
    replicated-pinned jit accepts: templateless orbax restore commits
    leaves with the SAVING run's sharding, and jit rejects committed
    args whose sharding differs from its in_shardings — so the loader
    hands back host arrays."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from scat_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    path = str(tmp_path / "ckpt")
    w = jax.device_put(jnp.arange(16.0).reshape(8, 2),
                       NamedSharding(mesh, P("data", None)))
    ocp.PyTreeCheckpointer().save(path, {
        "params": {"w": w},
        "batch_stats": {"mean": np.zeros(3)}})
    p, bs = ckpt_lib.restore_variables_nonstrict(
        path, {"w": np.zeros((8, 2))}, {"mean": np.ones(3)})
    assert isinstance(p["w"], np.ndarray), type(p["w"])
    np.testing.assert_array_equal(p["w"],
                                  np.arange(16.0).reshape(8, 2))

    # the eval-step contract: replicated in_shardings must accept it
    rep = mesh_lib.replicated(mesh)
    out = jax.jit(lambda x: x * 2, in_shardings=(rep,))(p["w"])
    np.testing.assert_array_equal(np.asarray(out),
                                  2 * np.arange(16.0).reshape(8, 2))


def test_restore_variables_scratch_fallback():
    p, bs = ckpt_lib.restore_variables_nonstrict(
        "/nonexistent_ckpt_dir", {"w": np.ones(4)}, {"mean": np.ones(3)})
    np.testing.assert_array_equal(p["w"], np.ones(4))
    np.testing.assert_array_equal(bs["mean"], np.ones(3))
