"""Mesh/pjit scale-out tests on the 8-device virtual CPU platform
(SURVEY.md §2.10 / §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scat_tpu.parallel import mesh as mesh_lib


def test_make_mesh_default_all_devices():
    m = mesh_lib.make_mesh()
    assert m.devices.size == 8
    assert m.axis_names == ("data",)


def test_make_mesh_wildcard_and_2d():
    m = mesh_lib.make_mesh((("data", -1), ("model", 2)))
    assert m.shape["data"] == 4 and m.shape["model"] == 2


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    """Data-parallel pjit step == single-device step (grad allreduce +
    global BN stats are exact, not approximate)."""
    from scat_tpu import assets
    from scat_tpu.data.synthetic import synth_batch
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState

    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, depth=3, backbone="resnet18",
                               mask_rate=0.0, token_dim=16)
    batch = synth_batch(jax.random.key(0), 8, image_size=32,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"])
    tx = schedule.make_optimizer(1e-3, steps_per_epoch=1)

    def fresh_state():
        return TrainState.create(variables["params"],
                                 variables["batch_stats"], tx,
                                 jax.random.key(2))

    raw = steps.make_train_step(model, tx, 1e5, 10.0)
    # single device
    s1, stats1 = jax.jit(raw)(fresh_state(), batch)
    # 8-device mesh
    mesh = mesh_lib.make_mesh()
    s8_init = mesh_lib.replicate_state(mesh, fresh_state())
    b8 = mesh_lib.shard_batch(mesh, batch)
    sharded = mesh_lib.jit_train_step(raw, mesh, donate_state=False)
    s8, stats8 = sharded(s8_init, b8)
    # distributed reductions reorder f32 sums; agreement is to ~1e-3 rel
    np.testing.assert_allclose(float(stats1["loss"]),
                               float(stats8["loss"]), rtol=1e-3)
    # parameters after the update agree (Adam normalizes the grad scale)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)


@pytest.mark.slow
def test_graft_entry_single():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 66)
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))


@pytest.mark.slow
def test_graft_entry_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from scat_tpu import assets
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.training import schedule
    from scat_tpu.training.state import TrainState
    from scat_tpu.utils import checkpoint as ckpt

    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, depth=3, backbone="resnet18",
                               token_dim=16)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
    tx = schedule.make_optimizer(1e-3, steps_per_epoch=1)
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx,
                              jax.random.key(2))
    path = ckpt.save_state(str(tmp_path), state, "ck")
    restored = ckpt.restore_state(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # missing path -> None + scratch warning (reference train.py:68-70)
    assert ckpt.restore_state(str(tmp_path / "nope"), state) is None


@pytest.mark.slow
def test_fsdp_train_step_matches_replicated():
    """FSDP (ZeRO-3 style) sharded params+moments: same math as plain
    DP, with each large weight actually sharded over ``data``."""
    from scat_tpu import assets
    from scat_tpu.data.synthetic import synth_batch
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.parallel import sharding_rules
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState

    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, depth=3, backbone="resnet18",
                               mask_rate=0.0, token_dim=16)
    batch = synth_batch(jax.random.key(0), 8, image_size=32,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"])
    tx = schedule.make_optimizer(1e-3, steps_per_epoch=1)

    def fresh_state():
        return TrainState.create(variables["params"],
                                 variables["batch_stats"], tx,
                                 jax.random.key(2))

    raw = steps.make_train_step(model, tx, 1e5, 10.0)
    mesh = mesh_lib.make_mesh()
    b8 = mesh_lib.shard_batch(mesh, batch)

    # replicated DP baseline
    s_dp = mesh_lib.replicate_state(mesh, fresh_state())
    step_dp = mesh_lib.jit_train_step(raw, mesh, donate_state=False)
    s_dp, stats_dp = step_dp(s_dp, b8)

    # FSDP placement
    s_fsdp = mesh_lib.fsdp_state(mesh, fresh_state())
    # large weights really shard: conv1 7x7x3->64-ish resnet18 kernels
    sharded_leaves = [
        x for x in jax.tree_util.tree_leaves(s_fsdp.params)
        if any(s is not None for s in x.sharding.spec)]
    assert sharded_leaves, "no parameter was FSDP-sharded"
    for x in sharded_leaves:
        shard = x.addressable_shards[0].data
        assert shard.size == x.size // 8
    # the Adam moments mirror the placement (ZeRO)
    mu_sharded = [
        x for x in jax.tree_util.tree_leaves(s_fsdp.opt_state)
        if getattr(x, "sharding", None) is not None
        and any(s is not None for s in getattr(x.sharding, "spec", ()))]
    assert len(mu_sharded) >= 2 * len(sharded_leaves) - 2

    step_fsdp = mesh_lib.jit_train_step_sharded(raw, mesh, s_fsdp,
                                                donate_state=False)
    s_fsdp, stats_fsdp = step_fsdp(s_fsdp, b8)
    np.testing.assert_allclose(float(stats_dp["loss"]),
                               float(stats_fsdp["loss"]), rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_dp.params),
                    jax.tree_util.tree_leaves(s_fsdp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)
    # second step from the updated FSDP state still runs sharded
    s_fsdp2, stats2 = step_fsdp(s_fsdp, b8)
    assert np.isfinite(float(stats2["loss"]))
    # a checkpoint written from the sharded state restores onto a
    # plain single-placement template (the eval path)
    import tempfile
    from scat_tpu.utils import checkpoint as ckpt
    with tempfile.TemporaryDirectory() as td:
        path = ckpt.save_state(td, s_fsdp2, "fsdp_ck")
        restored = ckpt.restore_state(path, fresh_state())
        assert restored is not None
        for a, b in zip(jax.tree_util.tree_leaves(s_fsdp2.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_hybrid_fsdp_tp_step():
    """FSDP over ``data`` composed with TP over ``model`` on a 4x2
    mesh: specs carry both axes, the step runs, loss matches the
    replicated step."""
    from scat_tpu import assets
    from scat_tpu.data.synthetic import synth_batch
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.parallel import sharding_rules
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState

    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, depth=3, backbone="resnet18",
                               mask_rate=0.0, token_dim=16)
    batch = synth_batch(jax.random.key(0), 8, image_size=32,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"])
    tx = schedule.make_optimizer(1e-3, steps_per_epoch=1)

    def fresh_state():
        return TrainState.create(variables["params"],
                                 variables["batch_stats"], tx,
                                 jax.random.key(2))

    raw = steps.make_train_step(model, tx, 1e5, 10.0)
    s1, stats1 = jax.jit(raw)(fresh_state(), batch)

    mesh = mesh_lib.make_mesh((("data", 4), ("model", 2)))
    shardings = sharding_rules.make_fsdp_shardings(
        fresh_state().params, mesh)
    specs = [s.spec for s in jax.tree_util.tree_leaves(shardings)]
    assert any("data" in s and "model" in s for s in specs), (
        "no param carries both the data and model axes")
    s_h = mesh_lib.fsdp_state(mesh, fresh_state())
    step_h = mesh_lib.jit_train_step_sharded(raw, mesh, s_h,
                                             donate_state=False)
    b_h = mesh_lib.shard_batch(mesh, batch)
    s_h, stats_h = step_h(s_h, b_h)
    np.testing.assert_allclose(float(stats1["loss"]),
                               float(stats_h["loss"]), rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s_h.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)
