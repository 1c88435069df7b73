"""Tensor-parallel sharding rules on a data x model virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from scat_tpu.parallel import mesh as mesh_lib
import pytest

from scat_tpu.parallel.sharding_rules import (make_param_shardings,
                                              shard_params)


def test_rules_shard_large_kernels_only():
    mesh = mesh_lib.make_mesh((("data", 4), ("model", 2)))
    params = {
        "big_dense": {"kernel": jnp.zeros((512, 1024)),
                      "bias": jnp.zeros((1024,))},
        "small": {"kernel": jnp.zeros((8, 8))},
        "conv": {"kernel": jnp.zeros((3, 3, 256, 512))},
    }
    sh = make_param_shardings(params, mesh)
    assert sh["big_dense"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, "model")
    assert sh["big_dense"]["bias"].spec == jax.sharding.PartitionSpec()
    assert sh["small"]["kernel"].spec == jax.sharding.PartitionSpec()
    assert sh["conv"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, None, None, "model")


def test_megatron_pairing_column_then_row():
    """to_qkv/FFN-first shard the OUTPUT dim; to_out/FFN-second shard
    the INPUT dim, so the pair needs one psum instead of an all-gather
    per matmul."""
    mesh = mesh_lib.make_mesh((("data", 4), ("model", 2)))
    params = {
        "attn_0": {"to_qkv": {"kernel": jnp.zeros((784, 384))},
                   "to_out": {"kernel": jnp.zeros((128, 784))}},
        "ff_0": {"Dense_0": {"kernel": jnp.zeros((784, 588))},
                 "Dense_1": {"kernel": jnp.zeros((588, 392))}},
    }
    sh = make_param_shardings(params, mesh)
    P = jax.sharding.PartitionSpec
    assert sh["attn_0"]["to_qkv"]["kernel"].spec == P(None, "model")
    assert sh["attn_0"]["to_out"]["kernel"].spec == P("model", None)
    assert sh["ff_0"]["Dense_0"]["kernel"].spec == P(None, "model")
    assert sh["ff_0"]["Dense_1"]["kernel"].spec == P("model", None)


def test_megatron_pair_matches_replicated(rng):
    """A column->row pair under the rules equals the replicated
    computation (GSPMD inserts one reduction, not gathers)."""
    mesh = mesh_lib.make_mesh((("data", 2), ("model", 4)))
    W1 = jnp.asarray(rng.randn(256, 512) * 0.05, jnp.float32)
    W2 = jnp.asarray(rng.randn(512, 256) * 0.05, jnp.float32)
    params = shard_params(
        {"ff_0": {"Dense_0": {"kernel": W1},
                  "Dense_1": {"kernel": W2}}}, mesh)
    assert params["ff_0"]["Dense_0"]["kernel"].sharding.spec == \
        jax.sharding.PartitionSpec(None, "model")
    assert params["ff_0"]["Dense_1"]["kernel"].sharding.spec == \
        jax.sharding.PartitionSpec("model", None)
    x = jnp.asarray(rng.randn(8, 256), jnp.float32)

    def f(p, x):
        h = jax.nn.relu(x @ p["ff_0"]["Dense_0"]["kernel"])
        return h @ p["ff_0"]["Dense_1"]["kernel"]

    got = jax.jit(f)(params,
                     jax.device_put(x, mesh_lib.batch_sharding(mesh)))
    h = np.maximum(np.asarray(x) @ np.asarray(W1), 0.0)
    want = h @ np.asarray(W2)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def test_data_only_mesh_replicates():
    mesh = mesh_lib.make_mesh()
    params = {"w": jnp.zeros((512, 1024))}
    sh = make_param_shardings(params, mesh)
    assert sh["w"].spec == jax.sharding.PartitionSpec()


def test_tp_forward_matches_replicated(rng):
    """A dense layer computed with TP-sharded weights equals the
    replicated computation (GSPMD inserts the collectives)."""
    mesh = mesh_lib.make_mesh((("data", 2), ("model", 4)))
    W = jnp.asarray(rng.randn(512, 1024), jnp.float32)
    x = jnp.asarray(rng.randn(8, 512), jnp.float32)
    params = shard_params({"w": W}, mesh)
    f = jax.jit(lambda p, x: x @ p["w"])
    got = f(params, jax.device_put(x, mesh_lib.batch_sharding(mesh)))
    want = np.asarray(x) @ np.asarray(W)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


@pytest.mark.slow
def test_full_model_tp_step_runs(rng):
    """The flagship train step compiles and runs with TP-sharded params
    on a 4x2 mesh."""
    from scat_tpu import assets
    from scat_tpu.data.synthetic import synth_batch
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState

    mesh = mesh_lib.make_mesh((("data", 4), ("model", 2)))
    mean = assets.load_mean_params()
    model = EncoderTransformer(mean_params=jnp.asarray(mean), iteration=1,
                               heads=2, depth=3, backbone="resnet18",
                               mask_rate=0.0, token_dim=16)
    batch = synth_batch(jax.random.key(0), 8, image_size=32,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        batch["image"])
    tx = schedule.make_optimizer(1e-4, 1)
    state = TrainState.create(
        shard_params(variables["params"], mesh),
        variables["batch_stats"], tx, jax.random.key(2))
    step = jax.jit(steps.make_train_step(model, tx, 1e5, 10.0))
    b = mesh_lib.shard_batch(mesh, batch)
    new_state, stats = step(state, b)
    assert np.isfinite(float(stats["loss"]))
