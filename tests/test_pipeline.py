"""GPipe-style pipeline parallelism (parallel/pipeline.py) on the
8-device virtual CPU mesh: schedule correctness, gradients through the
rotation, data x pipe composition, and the real ViP block stack."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scat_tpu.parallel import mesh as mesh_lib
from scat_tpu.parallel import pipeline


def _toy_stack(depth, dim, key):
    """Per-layer affine+tanh: shapes match in/out, state actually mixes."""
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (depth, dim, dim)) * 0.3,
        "b": jax.random.normal(kb, (depth, dim)) * 0.1,
    }


def _toy_layer(lv, x):
    return jnp.tanh(x @ lv["w"] + lv["b"])


def _sequential(stacked, x):
    def body(c, lv):
        return _toy_layer(lv, c), None
    y, _ = jax.lax.scan(body, x, stacked)
    return y


def test_pipeline_matches_sequential():
    depth, dim, B, M = 8, 6, 12, 4
    stacked = _toy_stack(depth, dim, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, dim))
    mesh = mesh_lib.make_mesh((("pipe", 8),))
    y_seq = _sequential(stacked, x)
    y_pp = jax.jit(lambda v, a: pipeline.pipeline_apply(
        _toy_layer, v, a, mesh, M))(stacked, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq),
                               atol=1e-6)


def test_pipeline_multiple_layers_per_stage():
    """depth > pipe size: each stage composes 2 contiguous layers."""
    depth, dim, B, M = 8, 6, 12, 6
    stacked = _toy_stack(depth, dim, jax.random.key(7))
    x = jax.random.normal(jax.random.key(8), (B, dim))
    mesh = mesh_lib.make_mesh((("pipe", 4),), devices=jax.devices()[:4])
    y_seq = _sequential(stacked, x)
    y_pp = jax.jit(lambda v, a: pipeline.pipeline_apply(
        _toy_layer, v, a, mesh, M))(stacked, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq),
                               atol=1e-6)


def test_pipeline_grads_finite_with_zero_hostile_layer():
    """A block whose VJP is non-finite off its input domain (x/|x|)
    must still yield finite gradients: fill-phase carries are real
    data, and dead-path cotangents vanish against finite primals."""
    depth, dim, B, M = 4, 5, 8, 4

    def hostile_layer(lv, x):
        y = jnp.tanh(x @ lv["w"] + lv["b"])
        return y / jnp.linalg.norm(y, axis=-1, keepdims=True)

    stacked = _toy_stack(depth, dim, jax.random.key(9))
    x = jax.random.normal(jax.random.key(10), (B, dim)) + 0.5
    mesh = mesh_lib.make_mesh((("pipe", 4),), devices=jax.devices()[:4])

    def seq_loss(v):
        def body(c, lv):
            return hostile_layer(lv, c), None
        y, _ = jax.lax.scan(body, x, v)
        return jnp.sum(y ** 2)

    def pp_loss(v):
        return jnp.sum(pipeline.pipeline_apply(
            hostile_layer, v, x, mesh, M) ** 2)

    g_pp = jax.jit(jax.grad(pp_loss))(stacked)
    g_seq = jax.jit(jax.grad(seq_loss))(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_pipeline_gradients_match():
    depth, dim, B, M = 4, 5, 8, 4
    stacked = _toy_stack(depth, dim, jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (B, dim))
    mesh = mesh_lib.make_mesh((("pipe", 4),), devices=jax.devices()[:4])

    def loss_pp(v):
        return jnp.sum(pipeline.pipeline_apply(
            _toy_layer, v, x, mesh, M) ** 2)

    def loss_seq(v):
        return jnp.sum(_sequential(v, x) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_pipeline_composes_with_data_axis():
    depth, dim, B, M = 4, 6, 16, 4
    stacked = _toy_stack(depth, dim, jax.random.key(4))
    x = jax.random.normal(jax.random.key(5), (B, dim))
    mesh = mesh_lib.make_mesh((("data", 2), ("pipe", 4)))
    y_seq = _sequential(stacked, x)
    xb = jax.device_put(x, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")))
    y_pp = jax.jit(lambda v, a: pipeline.pipeline_apply(
        _toy_layer, v, a, mesh, M))(stacked, xb)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq),
                               atol=1e-6)


def test_pipeline_rejects_bad_shapes():
    stacked = _toy_stack(3, 4, jax.random.key(6))  # depth 3, pipe 2
    mesh = mesh_lib.make_mesh((("pipe", 2),), devices=jax.devices()[:2])
    x = jnp.zeros((4, 4))
    with pytest.raises(ValueError, match="divide over pipe"):
        pipeline.pipeline_apply(_toy_layer, stacked, x, mesh, 2)
    stacked4 = _toy_stack(4, 4, jax.random.key(6))
    with pytest.raises(ValueError, match="microbatches"):
        pipeline.pipeline_apply(_toy_layer, stacked4, x, mesh, 3)


@pytest.mark.slow
def test_vip_block_stack_pipelined():
    """The real PerformerBlock stack (params + frozen FAVOR+ constants)
    pipelined over 4 stages == the model's sequential block loop."""
    from scat_tpu import assets
    from scat_tpu.models.performer import PerformerBlock, ViP

    mean = assets.load_mean_params()
    model = ViP(mean_params=jnp.asarray(mean), image_pix=32, patch_pix=4,
                emb_s=16, heads=2, depth=4, iteration=1)
    x = jax.random.uniform(jax.random.key(7), (4, 32, 32, 3),
                           minval=-1.0, maxval=1.0)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)

    # token stream entering the block stack: re-run the embed stage
    emb = 16 * 2
    b = x.shape[0]
    p = 4
    patches = x.reshape(b, 8, p, 8, p, 3).transpose(
        0, 1, 3, 5, 2, 4).reshape(b, 64, 3 * p * p)
    pe = variables["params"]["patch_emb"]
    tok = patches @ pe["kernel"] + pe["bias"]
    tok = tok + variables["params"]["pos_emb"]
    cls = jnp.broadcast_to(variables["params"]["cls_token"], (b, 1, emb))
    tok = jnp.concatenate([cls, tok], axis=1)
    block = PerformerBlock(16, 2, 0.5, 0.1, False, jnp.float32)

    def layer_fn(lv, t):
        return block.apply(
            {"params": lv["params"], "constants": lv["constants"]}, t,
            True)  # deterministic

    stacked = pipeline.stack_layer_vars(variables, "block_", 4)
    seq = tok
    for i in range(4):
        seq = block.apply(
            {"params": variables["params"][f"block_{i}"],
             "constants": variables["constants"][f"block_{i}"]}, seq,
            True)

    mesh = mesh_lib.make_mesh((("data", 2), ("pipe", 4)))
    pp = jax.jit(lambda v, t: pipeline.pipeline_apply(
        layer_fn, v, t, mesh, 2))(stacked, tok)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(seq),
                               atol=1e-5)
