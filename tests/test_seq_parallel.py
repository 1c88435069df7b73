"""Sequence (context) parallelism over the ``seq`` mesh axis.

The long-token models anchor their token streams with
``sharding_rules.shard_tokens`` (ViP: 3137 tokens at 224 px, ViT: 197);
GSPMD shards every per-token activation and inserts the cross-token
reductions.  These tests validate, on the 8-device virtual CPU mesh:

  * the anchor mechanism itself (constraint applied iff a live ``seq``
    axis exists, other dims left to propagation),
  * ViP forward + full train step under dp2 x seq4 == replicated,
  * ViT forward under seq sharding == replicated,
  * activations REALLY shard (per-device HLO peak scales down).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scat_tpu.parallel import mesh as mesh_lib
from scat_tpu.parallel import sharding_rules


def _tiny_vip(use_pallas=False):
    from scat_tpu import assets
    from scat_tpu.models.performer import ViP
    mean = assets.load_mean_params()
    model = ViP(mean_params=jnp.asarray(mean), image_pix=32, patch_pix=4,
                emb_s=16, heads=2, depth=2, iteration=1,
                use_pallas=use_pallas)
    return model, mean


def test_shard_tokens_noop_without_mesh():
    x = jnp.ones((2, 9, 4))
    y = sharding_rules.shard_tokens(x)
    assert y is x  # identity outside any seq-mesh context


def test_shard_tokens_anchors_token_axis():
    mesh = mesh_lib.make_mesh((("data", 2), ("seq", 4)))

    def f(x):
        return sharding_rules.shard_tokens(x) * 2.0

    x = jax.device_put(
        jnp.arange(2 * 12 * 4, dtype=jnp.float32).reshape(2, 12, 4),
        jax.sharding.NamedSharding(mesh,
                                   jax.sharding.PartitionSpec("data")))
    step = mesh_lib.MeshContextStep(jax.jit(f), mesh)
    out = step(x)
    spec = out.sharding.spec
    # token axis pinned to seq; batch axis kept data-sharded by
    # propagation (UNCONSTRAINED dims don't override the input)
    assert len(spec) >= 2 and spec[1] == "seq"
    assert spec[0] == "data"
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


@pytest.mark.slow
def test_vip_seq_parallel_forward_matches():
    model, _ = _tiny_vip()
    x = jax.random.uniform(jax.random.key(3), (4, 32, 32, 3),
                           minval=-1.0, maxval=1.0)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)

    def fwd(v, images):
        pred, feat = model.apply(v, images, train=False)
        return pred, feat

    pred1, feat1 = jax.jit(fwd)(variables, x)

    mesh = mesh_lib.make_mesh((("data", 2), ("seq", 4)))
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    v_sp = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep), variables)
    x_sp = jax.device_put(
        x, jax.sharding.NamedSharding(mesh,
                                      jax.sharding.PartitionSpec("data")))
    step = mesh_lib.MeshContextStep(jax.jit(fwd), mesh)
    pred8, feat8 = step(v_sp, x_sp)
    # 65 tokens shard 17/17/17/14 over seq=4; f32 reduction reorders
    np.testing.assert_allclose(np.asarray(pred1), np.asarray(pred8),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(feat1), np.asarray(feat8),
                               atol=2e-5)


@pytest.mark.slow
def test_vip_seq_parallel_train_step_matches():
    """Full train step (fwd+loss+bwd+Adam) under dp2 x seq4 ==
    single-device — token-sharded grads reduce into the same replicated
    weight update."""
    from scat_tpu.data.synthetic import synth_batch
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState

    model, mean = _tiny_vip()
    batch = synth_batch(jax.random.key(0), 8, image_size=32,
                        mean_params=mean)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch["image"], train=True)
    tx = schedule.make_optimizer(1e-3, steps_per_epoch=1)

    def fresh_state():
        return TrainState.create(variables["params"], {}, tx,
                                 jax.random.key(2),
                                 constants=variables["constants"])

    raw = steps.make_train_step(model, tx, 1e5, 10.0)
    s1, stats1 = jax.jit(raw)(fresh_state(), batch)

    mesh = mesh_lib.make_mesh((("data", 2), ("seq", 4)))
    s_sp = mesh_lib.replicate_state(mesh, fresh_state())
    b_sp = mesh_lib.shard_batch(mesh, batch)
    step = mesh_lib.jit_train_step(raw, mesh, donate_state=False)
    assert isinstance(step, mesh_lib.MeshContextStep)
    s_sp, stats_sp = step(s_sp, b_sp)
    np.testing.assert_allclose(float(stats1["loss"]),
                               float(stats_sp["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)
    # second step composes (state placement survives the first update)
    _, stats2 = step(s_sp, b_sp)
    assert np.isfinite(float(stats2["loss"]))


@pytest.mark.slow
def test_vip_seq_activations_really_shard():
    """The compiled SP program's per-token activations are 1/seq-size
    per device: the [B,T,4*emb] MLP hidden — the largest tensor — must
    appear in the per-device HLO at its sharded token extent."""
    model, _ = _tiny_vip()
    x = jnp.zeros((4, 32, 32, 3))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    mesh = mesh_lib.make_mesh((("seq", 8),))

    def fwd(v, images):
        return model.apply(v, images, train=False)[0]

    with jax.set_mesh(mesh):
        lowered = jax.jit(fwd).lower(variables, x)
        txt = lowered.compile().as_text()
    # 65 tokens over seq=8 -> ceil = 9 per device; the full-T mlp hidden
    # [4, 65, 128] must not exist on-device, its [4, 9, 128] shard must
    assert "f32[4,9,128]" in txt
    assert "f32[4,65,128]" not in txt


@pytest.mark.slow
def test_vit_seq_parallel_forward_matches():
    from scat_tpu import assets
    from scat_tpu.models.vit import ViT
    mean = assets.load_mean_params()
    model = ViT(mean_params=jnp.asarray(mean), image_size=32,
                patch_size=8, dim=32, depth=2, heads=2, dim_head=8,
                mlp_dim=32, iteration=1)
    x = jax.random.uniform(jax.random.key(5), (4, 32, 32, 3),
                           minval=-1.0, maxval=1.0)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)

    def fwd(v, images):
        return model.apply(v, images, train=False)

    pred1, feat1 = jax.jit(fwd)(variables, x)
    mesh = mesh_lib.make_mesh((("data", 2), ("seq", 4)))
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    v_sp = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep), variables)
    x_sp = jax.device_put(
        x, jax.sharding.NamedSharding(mesh,
                                      jax.sharding.PartitionSpec("data")))
    step = mesh_lib.MeshContextStep(jax.jit(fwd), mesh)
    pred8, feat8 = step(v_sp, x_sp)
    np.testing.assert_allclose(np.asarray(pred1), np.asarray(pred8),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(feat1), np.asarray(feat8),
                               atol=2e-5)
