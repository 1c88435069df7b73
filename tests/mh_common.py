"""Shared model/batch builders for the multi-host test pair
(tests/multihost_worker.py subprocess workers + tests/test_multihost.py
single-process oracle).  No import side effects — the worker pins its
JAX env before importing this.

float32 and small loss weights on purpose: the comparison is
2-process-vs-1-process EXECUTION equivalence, so the model must not
amplify cross-topology reduction-order noise (bf16 + the canonical 1e5
3D weight turns a 1e-5 step-1 difference into percent-level divergence
by step 2).
"""

import jax
import jax.numpy as jnp
import numpy as np

IMAGE_SIZE = 32
LOCAL_BS = 8
N_STEPS = 2
W3D, W2D = 1.0, 0.01


def build_model():
    from scat_tpu import assets
    from scat_tpu.models.hand_net import EncoderTransformer
    mean = assets.load_mean_params()
    model = EncoderTransformer(
        mean_params=jnp.asarray(mean), iteration=3, heads=8, depth=3,
        mask_rate=0.2, pos_embed=True,
        token_dim=(IMAGE_SIZE // 8) ** 2, use_pallas=False,
        norm_layer="batch", dtype=jnp.float32)
    return model, mean


def host_batch(pid: int, step: int, mean) -> dict:
    """This host's shard of logical batch ``step`` (numpy pytree)."""
    from scat_tpu.data.synthetic import synth_batch
    batch = synth_batch(
        jax.random.fold_in(jax.random.key(100 + pid), step),
        LOCAL_BS, image_size=IMAGE_SIZE, mean_params=mean)
    return {k: np.asarray(v) for k, v in batch.items()}


EVAL_GLOBAL_BS = 16
EVAL_BATCHES = 2


def eval_batch(step: int, mean) -> dict:
    """Logical (GLOBAL) eval batch ``step`` — both the 2-process run
    (each host slicing its half) and the 1-process oracle (whole batch)
    draw from this same stream, so their metrics must agree."""
    from scat_tpu.data.synthetic import synth_batch
    batch = synth_batch(
        jax.random.fold_in(jax.random.key(500), step),
        EVAL_GLOBAL_BS, image_size=IMAGE_SIZE, mean_params=mean)
    return {k: np.asarray(v) for k, v in batch.items()}


def build_evaluator(opt_args, image_size, dataset):
    """Evaluator over deterministic scratch variables (same init seed
    on every process -> identical weights without a checkpoint)."""
    from scat_tpu.config import BaseOptions
    from scat_tpu.evaluation.evaluator import Evaluator
    from scat_tpu.models import build_model
    opt = BaseOptions().parse(opt_args)
    model, _ = build_model(opt, image_size, for_keypoints=True)
    variables = dict(model.init(
        {"params": jax.random.key(11), "mask": jax.random.key(12),
         "dropout": jax.random.key(13)},
        jnp.zeros((1, image_size, image_size, 3)), train=False))
    return Evaluator(opt, image_size=image_size, dataset=dataset,
                     variables=variables)


def init_state(model, mesh):
    from scat_tpu.parallel import mesh as mesh_lib
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3)), train=True)
    # small lr: Adam's first update is ~sign(grad)*lr, and params whose
    # gradient sits at reduction-noise level flip sign between
    # topologies — the lr bounds how much one flipped sign can move the
    # step-2 loss (see the tolerance note in test_multihost.py)
    tx = schedule.make_optimizer(1e-4, steps_per_epoch=1)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.key(2))
    state = mesh_lib.replicate_state(mesh, state)
    step = mesh_lib.jit_train_step(
        steps.make_train_step(model, tx, W3D, W2D), mesh,
        donate_state=False)
    return state, step


def init_state_fsdp(model, mesh):
    """FSDP placement of the same init — regression for fsdp_state
    device_put'ing device-resident leaves (and the typed PRNG key) onto
    global shardings spanning non-addressable devices, which multi-host
    jax rejects (mesh._put_global is the fix)."""
    from scat_tpu.parallel import mesh as mesh_lib
    from scat_tpu.training import schedule, steps
    from scat_tpu.training.state import TrainState
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3)), train=True)
    tx = schedule.make_optimizer(1e-4, steps_per_epoch=1)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx,
                              jax.random.key(2))
    state = mesh_lib.fsdp_state(mesh, state)
    step = mesh_lib.jit_train_step_sharded(
        steps.make_train_step(model, tx, W3D, W2D), mesh, state,
        donate_state=False)
    return state, step


def params_fingerprint(state) -> float:
    # multi-host FSDP leaves are global arrays this process can't fetch
    # whole; sum per-shard means weighted by shard size instead
    def leaf_mean(leaf):
        if hasattr(leaf, "is_fully_addressable") \
                and not leaf.is_fully_addressable:
            # every process holds a disjoint (or replicated-identical)
            # piece; mean over addressable data is NOT the global mean
            # for sharded leaves, but it is deterministic per process
            # and the test compares like against like
            datas = [np.asarray(s.data) for s in leaf.addressable_shards]
            return float(np.mean([np.abs(d).mean() for d in datas]))
        return float(np.abs(np.asarray(leaf)).mean())
    return float(sum(
        leaf_mean(leaf)
        for leaf in jax.tree_util.tree_leaves(state.params)))
