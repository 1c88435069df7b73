"""HRNet and truncated-Inception backbone parity with torch
re-executions of the reference (tests/torch_oracles.py), completing the
round-1 gap: these two backbones were built from scratch with no torch
oracle.  The composed heads on top of them crash as shipped in the
reference (hand_net.py:102,141-144 shape bug), so the backbone forward
is the strongest checkable contract.

Sources: reference models/hrnet.py:10-261, models/inception.py:62-139.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

import flax

import torch_oracles
from scat_tpu.models.hrnet import HRNet
from scat_tpu.models.inception import Inception3
from scat_tpu.utils.torch_import import (import_torch_hrnet,
                                         import_torch_inception)


def _randomize_bn(tm):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)


def _portable(sd):
    return [k for k in sd if not k.endswith("num_batches_tracked")]


@pytest.mark.slow
def test_hrnet_matches_torch_reference(rng):
    torch.manual_seed(0)
    tm = torch_oracles.TorchHRNet(c=16, nof_joints=32)
    _randomize_bn(tm)
    tm.eval()

    net = HRNet(c=16, nof_joints=32)
    x_np = (rng.randn(2, 64, 64, 3) * 0.5).astype(np.float32)
    variables = net.init(jax.random.key(0), jnp.asarray(x_np),
                         train=False)
    params = flax.core.unfreeze(variables["params"])
    bstats = flax.core.unfreeze(variables["batch_stats"])
    sd = tm.state_dict()
    merged = import_torch_hrnet(sd, params, bstats)
    assert merged == len(_portable(sd)), (
        f"merged {merged} != portable {len(_portable(sd))}")

    got = net.apply({"params": params, "batch_stats": bstats},
                    jnp.asarray(x_np), train=False)
    with torch.no_grad():
        want = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.numpy(), atol=2e-3)


@pytest.mark.slow
def test_h3dw_matches_torch_reference(rng):
    """frankmocap H3DW encoder composed parity via import_torch_auto
    (reference hand_net.py:28-58): backbone + fc2 + iterative 61-dim
    regressor."""
    from scat_tpu import assets
    from scat_tpu.models.hand_net import H3DWEncoder
    from scat_tpu.utils.torch_import import import_torch_auto

    torch.manual_seed(2)
    mean = assets.load_mean_mano_pose("extra_data/mean_mano_params.pkl")
    tm = torch_oracles.TorchH3DWEncoder(
        torch.from_numpy(np.asarray(mean, np.float32)[None]))
    _randomize_bn(tm)
    tm.eval()

    model = H3DWEncoder(mean_params=jnp.asarray(mean))
    # 224 input: the reference head needs the 7x7 avgpool geometry
    x_np = (rng.randn(1, 224, 224, 3) * 0.5).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np),
                           train=False)
    params = flax.core.unfreeze(variables["params"])
    bstats = flax.core.unfreeze(variables["batch_stats"])
    sd = tm.state_dict()
    merged = import_torch_auto(sd, params, bstats)
    assert merged == len(_portable(sd)), (
        f"merged {merged} != {len(_portable(sd))}")

    feat, pred = model.apply({"params": params, "batch_stats": bstats},
                             jnp.asarray(x_np), train=False)
    with torch.no_grad():
        tfeat, tpred = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(feat), tfeat.numpy(),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(pred), tpred.numpy(),
                               atol=1e-3)


@pytest.mark.slow
def test_inception_matches_torch_reference(rng):
    torch.manual_seed(1)
    tm = torch_oracles.TorchInception3Trunc()
    _randomize_bn(tm)
    tm.eval()

    net = Inception3()
    # inception needs >=75 px for the two VALID-padded stride-2 pools
    x_np = (rng.randn(2, 128, 128, 3) * 0.5).astype(np.float32)
    variables = net.init(jax.random.key(0), jnp.asarray(x_np),
                         train=False)
    params = flax.core.unfreeze(variables["params"])
    bstats = flax.core.unfreeze(variables["batch_stats"])
    sd = tm.state_dict()
    merged = import_torch_inception(sd, params, bstats)
    assert merged == len(_portable(sd)), (
        f"merged {merged} != portable {len(_portable(sd))}")

    got = net.apply({"params": params, "batch_stats": bstats},
                    jnp.asarray(x_np), train=False)
    with torch.no_grad():
        want = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    assert got.shape[-1] == 768
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.numpy(), atol=2e-3)


def test_hrnet_probe_knobs_default_to_parity(rng):
    """The probe-only fields (fuse_mode/stop_after —
    benchmarks/probe_hrnet.py) leave the default model untouched, and
    each knob produces the expected shapes."""
    import jax
    import jax.numpy as jnp
    from scat_tpu.models.hrnet import HRNet

    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    base = HRNet(c=16, nof_joints=32)
    v_base = base.init(jax.random.key(0), x, train=False)
    # concat fuse: different param tree (single cat conv per output
    # branch), valid output, same output shape
    cat = HRNet(c=16, nof_joints=32, fuse_mode="concat")
    v_cat = cat.init(jax.random.key(0), x, train=False)
    assert "fuse0_cat_conv" in v_cat["params"]["stage2_0"]
    assert "fuse0_1_conv" not in v_cat["params"]["stage2_0"]
    out_cat = cat.apply(v_cat, x, train=False)
    out_base = base.apply(v_base, x, train=False)
    assert out_cat.shape == out_base.shape == (1, 16, 16, 32)
    assert bool(jnp.all(jnp.isfinite(out_cat)))
    # stage prefixes stop early with the documented shapes
    shapes = {"layer1": (1, 16, 16, 256), "stage2": (1, 16, 16, 16),
              "stage3": (1, 16, 16, 16)}
    for stop, want in shapes.items():
        m = HRNet(c=16, nof_joints=32, stop_after=stop)
        v = m.init(jax.random.key(0), x, train=False)
        assert m.apply(v, x, train=False).shape == want, stop
