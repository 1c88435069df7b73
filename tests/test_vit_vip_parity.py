"""Composed torch parity for the two whole-image regressors:
``--net ViT`` (reference vision_transformer.py:103-153) and ``--net
ViP`` / Performer (reference vision_performer.py:70-116).

With these, every ``--net`` variant has an end-to-end weight-interchange
parity test (reg_transformer / _coarse / backbone_hrnet /
backbone_incepv3 / frankmocap in test_full_model_parity.py +
test_backbone_parity.py; ViT / ViP here).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

import flax

import torch_oracles
from scat_tpu.models.performer import ViP
from scat_tpu.models.vit import ViT
from scat_tpu.utils.torch_import import (export_torch_vip,
                                         import_torch_auto,
                                         import_torch_vip)

ATOL = 1e-4   # no BN/conv chains here; pure dense stacks agree tightly


def test_vit_composed_parity(rng):
    torch.manual_seed(5)
    mean = torch.randn(1, 66) * 0.1
    tm = torch_oracles.TorchViT(mean, image_size=64, patch_size=16,
                                num_classes=66, dim=64, depth=3,
                                heads=2, dim_head=16, iteration=2)
    tm.eval()

    model = ViT(mean_params=jnp.asarray(mean.numpy()[0]), image_size=64,
                patch_size=16, num_classes=66, dim=64, depth=3, heads=2,
                dim_head=16, iteration=2)
    x_np = (rng.randn(2, 64, 64, 3) * 0.5).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np),
                           train=False)
    params = flax.core.unfreeze(variables["params"])
    sd = tm.state_dict()
    merged = import_torch_auto(sd, params, {})
    assert merged == len(sd), f"merged {merged} != {len(sd)}"

    pred, _ = model.apply({"params": params}, jnp.asarray(x_np),
                          train=False)
    with torch.no_grad():
        tpred = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(pred), tpred.numpy(),
                               atol=ATOL)


def test_vip_composed_parity(rng):
    torch.manual_seed(6)
    mean = torch.randn(1, 66) * 0.1
    tm = torch_oracles.TorchViP(mean, image_pix=32, patch_pix=4,
                                out_dim=66, emb_s=16, heads=2, depth=2,
                                iteration=2)
    tm.eval()

    model = ViP(mean_params=jnp.asarray(mean.numpy()[0]), out_dim=66,
                image_pix=32, patch_pix=4, emb_s=16, heads=2, depth=2,
                dropout=0.0, iteration=2)
    x_np = (rng.randn(2, 32, 32, 3) * 0.5).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np),
                           train=False)
    params = flax.core.unfreeze(variables["params"])
    constants = flax.core.unfreeze(variables["constants"])
    sd = tm.state_dict()
    merged = import_torch_vip(sd, params, constants, depth=2)
    assert merged == len(sd), f"merged {merged} != {len(sd)}"

    pred, _ = model.apply({"params": params, "constants": constants},
                          jnp.asarray(x_np), train=False)
    with torch.no_grad():
        tpred = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(pred), tpred.numpy(),
                               atol=ATOL)

    # export direction round-trips into the torch reference
    sd_out = export_torch_vip(params, constants, depth=2)
    missing, unexpected = tm.load_state_dict(
        {k: torch.as_tensor(np.array(v)) for k, v in sd_out.items()},
        strict=True)
    assert not missing and not unexpected
    with torch.no_grad():
        tpred2 = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(pred), tpred2.numpy(),
                               atol=ATOL)
