"""``python -m scat_tpu.convert`` — orbax <-> .pth conversion CLI.

Roundtrip contract: orbax -> .pth -> orbax must preserve the serving
forward exactly (the walks themselves are parity-tested against real
torch modules in test_full_model_parity.py; this covers the CLI-level
wiring: source guards, constants handling, full-state output)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scat_tpu import convert
from scat_tpu.config import BaseOptions
from scat_tpu.models import build_model
from scat_tpu.utils import checkpoint as ckpt_lib


def _opt(tmp_path, **kw):
    args = ["--net", kw.pop("net", "reg_transformer"),
            "--vit_heads", "2", "--iteration", "1"]
    opt = BaseOptions().parse(args)
    for k, v in kw.items():
        setattr(opt, k, v)
    return opt


def _forward(opt, params, batch_stats, image_size):
    model, _ = build_model(opt, image_size)
    x = jnp.linspace(-1.0, 1.0,
                     2 * image_size * image_size * 3).reshape(
        (2, image_size, image_size, 3)).astype(jnp.float32)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      x, train=False)
    return np.asarray(out[0] if isinstance(out, tuple) else out)


@pytest.mark.slow
def test_roundtrip_orbax_pth_orbax(tmp_path):
    size = 64
    opt = _opt(tmp_path)
    model, _ = build_model(opt, size)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.zeros((1, size, size, 3), jnp.float32), train=False)
    from scat_tpu.training import schedule
    from scat_tpu.training.state import TrainState
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}),
                              schedule.make_optimizer(1e-3, 1),
                              jax.random.key(2))
    src = ckpt_lib.save_state(str(tmp_path / "src"), state,
                              ckpt_lib.FINAL_NAME)
    ref_out = _forward(opt, state.params, state.batch_stats, size)

    # orbax -> .pth
    pth = str(tmp_path / "m.pth")
    opt.checkpoint_path_eval = src
    n = convert.to_pth(opt, pth, image_size=size)
    assert n > 100 and os.path.exists(pth)

    # .pth -> orbax, then forward through the restored weights
    opt2 = _opt(tmp_path)
    opt2.checkpoint_path_eval = pth
    back = convert.to_orbax(opt2, str(tmp_path / "back"),
                            image_size=size)
    fresh = model.init(
        {"params": jax.random.key(9), "mask": jax.random.key(8)},
        jnp.zeros((1, size, size, 3), jnp.float32), train=False)
    p, bs = ckpt_lib.restore_variables_nonstrict(
        back, fresh["params"], fresh.get("batch_stats", {}))
    out = _forward(opt2, p, bs, size)
    np.testing.assert_allclose(out, ref_out, atol=1e-5)


def test_to_pth_missing_source_raises(tmp_path):
    opt = _opt(tmp_path)
    opt.checkpoint_path_eval = str(tmp_path / "nope")
    with pytest.raises(FileNotFoundError):
        convert.to_pth(opt, str(tmp_path / "out.pth"))


def test_state_dict_for_net_rejects_unknown():
    with pytest.raises(ValueError, match="no torch interchange"):
        convert.state_dict_for_net("nope", {}, {}, {}, 3)
