"""AOT export roundtrip: the StableHLO artifact must serve exactly what
the live predictor serves, without model code or a checkpoint."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from scat_tpu.config import Options
from scat_tpu.export import (_flatten, _unflatten, export_predictor,
                             load_artifact)
from scat_tpu.serving import HandPosePredictor

IMG = 64


def _predictor():
    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  compute_dtype="float32", use_pallas_attention=False,
                  checkpoint_path_eval="/nonexistent")
    return HandPosePredictor.from_checkpoint(opt, image_size=IMG)


def test_flatten_roundtrip_bf16():
    tree = {"a": {"b": jnp.ones((2, 3), jnp.bfloat16),
                  "c": jnp.zeros((4,), jnp.float32)},
            "d": jnp.arange(5)}
    flat = _flatten(tree, "params")
    back = _unflatten(flat, "params")
    assert back["a"]["b"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(back["d"]),
                                  np.asarray(tree["d"]))


@pytest.mark.slow
def test_export_roundtrip_matches_live(tmp_path, rng):
    p = _predictor()
    out_dir = str(tmp_path / "artifact")
    export_predictor(p, out_dir)
    loaded = load_artifact(out_dir)
    assert loaded.image_size == IMG
    imgs = (rng.rand(5, IMG, IMG, 3) * 255).astype(np.uint8)
    live = p.predict(imgs)
    aot = loaded.predict(imgs)
    for key in ("camera", "joints_3d", "joints_2d"):
        np.testing.assert_allclose(aot[key], live[key], atol=1e-5)
    # float requests ride the float32 program
    f = imgs.astype(np.float32) / 127.5 - 1.0
    aot_f = loaded.predict(f)
    np.testing.assert_allclose(aot_f["joints_3d"], live["joints_3d"],
                               atol=1e-5)
    # symbolic batch: a size outside the warmed set still serves
    one = loaded.predict(imgs[:1])
    np.testing.assert_allclose(one["joints_3d"][0], live["joints_3d"][0],
                               atol=1e-5)
    # contract violations fail loudly
    with pytest.raises(ValueError, match="uint8"):
        loaded.predict(imgs.astype(np.int32))
    # the detection-to-pose path works off the artifact too
    frames = (rng.rand(2, 120, 160, 3) * 255).astype(np.uint8)
    hints = (rng.rand(2, 21, 2) * [160, 120] * 0.5 + [40, 30]
             ).astype(np.float32)
    out_f = loaded.predict_from_frames(frames, hints)
    live_f = p.predict_from_frames(frames, hints)
    np.testing.assert_allclose(out_f["joints_3d"], live_f["joints_3d"],
                               atol=1e-5)
    np.testing.assert_allclose(out_f["crop_affine"],
                               live_f["crop_affine"], atol=1e-5)


@pytest.mark.slow
def test_export_vip_bakes_constants(tmp_path, rng):
    """ViP's frozen FAVOR+ projection lives in the ``constants``
    collection; the exported program must bake it (closure constant) so
    the artifact decodes with the training-time feature map."""
    opt = Options(net="ViP", iteration=1, compute_dtype="float32",
                  checkpoint_path_eval="/nonexistent")
    p = HandPosePredictor.from_checkpoint(opt, image_size=32)
    assert p.constants  # the live predictor carries the collection
    out_dir = str(tmp_path / "vip")
    export_predictor(p, out_dir)
    # constants are closure-baked into the StableHLO, NOT npz inputs —
    # storing a second (never-read) copy would mislead weight editors
    with np.load(os.path.join(out_dir, "weights.npz")) as data:
        assert not [k for k in data.files if k.startswith("constants")]
    loaded = load_artifact(out_dir)
    imgs = (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)
    live = p.predict(imgs)
    aot = loaded.predict(imgs)
    np.testing.assert_allclose(aot["joints_3d"], live["joints_3d"],
                               atol=1e-5)


@pytest.mark.slow
def test_export_refuses_mesh_mode(tmp_path):
    from scat_tpu.parallel import mesh as mesh_lib
    p = _predictor()
    sharded = HandPosePredictor(
        model=p.model, params=p.params, batch_stats=p.batch_stats,
        image_size=IMG, mesh=mesh_lib.make_mesh())
    with pytest.raises(ValueError, match="single-chip"):
        export_predictor(sharded, str(tmp_path / "x"))


@pytest.mark.slow
def test_reference_pth_to_artifact(tmp_path, rng):
    """The full migration pipeline: a torch reference user's
    ``hand_net_final.pth`` -> from_checkpoint -> StableHLO artifact ->
    served predictions that reproduce the torch forward."""
    import torch

    import torch_oracles
    from scat_tpu import assets

    torch.manual_seed(0)
    mean = assets.load_mean_params()
    tm = torch_oracles.EncoderTransformer(
        torch.from_numpy(mean[None].astype(np.float32)), iteration=1,
        heads=2)
    tm.transformer = torch_oracles.Transformer(784, 3, 2, 64, 392)
    tm.eval()
    pth = tmp_path / "hand_net_final.pth"
    torch.save(tm.state_dict(), pth)

    opt = Options(net="reg_transformer", vit_heads=2, iteration=1,
                  compute_dtype="float32", use_pallas_attention=False,
                  mask_rate=0.0, checkpoint_path_eval=str(pth))
    p = HandPosePredictor.from_checkpoint(opt, image_size=224)
    out_dir = str(tmp_path / "artifact")
    export_predictor(p, out_dir)
    loaded = load_artifact(out_dir)

    img = (rng.rand(2, 224, 224, 3) * 255).astype(np.uint8)
    served = loaded.predict(img)
    x = img.astype(np.float32) / 127.5 - 1.0
    with torch.no_grad():
        want, _ = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.numpy()
    np.testing.assert_allclose(served["camera"], want[:, :3], atol=2e-3)
    np.testing.assert_allclose(
        served["joints_3d"].reshape(2, 63), want[:, 3:66], atol=2e-3)
