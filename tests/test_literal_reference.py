"""Differential tests against the LITERAL reference source.

Round-4 review, Missing #1: every parity claim routed through
``tests/torch_oracles.py`` — a re-implementation by the same builder —
so a shared misreading of the reference would be invisible.  These
tests close that hole: ``tests/literal_ref.py`` imports the model files
under /root/reference byte-for-byte (only ``.cuda()`` and the
pretrained download are shimmed; see that module's docstring) and each
test proves ``torch_oracles.X`` ≡ literal ``models.X`` by

  1. loading the literal model's ``state_dict`` into the oracle with
     ``strict=True`` (key sets and shapes must be identical), and
  2. asserting the forwards agree bit-for-bit on shared inputs.

That makes every existing oracle-based parity test transitively a test
against the reference's own code.  Where the shipped reference crashes
on its own declared shapes (the token heads' regressor width,
hand_net.py:102,141-144; ViT's head width, vision_transformer.py:127;
H3DWEncoder at batch>1, hand_net.py:53-56) the crash is witnessed with
``pytest.raises`` and identity is proven with the single buggy Linear
swapped for the width the forward actually produces — everything else
literal.

A composed literal→Flax test also ports the literal flagship's
state_dict straight into the Flax model (no oracle in the loop).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import literal_ref
import torch_oracles as O

# torch-vs-torch on identical weights: bitwise agreement expected
EXACT = 0.0
# flax-vs-torch composed forward (same bar as test_full_model_parity)
ATOL = 1e-3


@pytest.fixture(scope="module")
def ref():
    return {
        "hand_net": literal_ref.load("models.hand_net"),
        "vt": literal_ref.load("models.vision_transformer"),
        "vta": literal_ref.load("models.vision_transformer_attn"),
        "vp": literal_ref.load("models.vision_performer"),
        "resnet": literal_ref.load("models.resnet"),
        "hrnet": literal_ref.load("models.hrnet"),
        "inception": literal_ref.load("models.inception"),
        "motion_disc": literal_ref.load("models.motion_discriminator"),
        "loss": literal_ref.load("models.loss"),
    }


def _identical(literal, oracle, *inputs, strict=True):
    """strict state_dict interchange + bitwise forward agreement."""
    literal.eval()
    missing, unexpected = oracle.load_state_dict(literal.state_dict(),
                                                 strict=strict)
    oracle.eval()
    with torch.no_grad():
        lo = literal(*inputs)
        oo = oracle(*inputs)
    if not isinstance(lo, tuple):
        lo, oo = (lo,), (oo,)
    assert len(lo) == len(oo)
    for i, (a, b) in enumerate(zip(lo, oo)):
        d = float((a - b).abs().max())
        assert d == EXACT, f"output {i}: maxdiff {d}"
    return missing, unexpected


def test_literal_pyramid_transformer(ref):
    """vision_transformer.py:81-101 (the flagship's core block)."""
    torch.manual_seed(0)
    lm = ref["vt"].Transformer(dim=784, depth=3, heads=8, dim_head=64,
                               mlp_dim=392)
    om = O.Transformer(784, 3, 8, 64, 392)
    _identical(lm, om, torch.randn(2, 21, 784), None)


def test_literal_pyramid_transformer_attn(ref):
    """vision_transformer_attn.py:88-113 (attn-returning variant)."""
    torch.manual_seed(0)
    lm = ref["vta"].Transformer(dim=784, depth=3, heads=8, dim_head=64,
                                mlp_dim=392)
    om = O.TransformerAttn(784, 3, 8, 64, 392)
    _identical(lm, om, torch.randn(2, 21, 784), None)


def test_literal_attention_and_feedforward(ref):
    """vision_transformer.py:28-79 in isolation (both FFN branches)."""
    torch.manual_seed(1)
    x = torch.randn(2, 21, 784)
    _identical(ref["vt"].Attention(784, heads=8, dim_head=64),
               O.Attention(784, heads=8, dim_head=64), x, None)
    # halving FFN (default branch) and 3-dim projecting FFN (out_dim set)
    _identical(ref["vt"].FeedForward(784, 588),
               O.FeedForward(784, 588), x)
    _identical(ref["vt"].FeedForward(784, 588, out_dim=3),
               O.FeedForward(784, 588, out_dim=3), x)


def test_literal_resnet50(ref):
    """resnet.py:101-162,186-193: 5-output forward + relu/fc1 head."""
    torch.manual_seed(2)
    lm = ref["resnet"].resnet50(pretrained=False, num_classes=512)
    _identical(lm, O.TorchResNet50Head(),
               torch.randn(2, 3, 224, 224) * 0.5)


def test_literal_resnet50_pretrained_shim(ref):
    """get_model builds with pretrained=True (hand_net.py:21-26); under
    the zero-egress shim that is a clean strict=False no-op load."""
    lm = ref["resnet"].resnet50(pretrained=True, num_classes=512)
    assert isinstance(lm, nn.Module)


@pytest.mark.slow
def test_literal_hrnet(ref):
    """hrnet.py:147-261 at the head's config (c=24, 128 joints)."""
    torch.manual_seed(3)
    lm = ref["hrnet"].HRNet(c=24, nof_joints=128, bn_momentum=0.1)
    _identical(lm, O.TorchHRNet(c=24, nof_joints=128),
               torch.randn(1, 3, 224, 224) * 0.5)


@pytest.mark.slow
def test_literal_inception3(ref):
    """inception.py:30-144: the ctor builds the FULL torchvision layer
    list but _forward is truncated after Mixed_6e — the dead tail
    (Mixed_7a/7b/7c, fc) exists only in the literal state_dict.  The
    oracle implements exactly the live prefix."""
    torch.manual_seed(4)
    lm = ref["inception"].Inception3(aux_logits=False, init_weights=True)
    lm.eval()
    om = O.TorchInception3Trunc()
    missing, unexpected = om.load_state_dict(lm.state_dict(),
                                             strict=False)
    assert not missing, missing
    dead = {k.split(".")[0] for k in unexpected}
    assert dead == {"Mixed_7a", "Mixed_7b", "Mixed_7c", "fc"}, dead
    om.eval()
    x = torch.randn(1, 3, 224, 224) * 0.5
    with torch.no_grad():
        lo, oo = lm(x), om(x)
    assert lo.shape == (1, 768, 12, 12)
    assert float((lo - oo).abs().max()) == EXACT


def test_literal_encoder_transformer(ref):
    """hand_net.py:315-398 (the flagship, --net photometric): full
    strict state_dict interchange + bitwise forward identity."""
    torch.manual_seed(5)
    mean = torch.randn(1, 66) * 0.1
    mean[0, 0] = 5.0
    lm = ref["hand_net"].EncoderTransformer(literal_ref.make_opt(), mean)
    om = O.EncoderTransformer(mean, iteration=3, heads=8)
    _identical(lm, om, torch.randn(2, 3, 224, 224) * 0.5)
    # and the reverse direction: the oracle's state_dict is the
    # literal model's state_dict (no key invented, none missing)
    lm.load_state_dict(om.state_dict(), strict=True)


@pytest.mark.slow
def test_literal_encoder_transformer_pl_branch(ref, rng):
    """hand_net.py:396-398: with pl_reg the literal forward returns
    d(sum feat_out)/d(feat_visual) via autograd.grad.

    On torch >= 2 the literal forward cannot run in grad mode at all:
    the root-centering write-back ``pred_params[:, 3:] = pred_3d.view``
    (hand_net.py:393) aliases source and destination and modern torch
    rejects it (witnessed below; it was silently allowed on the torch
    the reference shipped against).  The PL grad itself only involves
    the feat_visual -> PE -> transformer subgraph (hand_net.py:371-380),
    so we compute it from the LITERAL submodules with autograd.grad —
    the exact expression at :398 — and require our Flax model's
    in-graph vjp (models/hand_net.py:117-123) to reproduce it."""
    import jax
    import jax.numpy as jnp
    import flax
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.utils.torch_import import (
        import_torch_encoder_transformer)

    torch.manual_seed(6)
    mean = torch.randn(1, 66) * 0.1
    lm = ref["hand_net"].EncoderTransformer(
        literal_ref.make_opt(pl_reg=True), mean)
    lm.eval()
    x_np = (rng.randn(1, 224, 224, 3) * 0.5).astype(np.float32)
    x = torch.from_numpy(x_np.transpose(0, 3, 1, 2))

    # shipped-code witness: grad-mode forward dies on its own aliasing
    with pytest.raises(RuntimeError, match="single memory location"):
        lm(x)

    # the literal PL probe, from literal submodules (hand_net.py:371-380,
    # :398): feat_visual -> tokens -> PE -> pyramid -> sum -> grad
    from torch import autograd
    with torch.no_grad():
        _, _, x2, _, _ = lm.main_encoder(x)
    feat_visual = lm.conv1x1_channel_reduction(x2).detach()
    feat_visual.requires_grad_(True)
    feat = feat_visual.view(feat_visual.size(0), 21, -1)
    feat = lm.positionalEncoding(feat)
    feat_out = lm.transformer(feat, None)
    (pl_lit,) = autograd.grad(torch.sum(feat_out), feat_visual)

    # our in-graph vjp with the literal weights ported
    model = EncoderTransformer(
        mean_params=jnp.asarray(mean.numpy()[0]), iteration=3, heads=8,
        mask_rate=0.0, token_dim=784, use_pallas=False, pl_reg=True)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.asarray(x_np), train=False)
    params = flax.core.unfreeze(variables["params"])
    batch_stats = flax.core.unfreeze(variables["batch_stats"])
    import_torch_encoder_transformer(lm.state_dict(), params,
                                     batch_stats)
    _, fv, pl_flax = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(
        np.asarray(fv).transpose(0, 3, 1, 2),
        feat_visual.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(pl_flax).transpose(0, 3, 1, 2), pl_lit.numpy(),
        atol=ATOL, err_msg="PL probe grad vs literal autograd.grad")


def test_literal_encoder_transformer_coarse(ref):
    """hand_net.py:216-311 (--net photometric_coarse): 3-output
    identity including the last-layer attention map."""
    torch.manual_seed(7)
    mean = torch.randn(1, 66) * 0.1
    mean[0, 0] = 5.0
    lm = ref["hand_net"].EncoderTransformerCoarse(
        literal_ref.make_opt(), mean)
    om = O.EncoderTransformerCoarse(mean, heads=8)
    _identical(lm, om, torch.randn(2, 3, 224, 224) * 0.5)


def test_literal_h3dw(ref):
    """hand_net.py:28-58 (--net baseline).  The literal forward never
    repeats mean_params over the batch (hand_net.py:53-56), so it only
    runs at batch==1 — witnessed below; the oracle (and our Flax model)
    generalize with an explicit repeat, identical at batch 1."""
    torch.manual_seed(8)
    mean = torch.randn(1, 61) * 0.1
    lm = ref["hand_net"].H3DWEncoder(literal_ref.make_opt(), mean)
    om = O.TorchH3DWEncoder(mean)
    _identical(lm, om, torch.randn(1, 3, 224, 224) * 0.5)
    with pytest.raises(RuntimeError):
        with torch.no_grad():
            lm(torch.randn(2, 3, 224, 224))


def test_literal_vip(ref):
    """vision_performer.py:12-116 (--net vip): performer blocks with the
    frozen Gaussian w, Unfold patchify, HMR head — bitwise identity."""
    torch.manual_seed(9)
    mean = torch.randn(1, 66) * 0.1
    lm = ref["vp"].ViP(literal_ref.make_opt(), mean, image_pix=64,
                       patch_pix=4, out_dim=66, emb_s=32, heads=4,
                       depth=3, kernel_ratio=0.5, dropout=0.0)
    om = O.TorchViP(mean, image_pix=64, patch_pix=4, out_dim=66,
                    emb_s=32, heads=4, depth=3, iteration=3)
    _identical(lm, om, torch.randn(2, 3, 64, 64))


def test_literal_vit_shipped_bug_and_identity(ref):
    """vision_transformer.py:103-153 (--net vit): the declared head
    Linear(dim+num_classes, ...) receives the pyramid's 3-dim pooled
    output — crashes as shipped.  With ONLY that Linear swapped for the
    produced width, the rest is literal and bit-identical."""
    torch.manual_seed(10)
    mean = torch.randn(1, 66) * 0.1
    opt = literal_ref.make_opt(iteration=1)
    lm = ref["vt"].ViT(opt=opt, mean_params=mean, image_size=224,
                       patch_size=16, num_classes=66, dim=256, depth=3,
                       heads=8, mlp_dim=512)
    lm.eval()
    x = torch.randn(2, 3, 224, 224) * 0.5
    with pytest.raises(RuntimeError, match="cannot be multiplied"):
        with torch.no_grad():
            lm(x)
    lm.head = nn.Sequential(nn.Linear(3 + 66, 66))
    om = O.TorchViT(mean, image_size=224, patch_size=16, num_classes=66,
                    dim=256, depth=3, heads=8, iteration=1)
    _identical(lm, om, x)


@pytest.mark.parametrize("head", ["hrnet", "inception"])
@pytest.mark.slow
def test_literal_token_heads_shipped_bug_and_identity(ref, head):
    """hand_net.py:87-146 / :150-213 (--net backbone_incepv3 /
    backbone_hrnet): regressor declared Linear(196+61, 61) but fed the
    pyramid's 3-dim pooled output — crashes as shipped (:102,:141-144).
    With only that Linear swapped, bitwise identity with the oracle."""
    torch.manual_seed(11)
    mean = torch.randn(1, 61) * 0.1
    opt = literal_ref.make_opt()
    if head == "hrnet":
        lm = ref["hand_net"].EncoderTransformerHRNet(opt, mean)
        om = O.EncoderTransformerHRNet(mean, iteration=3, heads=8)
    else:
        lm = ref["hand_net"].EncoderTransformerInception(opt, mean)
        om = O.EncoderTransformerInception(mean, iteration=3, heads=8)
    lm.eval()
    x = torch.randn(1, 3, 224, 224) * 0.5
    with pytest.raises(RuntimeError, match="cannot be multiplied"):
        with torch.no_grad():
            lm(x)
    lm.regressor = nn.Sequential(nn.Linear(3 + 61, 61))
    if head == "inception":
        # the backbone ctor carries torchvision's dead tail (see
        # test_literal_inception3); everything live must land
        lm.eval()
        missing, unexpected = om.load_state_dict(lm.state_dict(),
                                                 strict=False)
        assert not missing, missing
        assert all(k.split(".")[1] in {"Mixed_7a", "Mixed_7b",
                                       "Mixed_7c", "fc"}
                   for k in unexpected), unexpected
        om.eval()
        with torch.no_grad():
            lo, oo = lm(x), om(x)
        assert float((lo - oo).abs().max()) == EXACT
    else:
        _identical(lm, om, x)


@pytest.mark.slow
def test_literal_flagship_to_flax_composed(ref, rng):
    """No oracle in the loop at all: the LITERAL EncoderTransformer's
    state_dict ports through import_torch_encoder_transformer into the
    Flax model and the composed forwards agree at f32."""
    import jax
    import jax.numpy as jnp
    import flax
    from scat_tpu.models.hand_net import EncoderTransformer
    from scat_tpu.utils.torch_import import (
        import_torch_encoder_transformer)

    torch.manual_seed(12)
    mean = torch.randn(1, 66) * 0.1
    mean[0, 0] = 5.0
    lm = ref["hand_net"].EncoderTransformer(literal_ref.make_opt(), mean)
    with torch.no_grad():
        for m in lm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    lm.eval()

    model = EncoderTransformer(
        mean_params=jnp.asarray(mean.numpy()[0]), iteration=3, heads=8,
        mask_rate=0.0, token_dim=784, use_pallas=False)
    x_np = (rng.randn(2, 224, 224, 3) * 0.5).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.asarray(x_np), train=False)
    params = flax.core.unfreeze(variables["params"])
    batch_stats = flax.core.unfreeze(variables["batch_stats"])
    sd = lm.state_dict()
    merged = import_torch_encoder_transformer(sd, params, batch_stats)
    portable = [k for k in sd
                if "positionalEncoding" not in k
                and not k.endswith("num_batches_tracked")]
    assert merged == len(portable)

    pred, fv = model.apply({"params": params, "batch_stats": batch_stats},
                           jnp.asarray(x_np), train=False)
    with torch.no_grad():
        tpred, tfv = lm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(fv).transpose(0, 3, 1, 2), tfv.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(pred), tpred.numpy(),
                               atol=ATOL)


@pytest.mark.parametrize("pool", ["concat", "attention", "last"])
def test_literal_motion_discriminator(ref, pool):
    """motion_discriminator.py:83-139 vs our lax.scan GRU stack, weights
    ported from the literal cuDNN-layout state_dict
    (import_torch_motion_discriminator): all three pooling modes."""
    import jax
    import jax.numpy as jnp
    import flax
    from scat_tpu.models.discriminator import (
        MotionDiscriminator as FlaxMD)
    from scat_tpu.utils.torch_import import (
        import_torch_motion_discriminator)

    torch.manual_seed(13)
    kw = dict(rnn_size=16, input_size=48, num_layers=2, output_size=2,
              feature_pool=pool, attention_size=16, attention_layers=2,
              attention_dropout=0.0)
    lm = ref["motion_disc"].MotionDiscriminator(**kw)
    lm.eval()
    fm = FlaxMD(**kw)
    x = np.random.RandomState(1).randn(3, 7, 48).astype(np.float32)
    variables = fm.init(jax.random.key(0), jnp.asarray(x))
    params = flax.core.unfreeze(variables["params"])
    merged = import_torch_motion_discriminator(lm.state_dict(), params,
                                               num_layers=2)
    # per layer: 3 gates x (i-kernel + h-kernel) = 6; plus fc
    # kernel+bias; attention pool adds 2 Linear layers x (kernel+bias)
    assert merged == 2 * 6 + 2 + (4 if pool == "attention" else 0)
    with torch.no_grad():
        to = lm(torch.from_numpy(x))
    fo = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(fo), to.numpy(), atol=1e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_literal_vibe_loss(ref, masked):
    """loss.py:65-225 (VIBELoss.forward) end to end: literal loss with
    the literal MotionDiscriminator vs our vibe_generator_loss /
    vibe_discriminator_loss with the PORTED flax discriminator — total,
    per-term dict, and the discriminator-side loss all agree.  The
    literal boolean row-indexing (loss.py:149-152) must equal our
    static-shape weighted means, including under a mixed mask."""
    import jax
    import jax.numpy as jnp
    import flax
    from scat_tpu.models.discriminator import (
        MotionDiscriminator as FlaxMD)
    from scat_tpu.models.vibe_loss import (
        VIBELossConfig, vibe_generator_loss, vibe_discriminator_loss,
        encoder_disc_l2_loss)
    from scat_tpu.utils.torch_import import (
        import_torch_motion_discriminator)

    B, T, n_ief = 2, 4, 2
    r = np.random.RandomState(2)
    gen_outputs = [
        {"theta": torch.from_numpy(
            r.randn(B, T, 61).astype(np.float32)),
         "kp_2d": torch.from_numpy(
             r.randn(B, T, 21, 2).astype(np.float32)),
         "kp_3d": torch.from_numpy(
             r.randn(B, T, 21, 3).astype(np.float32))}
        for _ in range(n_ief)]
    if masked:
        w = np.array([[1, 0, 1, 1], [0, 1, 1, 0]], np.float32)
    else:
        w = np.ones((B, T), np.float32)
    data_3d = {
        "kp_2d": torch.from_numpy(r.randn(B, T, 21, 2).astype(
            np.float32)),
        "kp_3d": torch.from_numpy(r.randn(B, T, 21, 3).astype(
            np.float32)),
        "theta": torch.from_numpy(r.randn(B, T, 61).astype(np.float32)),
        "w_3d": torch.from_numpy(w),
        "w_smpl": torch.from_numpy(w),
    }
    mosh = {"theta": torch.from_numpy(r.randn(B, T, 61).astype(
        np.float32))}

    torch.manual_seed(14)
    disc_kw = dict(rnn_size=16, input_size=48, num_layers=2,
                   output_size=2, feature_pool="concat")
    ldisc = ref["motion_disc"].MotionDiscriminator(**disc_kw)
    ldisc.eval()
    lloss = ref["loss"].VIBELoss(device="cpu")
    with torch.no_grad():
        lgen, ldisc_loss, ldict = lloss(
            gen_outputs, None, data_3d, data_motion_mosh=mosh,
            motion_discriminator=ldisc)

    # ported flax discriminator produces our disc values
    fdisc = FlaxMD(**disc_kw)
    seq0 = jnp.asarray(gen_outputs[0]["theta"].numpy()[:, :, 3:51])
    variables = fdisc.init(jax.random.key(0), seq0)
    params = flax.core.unfreeze(variables["params"])
    import_torch_motion_discriminator(ldisc.state_dict(), params,
                                      num_layers=2)
    disc = lambda s: fdisc.apply({"params": params}, s)  # noqa: E731

    pred_motion = jnp.concatenate(
        [jnp.asarray(o["theta"].numpy()) for o in gen_outputs], axis=0)
    fake_value = disc(pred_motion[:, :, 3:51])
    preds = gen_outputs[-1]
    cfg = VIBELossConfig()
    total, terms = vibe_generator_loss(
        cfg,
        jnp.asarray(preds["theta"].numpy()),
        jnp.asarray(preds["kp_2d"].numpy()),
        jnp.asarray(preds["kp_3d"].numpy()),
        jnp.asarray(data_3d["kp_2d"].numpy()),
        jnp.asarray(data_3d["kp_3d"].numpy()),
        jnp.asarray(data_3d["theta"].numpy()),
        w_3d=jnp.asarray(w), w_smpl=jnp.asarray(w),
        disc_fake_value=fake_value)
    np.testing.assert_allclose(float(total), float(lgen), rtol=1e-5)
    for ours, theirs in [("loss_kp_2d", "loss_kp_2d"),
                         ("loss_kp_3d", "loss_kp_3d"),
                         ("loss_pose", "loss_pose"),
                         ("loss_shape", "loss_shape")]:
        np.testing.assert_allclose(
            float(terms[ours]), float(ldict[theirs]), rtol=1e-5,
            err_msg=ours)
    np.testing.assert_allclose(
        float(terms["e_m_disc_loss"]),
        float(lgen) - float(sum(ldict.values())), rtol=1e-4)

    # discriminator-side LSGAN total (loss.py:200-216)
    real_value = disc(jnp.asarray(mosh["theta"].numpy())[:, :, 3:51])
    fake_det = disc(pred_motion[:, :, 3:51])
    _, _, d_total = vibe_discriminator_loss(cfg, real_value, fake_det)
    np.testing.assert_allclose(float(d_total), float(ldisc_loss),
                               rtol=1e-5)
    # sanity: our encoder term really came from the ported disc
    assert float(encoder_disc_l2_loss(fake_value)) > 0


def test_literal_yunqian(ref):
    """models/vit.py:71-108 (YunqianTransformer): the literal file
    defines a PreNorm class but NEVER applies it — Residual wraps
    Attention/FeedForward directly — and its Attention scales dots by
    dim**-0.5 (vit.py:41), not dim_head**-0.5.  Both quirks diverge
    from vision_transformer.py; this test caught our round-1..4
    implementation assuming the pre-norm form, now fixed."""
    import importlib
    import jax
    import jax.numpy as jnp
    import flax
    from scat_tpu.models.vit import YunqianTransformer

    vit_mod = importlib.import_module("models.vit")
    torch.manual_seed(15)
    lm = vit_mod.YunqianTransformer(dim=64, depth=2, heads=2,
                                    mlp_dim=128, dim_head=16,
                                    out_dim=61, dropout=0.0)
    lm.eval()
    fm = YunqianTransformer(dim=64, depth=2, heads=2, dim_head=16,
                            mlp_dim=128, out_dim=61)
    x = np.random.RandomState(6).randn(2, 9, 64).astype(np.float32)
    variables = fm.init(jax.random.key(0), jnp.asarray(x))
    p = flax.core.unfreeze(variables["params"])
    sd = lm.state_dict()
    for i in range(2):
        att = f"transformer.layers.{i}.0.fn"
        p[f"attn_{i}"]["to_qkv"]["kernel"] = (
            sd[f"{att}.to_qkv.weight"].numpy().T)
        p[f"attn_{i}"]["to_out"]["kernel"] = (
            sd[f"{att}.to_out.0.weight"].numpy().T)
        p[f"attn_{i}"]["to_out"]["bias"] = (
            sd[f"{att}.to_out.0.bias"].numpy())
        ffn = f"transformer.layers.{i}.1.fn.net"
        p[f"ff_{i}_1"]["kernel"] = sd[f"{ffn}.0.weight"].numpy().T
        p[f"ff_{i}_1"]["bias"] = sd[f"{ffn}.0.bias"].numpy()
        p[f"ff_{i}_2"]["kernel"] = sd[f"{ffn}.3.weight"].numpy().T
        p[f"ff_{i}_2"]["bias"] = sd[f"{ffn}.3.bias"].numpy()
    p["head_norm"]["scale"] = sd["mlp_head.0.weight"].numpy()
    p["head_norm"]["bias"] = sd["mlp_head.0.bias"].numpy()
    p["head"]["kernel"] = sd["mlp_head.1.weight"].numpy().T
    p["head"]["bias"] = sd["mlp_head.1.bias"].numpy()
    with torch.no_grad():
        want = lm(torch.from_numpy(x))
    got = fm.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=5e-5)


def test_literal_spade(ref):
    """models/helper/spatial_norm.py:20-59 (SPADE): literal weights
    ported; batch (running-stat) and instance variants, with the
    nearest-resize of the segmap."""
    import importlib
    import jax
    import jax.numpy as jnp
    import flax
    from scat_tpu.models.helpers import SPADE
    from scat_tpu.utils.torch_import import _conv_kernel

    sn = importlib.import_module("models.helper.spatial_norm")
    for norm_type in ("batch", "instance"):
        torch.manual_seed(16)
        lm = sn.SPADE(norm_type, 16, 3)
        lm.eval()
        fm = SPADE(norm_nc=16, label_nc=3,
                   param_free_norm_type=norm_type)
        r = np.random.RandomState(7)
        x = r.randn(2, 32, 32, 16).astype(np.float32)
        seg = r.rand(2, 8, 8, 3).astype(np.float32)
        variables = fm.init(jax.random.key(0), jnp.asarray(x),
                            jnp.asarray(seg), train=False)
        p = flax.core.unfreeze(variables["params"])
        sd = lm.state_dict()
        p["mlp_shared"]["kernel"] = _conv_kernel(
            sd["mlp_shared.0.weight"].numpy())
        p["mlp_shared"]["bias"] = sd["mlp_shared.0.bias"].numpy()
        for name in ("mlp_gamma", "mlp_beta"):
            p[name]["kernel"] = _conv_kernel(
                sd[f"{name}.weight"].numpy())
            p[name]["bias"] = sd[f"{name}.bias"].numpy()
        vs = {"params": p}
        if "batch_stats" in variables:
            vs["batch_stats"] = variables["batch_stats"]
        got = fm.apply(vs, jnp.asarray(x), jnp.asarray(seg),
                       train=False)
        with torch.no_grad():
            want = lm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(seg.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            atol=1e-4, err_msg=norm_type)


@pytest.mark.slow
def test_literal_truncated_resnet(ref):
    """models/helper/resnet_helper.py:101-158: the layer1-2 trunk
    (resnet50 layout), literal weights ported into TruncatedResNet."""
    import importlib
    import jax
    import jax.numpy as jnp
    import flax
    from scat_tpu.models.helpers import TruncatedResNet
    from scat_tpu.utils.torch_import import _conv_kernel

    rh = importlib.import_module("models.helper.resnet_helper")
    torch.manual_seed(17)
    lm = rh.resnet50(pretrained=False, zero_init_residual=False)
    with torch.no_grad():
        for m in lm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    lm.eval()
    fm = TruncatedResNet()
    r = np.random.RandomState(8)
    x = r.randn(1, 64, 64, 3).astype(np.float32) * 0.5
    variables = fm.init(jax.random.key(0), jnp.asarray(x), train=False)
    p = flax.core.unfreeze(variables["params"])
    bs = flax.core.unfreeze(variables["batch_stats"])
    sd = lm.state_dict()

    def port_bn(tree_p, tree_b, tname):
        tree_p["scale"] = sd[f"{tname}.weight"].numpy()
        tree_p["bias"] = sd[f"{tname}.bias"].numpy()
        tree_b["mean"] = sd[f"{tname}.running_mean"].numpy()
        tree_b["var"] = sd[f"{tname}.running_var"].numpy()

    p["conv1"]["kernel"] = _conv_kernel(sd["conv1.weight"].numpy())
    port_bn(p["bn1"], bs["bn1"], "bn1")
    for i, blocks in enumerate((3, 4)):
        for j in range(blocks):
            fname = f"layer{i + 1}_{j}"
            tname = f"layer{i + 1}.{j}"
            for k in range(3):
                p[fname][f"Conv_{k}"]["kernel"] = _conv_kernel(
                    sd[f"{tname}.conv{k + 1}.weight"].numpy())
                port_bn(p[fname][f"BatchNorm_{k}"],
                        bs[fname][f"BatchNorm_{k}"],
                        f"{tname}.bn{k + 1}")
            if f"{tname}.downsample.0.weight" in sd:
                p[fname]["downsample_conv"]["kernel"] = _conv_kernel(
                    sd[f"{tname}.downsample.0.weight"].numpy())
                port_bn(p[fname]["downsample_bn"],
                        bs[fname]["downsample_bn"],
                        f"{tname}.downsample.1")
    got = fm.apply({"params": p, "batch_stats": bs}, jnp.asarray(x),
                   train=False)
    with torch.no_grad():
        want = lm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
        atol=1e-3)
