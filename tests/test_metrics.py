"""Metric parity tests vs float64 numpy re-executions of reference
eval.py:300-348 / eval_utils.py (SURVEY.md §2.8)."""

import numpy as np
import jax.numpy as jnp

from scat_tpu.ops import metrics


def _np_cal_pck(pred, gt, rnge):
    """Reference eval.py:300-316 re-executed (including dist.flat quirk)."""
    dist = np.sqrt(((pred * 1000 - gt * 1000) ** 2).sum(axis=-1))
    pck = np.zeros((len(rnge), dist.shape[1] + 1))
    for joint_idx in range(dist.shape[1]):
        for k, rngval in enumerate(rnge):
            pck[k, joint_idx] = 100. * np.mean(dist.flat <= rngval)
    for k in range(len(rnge)):
        pck[k, -1] = np.mean(pck[k, :-1])
    return pck


def _np_auc(xpts, ypts):
    """Reference eval.py:328-348 re-executed."""
    _, I = np.unique(xpts, return_index=True)
    xpts, ypts = xpts[I], ypts[I]
    norm_factor = np.trapezoid(np.ones_like(xpts), xpts)
    return np.trapezoid(ypts, xpts) / norm_factor


def test_cal_pck_flat_compat(rng):
    pred = rng.randn(16, 21, 3) * 0.02
    gt = pred + rng.randn(16, 21, 3) * 0.01
    rnge = np.arange(20, 51, 5)
    got = np.asarray(metrics.cal_pck(jnp.asarray(pred, jnp.float32),
                                     jnp.asarray(gt, jnp.float32),
                                     tuple(rnge), flat_compat=True))
    want = _np_cal_pck(pred.astype(np.float32), gt.astype(np.float32), rnge)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_cal_pck_per_joint(rng):
    pred = rng.randn(16, 21, 3) * 0.02
    gt = pred + rng.randn(16, 21, 3) * 0.01
    rnge = np.arange(20, 51, 5)
    got = np.asarray(metrics.cal_pck(jnp.asarray(pred, jnp.float32),
                                     jnp.asarray(gt, jnp.float32),
                                     tuple(rnge), flat_compat=False))
    dist = np.sqrt((((pred - gt) * 1000) ** 2).sum(-1))
    for k, r in enumerate(rnge):
        want = 100.0 * (dist <= r).mean(axis=0)
        np.testing.assert_allclose(got[k, :-1], want, atol=1e-3)
        np.testing.assert_allclose(got[k, -1], want.mean(), atol=1e-3)


def test_auc_matches_reference(rng):
    rnge = np.arange(20, 51, 5).astype(np.float64)
    y = np.sort(rng.rand(len(rnge))) * 100
    got = float(metrics.area_under_curve(jnp.asarray(rnge / rnge.max()),
                                         jnp.asarray(y)))
    want = _np_auc(rnge / rnge.max(), y)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mpjpe(rng):
    pred = rng.randn(8, 21, 3) * 0.05
    gt = rng.randn(8, 21, 3) * 0.05
    got = np.asarray(metrics.mpjpe(jnp.asarray(pred, jnp.float32),
                                   jnp.asarray(gt, jnp.float32)))
    want = np.sqrt(((pred - gt) ** 2).sum(-1)).mean(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_compute_accel_matches_reference(rng):
    joints = rng.randn(16, 21, 3)
    got = np.asarray(metrics.compute_accel(jnp.asarray(joints, jnp.float32)))
    vel = joints[1:] - joints[:-1]
    acc = vel[1:] - vel[:-1]
    want = np.linalg.norm(acc, axis=2).mean(axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_compute_error_accel_visibility(rng):
    gt = rng.randn(10, 21, 3)
    pred = gt + rng.randn(10, 21, 3) * 0.01
    vis = np.ones(10, dtype=bool)
    vis[4] = False
    got = float(metrics.accel_error_mean(jnp.asarray(gt, jnp.float32),
                                         jnp.asarray(pred, jnp.float32),
                                         jnp.asarray(vis)))
    # reference eval_utils.py:20-48 re-executed
    accel_gt = gt[:-2] - 2 * gt[1:-1] + gt[2:]
    accel_pred = pred[:-2] - 2 * pred[1:-1] + pred[2:]
    normed = np.linalg.norm(accel_pred - accel_gt, axis=2)
    invis = ~vis
    new_invis = (invis | np.roll(invis, -1) | np.roll(invis, -2))[:-2]
    want = np.mean(normed[~new_invis], axis=1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_valid_sample_mask():
    # NHWC images in [-1, 1]; an all-white crop has sum == H*W*C
    imgs = np.zeros((4, 224, 224, 3), np.float32)
    imgs[0] = 1.0          # all white -> invalid
    imgs[1] = -1.0         # all black -> invalid
    imgs[2] = 0.3          # mid grey  -> valid
    imgs[3, :10] = 1.0     # partial   -> valid
    mask = np.asarray(metrics.valid_sample_mask(jnp.asarray(imgs)))
    np.testing.assert_array_equal(mask, [0.0, 0.0, 1.0, 1.0])


def test_pck_with_validity_mask(rng):
    pred = rng.randn(8, 21, 3) * 0.02
    gt = pred + rng.randn(8, 21, 3) * 0.005
    valid = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
    got = np.asarray(metrics.cal_pck(
        jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32),
        valid=jnp.asarray(valid)))
    want = np.asarray(metrics.cal_pck(
        jnp.asarray(pred[:4], jnp.float32), jnp.asarray(gt[:4], jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-4)
