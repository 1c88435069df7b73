"""Literal-source MANO oracle (round-4 review, Missing #2).

The reference's ``models/mano.py`` pickle-loads ``extra_data/
MANO_RIGHT.pkl`` at module import (mano.py:220) — the only reason it
never ran here.  ``literal_ref.write_mano_pkl`` emits a synthetic but
SCHEMA-EXACT pickle (scipy-sparse J_regressor, [2,16] kintree id
table, float64 payloads) from the same deterministic model our own
mano tests use (assets.synthetic_mano(seed=3)), so the literal module
imports and both reference paths run as oracles:

  * ``rot_pose_beta_to_mesh`` (mano.py:280-391) — functional path,
    guarded Rodrigues, frankmocap fingertips, root-centering;
  * ``ManoHand.forward`` (mano.py:83-201) — the JSON-loading module
    path, quaternion Rodrigues, PCA pose, get_skin.

The formula-heaviest code in the repo (LBS, Rodrigues Taylor guard,
pose-corrective blendshapes, kintree composition) is hereby proven
against reference code, not self-derived goldens.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import literal_ref
from scat_tpu import assets
from scat_tpu.models import mano as mano_lib

# both sides are f32 with HIGHEST-precision matmuls; agreement is at
# float-ulp level (measured 4e-8 on 0.14-scale outputs)
ATOL = 1e-6


@pytest.fixture(scope="session")
def mano_env(tmp_path_factory):
    data = assets.synthetic_mano(seed=3)
    tree = tmp_path_factory.mktemp("mano_tree")
    literal_ref.write_mano_pkl(
        str(tree / "extra_data" / "MANO_RIGHT.pkl"), data)
    literal = literal_ref.load_mano_literal(str(tree))
    return literal, data, tree


def test_literal_module_constants(mano_env):
    """The literal module-level pickle parse (mano.py:220-234) agrees
    with assets.load_mano_pkl on every derived constant — same
    v_template, dense J_regressor, and kintree->parent derivation."""
    literal, data, tree = mano_env
    loaded = assets.load_mano_pkl(
        str(tree / "extra_data" / "MANO_RIGHT.pkl"))
    np.testing.assert_array_equal(literal.mesh_mu.numpy()[0],
                                  loaded.v_template)
    np.testing.assert_array_equal(literal.J_regressor.numpy()[0],
                                  loaded.J_regressor)
    np.testing.assert_array_equal(literal.posedirs.numpy()[0],
                                  loaded.posedirs)
    np.testing.assert_array_equal(literal.weights.numpy()[0],
                                  loaded.weights)
    np.testing.assert_array_equal(literal.hands_mean.numpy()[0],
                                  loaded.hands_mean)
    for i in range(1, 16):
        assert literal.parent[i] == int(loaded.kintree_parents[i])
    np.testing.assert_array_equal(loaded.v_template, data.v_template)


def test_literal_rodrigues(mano_env):
    """mano.py:237-268: two-branch Rodrigues (sin/cos + Taylor fallback
    at theta<1e-30) vs our single smooth guarded formula — equal away
    from zero AND at exactly zero."""
    literal, data, tree = mano_env
    from scat_tpu.ops.geometry import rodrigues_guarded
    r = np.random.RandomState(0).randn(8, 3).astype(np.float32)
    r[3] = 0.0  # exact zero: literal takes the Taylor branch
    R_lit, _ = literal.rodrigues(torch.from_numpy(r))
    R_ours = rodrigues_guarded(jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(R_ours), R_lit.numpy(),
                               atol=1e-6)


def test_literal_rot_pose_beta_to_mesh(mano_env):
    """mano.py:280-391 end to end: [B,799,3] joints++verts output,
    global rotation after skinning, root-centering on joint 1."""
    literal, data, tree = mano_env
    r = np.random.RandomState(1)
    B = 4
    rots = (r.randn(B, 3) * 0.5).astype(np.float32)
    rots[0] = 0.0  # zero global rotation hits the guard
    poses = (r.randn(B, 45) * 0.3).astype(np.float32)
    betas = (r.randn(B, 10) * 0.5).astype(np.float32)
    with torch.no_grad():
        lout = literal.rot_pose_beta_to_mesh(
            torch.from_numpy(rots), torch.from_numpy(poses),
            torch.from_numpy(betas))
    model = mano_lib.ManoModel.from_data(data)
    fout = mano_lib.rot_pose_beta_to_mesh(
        model, jnp.asarray(rots), jnp.asarray(poses),
        jnp.asarray(betas))
    assert lout.shape == (B, 799, 3)
    np.testing.assert_allclose(np.asarray(fout), lout.numpy(),
                               atol=ATOL)


def test_literal_mano_hand_forward(mano_env):
    """mano.py:83-201 (``ManoHand``): the JSON-consuming module path —
    PCA pose (12 comps), quaternion Rodrigues, fingertip ids
    [734,333,443,555,678], get_skin returns (verts, joints, Rs)."""
    literal, data, tree = mano_env
    jd = {
        "v_template": data.v_template.tolist(),
        "J_regressor": data.J_regressor.tolist(),
        "shapedirs": data.shapedirs.tolist(),
        "posedirs": data.posedirs.tolist(),
        "weights": data.weights.tolist(),
        "hands_mean": data.hands_mean.tolist(),
        "hands_components": data.hands_components.tolist(),
        "kintree_table": np.vstack(
            [data.kintree_parents, np.arange(16)]).tolist(),
        "f": (data.faces.tolist() if data.faces is not None else []),
    }
    jpath = str(tree / "mano_model.json")
    with open(jpath, "w") as f:
        json.dump(jd, f)
    B = 4
    hand = literal.ManoHand(jpath, batch_size=B, obj_saveable=False)
    r = np.random.RandomState(2)
    beta = (r.randn(B, 10) * 0.5).astype(np.float32)
    theta = (r.randn(B, 15) * 0.5).astype(np.float32)
    with torch.no_grad():
        lv, lj, lr = hand(torch.from_numpy(beta),
                          torch.from_numpy(theta), get_skin=True)
    model = mano_lib.ManoModel.from_data(data)
    fv, fj, fr = mano_lib.mano_hand_forward(
        model, jnp.asarray(beta), jnp.asarray(theta), get_skin=True)
    np.testing.assert_allclose(np.asarray(fv), lv.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(fj), lj.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(fr), lr.numpy(), atol=1e-6)


def test_literal_get_poseweights(mano_env):
    """mano.py:270-277: pose-corrective features (R - I flattened,
    root excluded) — the multiplier of posedirs in both paths."""
    literal, data, tree = mano_env
    from scat_tpu.ops.geometry import rodrigues_guarded
    r = np.random.RandomState(3)
    B = 3
    poses = (r.randn(B, 16, 3) * 0.4).astype(np.float32)
    with torch.no_grad():
        lw = literal.get_poseweights(torch.from_numpy(poses), B)
    Rs = rodrigues_guarded(jnp.asarray(poses[:, 1:].reshape(-1, 3)))
    ours = (Rs.reshape(B, 15, 3, 3)
            - jnp.eye(3, dtype=jnp.float32)).reshape(B, -1)
    np.testing.assert_allclose(np.asarray(ours), lw.numpy(), atol=1e-6)
