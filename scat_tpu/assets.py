"""Asset loading: MANO model data, mean-parameter template, mesh template.

The reference builds its 66-dim mean-parameter vector from the MANO
template vertices at hand-picked Blender vertex ids (reference
train.py:77-110).  ``MANO_RIGHT.pkl`` is not redistributable; like the
reference (README.md:21) we load it from a user-supplied path.  Unlike the
reference — which hard-crashes at *import time* (models/mano.py:220) — all
loading here is lazy and falls back to:

  * the 778-vertex template mesh shipped as ``extra_data/hand.obj`` for the
    mean template (it is the same ``v_template`` the pickle carries), and
  * a deterministic synthetic MANO parameter set for the LBS pipeline in
    tests/benchmarks when the real pickle is absent.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional, Sequence

import numpy as np

# Back-of-hand / palm template vertex ids (1-indexed Blender picks),
# reference train.py:94-99.  Order follows the 21-joint SMPLX layout the
# regressor predicts.
LOCAL_TREE_BACK = [188, 142, 87, 290, 216, 316, 402, 200, 585, 630, 285,
                   473, 513, 88, 249, 702, 329, 439, 668, 550, 740]
LOCAL_TREE_PALM = [35, 168, 47, 337, 283, 353, 449, 591, 599, 637, 139,
                   467, 560, 5, 121, 707, 329, 439, 668, 550, 740]

# Fingertip vertex ids for the two MANO joint conventions kept by the
# reference (models/mano.py:88 and :374-378).
FINGERTIP_VERTS_MANOHAND = [734, 333, 443, 555, 678]
FINGERTIP_VERTS_FRANKMOCAP = [320, 443, 671, 554, 744]

NUM_VERTS = 778
NUM_JOINTS_MANO = 16
NUM_SHAPE_BASIS = 10
NUM_POSE_BASIS = 135  # (16-1) * 9

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "_assets")


def find_asset(name: str) -> str:
    """Resolve a shipped or user-supplied asset file by name.

    Search order (first existing wins):
      1. ``$SCAT_EXTRA_DATA/<name>`` — explicit override,
      2. ``./extra_data/<name>`` — the reference UX: the user drops
         ``MANO_RIGHT.pkl`` beside their run, and the reference's config
         defaults are cwd-relative (reference README.md:21, config.py),
      3. ``<checkout>/extra_data/<name>`` — this repo's layout,
      4. ``scat_tpu/_assets/<name>`` — wheel installs (setup.py copies the
         shipped assets into the package at build time).

    When nothing exists, returns the checkout-layout path so downstream
    ``os.path.exists`` probes and error messages stay meaningful.
    """
    cands = []
    env = os.environ.get("SCAT_EXTRA_DATA")
    if env:
        cands.append(os.path.join(env, name))
    cands.append(os.path.join(os.getcwd(), "extra_data", name))
    cands.append(os.path.join(_REPO_ROOT, "extra_data", name))
    cands.append(os.path.join(_PKG_ASSETS, name))
    for c in cands:
        if os.path.exists(c):
            return c
    return os.path.join(_REPO_ROOT, "extra_data", name)


# DEFAULT_HAND_OBJ / DEFAULT_MANO_PKL / DEFAULT_MEAN_MANO are module
# attributes resolved LAZILY (PEP 562) — `SCAT_EXTRA_DATA` or an
# os.chdir() after `import scat_tpu` must still be honored; freezing
# find_asset() at import time would silently fall back to the synthetic
# MANO when the user points at the real pickle post-import.
_LAZY_DEFAULTS = {
    "DEFAULT_HAND_OBJ": "hand.obj",
    "DEFAULT_MANO_PKL": "MANO_RIGHT.pkl",
    "DEFAULT_MEAN_MANO": "mean_mano_params.pkl",
}


def __getattr__(name: str) -> str:
    if name in _LAZY_DEFAULTS:
        return find_asset(_LAZY_DEFAULTS[name])
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def load_obj_vertices(path: Optional[str] = None) -> np.ndarray:
    """Parse vertex rows of a Wavefront .obj -> float32 [V,3]."""
    path = find_asset("hand.obj") if path is None else path
    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(t) for t in line.split()[1:4]])
    return np.asarray(verts, dtype=np.float32)


def load_obj_faces(path: Optional[str] = None) -> np.ndarray:
    path = find_asset("hand.obj") if path is None else path
    faces = []
    with open(path) as f:
        for line in f:
            if line.startswith("f "):
                faces.append([int(t.split("/")[0]) - 1
                              for t in line.split()[1:4]])
    return np.asarray(faces, dtype=np.int32)


def build_mean_params(v_template: np.ndarray, outside: bool = True
                      ) -> np.ndarray:
    """66-dim mean vector: camera scale 5.0, zeros for tx/ty, then the 21
    template-vertex xyz picks (reference train.py:104-109)."""
    tree = LOCAL_TREE_BACK if outside else LOCAL_TREE_PALM
    idx = np.asarray(tree, dtype=np.int64) - 1  # blender ids are 1-based
    mean = np.zeros((66,), dtype=np.float32)
    mean[0] = 5.0
    mean[3:] = v_template[idx].reshape(-1)
    return mean


@dataclasses.dataclass
class ManoModelData:
    """Numeric payload of MANO_RIGHT.pkl as plain float32 numpy arrays."""

    v_template: np.ndarray        # [778, 3]
    shapedirs: np.ndarray         # [778, 3, 10]
    posedirs: np.ndarray          # [778, 3, 135]
    J_regressor: np.ndarray       # [16, 778]
    weights: np.ndarray           # [778, 16]
    kintree_parents: np.ndarray   # [16] (parents[0] unused)
    hands_mean: np.ndarray        # [45]
    hands_components: np.ndarray  # [45, 45] PCA basis
    faces: Optional[np.ndarray] = None  # [F, 3]
    synthetic: bool = False

    @property
    def parents(self) -> np.ndarray:
        return self.kintree_parents


def _dense(x) -> np.ndarray:
    if hasattr(x, "todense"):
        x = np.asarray(x.todense())
    return np.asarray(x, dtype=np.float64).astype(np.float32)


def load_mano_pkl(path: Optional[str] = None) -> ManoModelData:
    """Load MANO_RIGHT.pkl (layout per reference models/mano.py:220-232)."""
    path = find_asset("MANO_RIGHT.pkl") if path is None else path
    with open(path, "rb") as f:
        dd = pickle.load(f, encoding="latin1")
    kintree = np.asarray(dd["kintree_table"])
    id_to_col = {int(kintree[1, i]): i for i in range(kintree.shape[1])}
    parents = np.zeros((kintree.shape[1],), dtype=np.int32)
    for i in range(1, kintree.shape[1]):
        parents[i] = id_to_col[int(kintree[0, i])]
    hands_components = _dense(np.vstack(dd["hands_components"][:]))
    return ManoModelData(
        v_template=_dense(dd["v_template"]),
        shapedirs=_dense(dd["shapedirs"]),
        posedirs=_dense(dd["posedirs"]),
        J_regressor=_dense(dd["J_regressor"]).T
        if _dense(dd["J_regressor"]).shape[0] == NUM_VERTS
        else _dense(dd["J_regressor"]),
        weights=_dense(dd["weights"]),
        kintree_parents=parents,
        hands_mean=_dense(dd["hands_mean"]),
        hands_components=hands_components,
        faces=np.asarray(dd["f"], dtype=np.int32)
        if "f" in dd else None,
    )


def synthetic_mano(seed: int = 0,
                   v_template: Optional[np.ndarray] = None) -> ManoModelData:
    """Deterministic stand-in MANO for tests when the pickle is absent.

    Uses the real template mesh when available (hand.obj) so the kinematic
    scale is realistic; blend shapes / skinning weights are seeded random
    with MANO-like structure (rows of ``weights`` sum to 1; J_regressor
    rows are convex combinations over nearby vertices).
    """
    rng = np.random.RandomState(seed)
    hand_obj = find_asset("hand.obj")
    if v_template is None:
        if os.path.exists(hand_obj):
            v_template = load_obj_vertices(hand_obj)
        else:
            v_template = rng.randn(NUM_VERTS, 3).astype(np.float32) * 0.03
    shapedirs = rng.randn(NUM_VERTS, 3, NUM_SHAPE_BASIS).astype(
        np.float32) * 1e-3
    posedirs = rng.randn(NUM_VERTS, 3, NUM_POSE_BASIS).astype(
        np.float32) * 1e-4
    # J_regressor: each joint averages a random local cluster of vertices.
    J_regressor = np.zeros((NUM_JOINTS_MANO, NUM_VERTS), dtype=np.float32)
    anchor = rng.choice(NUM_VERTS, NUM_JOINTS_MANO, replace=False)
    d2 = np.sum((v_template[None, :, :] -
                 v_template[anchor][:, None, :]) ** 2, axis=-1)
    for j in range(NUM_JOINTS_MANO):
        w = np.exp(-d2[j] / 2e-4)
        J_regressor[j] = w / w.sum()
    # skinning weights: soft assignment to the two nearest joints
    joints = J_regressor @ v_template
    dj = np.sum((v_template[:, None, :] - joints[None, :, :]) ** 2, axis=-1)
    weights = np.exp(-dj / 1e-3)
    weights /= weights.sum(axis=1, keepdims=True)
    parents = np.array([0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14],
                       dtype=np.int32)
    comp = rng.randn(45, 45).astype(np.float32)
    comp, _ = np.linalg.qr(comp)
    return ManoModelData(
        v_template=np.asarray(v_template, dtype=np.float32),
        shapedirs=shapedirs,
        posedirs=posedirs,
        J_regressor=J_regressor,
        weights=weights.astype(np.float32),
        kintree_parents=parents,
        hands_mean=(rng.randn(45) * 0.1).astype(np.float32),
        hands_components=comp.astype(np.float32),
        faces=load_obj_faces(hand_obj)
        if os.path.exists(hand_obj) else None,
        synthetic=True,
    )


def load_mano_json(path: str) -> ManoModelData:
    """Load a JSON-serialized MANO model (the format the reference's
    ``ManoHand`` consumes, models/mano.py:92-133: plain lists under the
    same keys as the pickle)."""
    import json
    with open(path) as f:
        dd = json.load(f)
    parents = np.asarray(dd["kintree_table"])[0].astype(np.int32)
    return ManoModelData(
        v_template=_dense(dd["v_template"]),
        shapedirs=_dense(dd["shapedirs"]),
        posedirs=_dense(dd["posedirs"]),
        J_regressor=_dense(dd["J_regressor"]).T
        if np.asarray(dd["J_regressor"]).shape[0] == NUM_VERTS
        else _dense(dd["J_regressor"]),
        weights=_dense(dd["weights"]),
        kintree_parents=parents,
        hands_mean=_dense(dd["hands_mean"]),
        hands_components=_dense(np.vstack(dd["hands_components"])),
        faces=np.asarray(dd["f"], dtype=np.int32) if "f" in dd else None,
    )


def load_mano(path: Optional[str] = None, allow_synthetic: bool = True
              ) -> ManoModelData:
    path = find_asset("MANO_RIGHT.pkl") if path is None else path
    if os.path.exists(path):
        if path.endswith(".json"):
            return load_mano_json(path)
        return load_mano_pkl(path)
    if allow_synthetic:
        return synthetic_mano()
    raise FileNotFoundError(
        f"MANO model not found at {path}; download MANO_RIGHT.pkl from the "
        "MANO project page (see reference README.md:21) or pass "
        "allow_synthetic=True for a test stand-in.")


def load_mean_params(outside: bool = True,
                     mano_path: Optional[str] = None,
                     obj_path: Optional[str] = None) -> np.ndarray:
    """Mean 66-dim parameter vector from whichever template source exists."""
    mano_path = find_asset("MANO_RIGHT.pkl") if mano_path is None \
        else mano_path
    obj_path = find_asset("hand.obj") if obj_path is None else obj_path
    if os.path.exists(mano_path):
        v_template = load_mano_pkl(mano_path).v_template
    elif os.path.exists(obj_path):
        v_template = load_obj_vertices(obj_path)
    else:
        raise FileNotFoundError(
            f"neither {mano_path} nor {obj_path} present; "
            "cannot build the mean template")
    return build_mean_params(v_template, outside)


def load_mean_mano_pose(path: Optional[str] = None) -> np.ndarray:
    """61-dim FrankMocap-style mean (cam3 + pose48 + shape10).

    Layout per reference eval.py:404-426: camera scale 5.0; pose = zeros(3)
    global orient prepended to the pickle's ``mean_pose[3:]`` (45 local
    dofs); shape = zeros(10)."""
    path = find_asset("mean_mano_params.pkl") if path is None else path
    mean = np.zeros((61,), dtype=np.float32)
    mean[0] = 5.0
    if os.path.exists(path):
        with open(path, "rb") as f:
            dd = pickle.load(f, encoding="latin1")
        mean_pose = np.asarray(dd["mean_pose"], dtype=np.float32).reshape(-1)
        mean[6:51] = mean_pose[3:48]
    return mean
