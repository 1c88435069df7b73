"""scat-validate-data: green on valid fixture trees, loud specific
diagnostics on corrupted ones (VERDICT r03 item 4 — real-data first
contact as a tool, not an incident)."""

import json
import os
import pickle

import numpy as np
import pytest

from scat_tpu import validate_data
from tests.test_freihand import _write_synthetic_frei
from tests.test_ho3d import _write_synthetic_ho3d
from tests.test_stb import _write_synthetic_stb


# ---------------------------------------------------------------- STB

def test_stb_valid_tree_green(tmp_path):
    root = str(_write_synthetic_stb(tmp_path, n=4))
    report = validate_data.validate_stb(root)
    assert report.n_errors == 0
    assert report.n_samples == 4 * 12


def test_stb_missing_labels_dir(tmp_path):
    report = validate_data.validate_stb(str(tmp_path))
    assert "stb-no-labels-dir" in report.codes("error")


def test_stb_missing_handpara_key(tmp_path):
    root = _write_synthetic_stb(tmp_path, n=2)
    with open(root / "labels" / "B2Counting_SK.pkl", "wb") as f:
        pickle.dump({"wrong_key": np.zeros((3, 21, 2))}, f)
    report = validate_data.validate_stb(str(root))
    assert "stb-pkl-key" in report.codes("error")


def test_stb_bad_handpara_shape(tmp_path):
    root = _write_synthetic_stb(tmp_path, n=2)
    with open(root / "labels" / "B2Counting_SK.pkl", "wb") as f:
        pickle.dump({"handPara": np.zeros((21, 3, 2))}, f)
    report = validate_data.validate_stb(str(root))
    assert "stb-handpara-shape" in report.codes("error")


def test_stb_truncated_pickle(tmp_path):
    root = _write_synthetic_stb(tmp_path, n=2)
    p = root / "labels" / "B2Counting_SK.pkl"
    raw = p.read_bytes()
    p.write_bytes(raw[: len(raw) // 2])
    report = validate_data.validate_stb(str(root))
    assert "stb-pkl-unreadable" in report.codes("error")


def test_stb_missing_frames(tmp_path):
    root = _write_synthetic_stb(tmp_path, n=4)
    os.remove(root / "B2Counting" / "SK_color_2.png")
    report = validate_data.validate_stb(str(root))
    assert "stb-missing-frames" in report.codes("error")


def test_stb_wrong_units_warn(tmp_path):
    root = _write_synthetic_stb(tmp_path, n=2)
    # meters instead of mm: depth ~0.5 instead of ~500
    hand = np.random.RandomState(0).rand(3, 21, 2) * 0.1 + 0.5
    with open(root / "labels" / "B2Counting_SK.pkl", "wb") as f:
        pickle.dump({"handPara": hand}, f)
    report = validate_data.validate_stb(str(root))
    assert "stb-units" in report.codes("warn")


# ----------------------------------------------------------- FreiHAND

def test_frei_valid_tree_green(tmp_path):
    root = str(_write_synthetic_frei(tmp_path, n=4, img_size=224)[0])
    report = validate_data.validate_frei(root)
    assert report.n_errors == 0
    assert report.n_samples == 4
    # fixture sizes differ from the reference's 65920 -> warned, not err
    assert "frei-db-size" in report.codes("warn")


def test_frei_missing_K(tmp_path):
    root = _write_synthetic_frei(tmp_path, n=2)[0]
    os.remove(root / "training_K.json")
    report = validate_data.validate_frei(str(root))
    assert "frei-no-K" in report.codes("error")


def test_frei_len_mismatch(tmp_path):
    root, K, xyz, _ = _write_synthetic_frei(tmp_path, n=4)
    with open(root / "training_xyz.json", "w") as f:
        json.dump(xyz[:2].tolist(), f)
    report = validate_data.validate_frei(str(root))
    assert "frei-len-mismatch" in report.codes("error")


def test_frei_narrow_mano(tmp_path):
    root, K, xyz, _ = _write_synthetic_frei(tmp_path, n=4)
    with open(root / "training_mano.json", "w") as f:
        json.dump(np.zeros((4, 1, 40)).tolist(), f)
    report = validate_data.validate_frei(str(root))
    assert "frei-mano-width" in report.codes("error")


def test_frei_noncontiguous_naming(tmp_path):
    root = _write_synthetic_frei(tmp_path, n=4)[0]
    os.rename(root / "training" / "rgb" / "00000001.jpg",
              root / "training" / "rgb" / "frame_1.jpg")
    report = validate_data.validate_frei(str(root))
    assert "frei-naming" in report.codes("error")


def test_frei_wrong_intrinsics(tmp_path):
    root, K, xyz, _ = _write_synthetic_frei(tmp_path, n=2, img_size=224)
    bad_K = K.copy()
    bad_K[:, 0, 2] = 5000.0  # principal point far outside the frame
    with open(root / "training_K.json", "w") as f:
        json.dump(bad_K.tolist(), f)
    report = validate_data.validate_frei(str(root))
    assert "frei-projection" in report.codes("error")


def test_frei_bad_json(tmp_path):
    root = _write_synthetic_frei(tmp_path, n=2)[0]
    (root / "training_K.json").write_text("{not json")
    report = validate_data.validate_frei(str(root))
    assert "frei-bad-json" in report.codes("error")


# ------------------------------------------------------------- HO-3D

def test_ho3d_valid_tree_green(tmp_path):
    root = str(_write_synthetic_ho3d(tmp_path)[0])
    report = validate_data.validate_ho3d(root)
    assert report.n_errors == 0
    assert report.n_samples > 0


def test_ho3d_missing_split(tmp_path):
    report = validate_data.validate_ho3d(str(tmp_path))
    assert "ho3d-no-split" in report.codes("error")


def _ho3d_meta_path(root, seq="ABF10", i=0, split="train"):
    return root / split / seq / "meta" / f"{i:04d}.pkl"


def test_ho3d_missing_meta_key(tmp_path):
    root, _ = _write_synthetic_ho3d(tmp_path, frames=2)
    mp = _ho3d_meta_path(root)
    with open(mp, "rb") as f:
        m = pickle.load(f)
    del m["camMat"]
    with open(mp, "wb") as f:
        pickle.dump(m, f)
    report = validate_data.validate_ho3d(str(root))
    assert "ho3d-pkl-key" in report.codes("error")


def test_ho3d_unlabeled_split_detected(tmp_path):
    root, _ = _write_synthetic_ho3d(tmp_path, frames=2, labeled=False)
    report = validate_data.validate_ho3d(str(root))
    assert "ho3d-unlabeled" in report.codes("error")


def test_ho3d_unpaired_frames_warn(tmp_path):
    root, _ = _write_synthetic_ho3d(tmp_path, frames=3)
    os.remove(_ho3d_meta_path(root, i=1))
    report = validate_data.validate_ho3d(str(root))
    assert "ho3d-unpaired" in report.codes("warn")
    assert report.n_errors == 0


# ------------------------------------------------- CLI / auto-detect

def test_detect_dataset(tmp_path):
    (tmp_path / "stb").mkdir()
    stb_root = _write_synthetic_stb(tmp_path / "stb", n=1)
    frei_root = _write_synthetic_frei(tmp_path / "frei", n=1)[0]
    ho3d_root = _write_synthetic_ho3d(tmp_path / "ho3d", frames=1)[0]
    assert validate_data.detect_dataset(str(stb_root)) == "stb"
    assert validate_data.detect_dataset(str(frei_root)) == "frei"
    assert validate_data.detect_dataset(str(ho3d_root)) == "ho3d"
    assert validate_data.detect_dataset(str(tmp_path)) is None


def test_cli_exit_codes(tmp_path):
    root = _write_synthetic_frei(tmp_path, n=2, img_size=224)[0]
    assert validate_data.main(
        ["--data_dir", str(root), "--dataset", "frei"]) == 0
    os.remove(root / "training_K.json")
    assert validate_data.main(
        ["--data_dir", str(root), "--dataset", "frei"]) == 1
    assert validate_data.main(
        ["--data_dir", str(tmp_path / "nope"), "--dataset", "auto"]) == 2


@pytest.mark.slow
def test_sample_pipeline_dumps_crops(tmp_path):
    pytest.importorskip("matplotlib")
    root = _write_synthetic_frei(tmp_path, n=4, img_size=128)[0]
    out = tmp_path / "out"
    paths = validate_data.run_sample_pipeline(
        "frei", str(root), 2, str(out))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)


@pytest.mark.slow
def test_cli_n_mode_stb(tmp_path):
    pytest.importorskip("matplotlib")
    root = _write_synthetic_stb(tmp_path, n=4)
    rc = validate_data.main(
        ["--data_dir", str(root), "--dataset", "stb", "--n", "2",
         "--out", str(tmp_path / "dbg")])
    assert rc == 0
    assert len(os.listdir(tmp_path / "dbg")) == 2


# ------------------------------------------------------------ MHP/RHD

def _write_mhp_valid(root, n_frames=2, cam=1):
    """MHP tree with 640x480 frames so the toolkit DEFAULT_K projects
    inside the image (the loader's assumption for real captures)."""
    from PIL import Image
    rng = np.random.RandomState(3)
    seq = "data_1"
    frames = os.path.join(root, "annotated_frames", seq)
    calib = os.path.join(root, "calibrations", seq, f"webcam_{cam}")
    os.makedirs(frames)
    os.makedirs(calib)
    with open(os.path.join(calib, "rvec.pkl"), "wb") as f:
        pickle.dump(np.zeros(3, np.float32), f)
    with open(os.path.join(calib, "tvec.pkl"), "wb") as f:
        pickle.dump(np.zeros(3, np.float32), f)
    for i in range(n_frames):
        img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        from PIL import Image
        Image.fromarray(img).save(
            os.path.join(frames, f"{i}_webcam_{cam}.jpg"))
        joints = rng.randn(21, 3).astype(np.float32) * 30.0
        joints[:, 2] += 600.0
        with open(os.path.join(frames, f"{i}_joints.txt"), "w") as f:
            for j, (x, y, z) in enumerate(joints):
                f.write(f"{j} {x} {y} {z}\n")
    return seq


def _write_rhd_valid(root, n=3):
    """RHD tree whose uv_vis IS the K-projection of xyz (like the real
    release), so the intrinsics-consistency check passes."""
    from PIL import Image
    rng = np.random.RandomState(4)
    split = "training"
    color = os.path.join(root, split, "color")
    os.makedirs(color)
    K = np.array([[283.0, 0, 160.0], [0, 283.0, 160.0], [0, 0, 1]])
    anno = {}
    for i in range(n):
        Image.fromarray((rng.rand(320, 320, 3) * 255).astype(
            np.uint8)).save(os.path.join(color, f"{i:05d}.png"))
        xyz = rng.randn(42, 3) * 0.03 + np.array([0, 0, 0.6])
        proj = xyz @ K.T
        uv = proj[:, :2] / proj[:, 2:3]
        anno[i] = {"xyz": xyz.astype(np.float32),
                   "uv_vis": np.concatenate(
                       [uv, np.ones((42, 1))], 1).astype(np.float32),
                   "K": K.astype(np.float32)}
    with open(os.path.join(root, split, f"anno_{split}.pickle"),
              "wb") as f:
        pickle.dump(anno, f)


def test_mhp_valid_tree_green(tmp_path):
    _write_mhp_valid(str(tmp_path))
    report = validate_data.validate_mhp(str(tmp_path))
    assert report.n_errors == 0
    assert report.n_samples == 2
    assert "mhp-default-K" in report.codes("info")


def test_mhp_missing_extrinsics(tmp_path):
    _write_mhp_valid(str(tmp_path))
    os.remove(tmp_path / "calibrations" / "data_1" / "webcam_1"
              / "rvec.pkl")
    report = validate_data.validate_mhp(str(tmp_path))
    assert "mhp-no-extrinsics" in report.codes("error")


def test_mhp_bad_joints_txt(tmp_path):
    _write_mhp_valid(str(tmp_path))
    (tmp_path / "annotated_frames" / "data_1"
     / "0_joints.txt").write_text("1 2 3\n4 5 6\n")
    report = validate_data.validate_mhp(str(tmp_path))
    assert "mhp-joints-shape" in report.codes("error")


def test_rhd_valid_tree_green(tmp_path):
    _write_rhd_valid(str(tmp_path))
    report = validate_data.validate_rhd(str(tmp_path))
    assert report.n_errors == 0
    assert report.n_samples == 3


def test_rhd_missing_anno(tmp_path):
    report = validate_data.validate_rhd(str(tmp_path))
    assert "rhd-no-anno" in report.codes("error")


def test_rhd_bad_shapes(tmp_path):
    _write_rhd_valid(str(tmp_path))
    p = tmp_path / "training" / "anno_training.pickle"
    with open(p, "rb") as f:
        anno = pickle.load(f)
    anno[0]["xyz"] = anno[0]["xyz"][:21]          # wrong shape
    with open(p, "wb") as f:
        pickle.dump(anno, f)
    report = validate_data.validate_rhd(str(tmp_path))
    assert "rhd-anno-shape" in report.codes("error")


def test_rhd_inconsistent_intrinsics(tmp_path):
    _write_rhd_valid(str(tmp_path))
    p = tmp_path / "training" / "anno_training.pickle"
    with open(p, "rb") as f:
        anno = pickle.load(f)
    for i in anno:
        anno[i]["K"][0, 0] *= 3.0   # focal lengths only: scaling the
        anno[i]["K"][1, 1] *= 3.0   # whole K is projectively invariant
    with open(p, "wb") as f:
        pickle.dump(anno, f)
    report = validate_data.validate_rhd(str(tmp_path))
    assert "rhd-projection" in report.codes("error")


def test_detect_mhp_rhd(tmp_path):
    (tmp_path / "mhp").mkdir()
    (tmp_path / "rhd").mkdir()
    _write_mhp_valid(str(tmp_path / "mhp"))
    _write_rhd_valid(str(tmp_path / "rhd"))
    assert validate_data.detect_dataset(str(tmp_path / "mhp")) == "mhp"
    assert validate_data.detect_dataset(str(tmp_path / "rhd")) == "rhd"


@pytest.mark.slow
def test_sample_pipeline_ho3d_mhp_rhd(tmp_path):
    """--n mode runs the real loader factories for every family."""
    pytest.importorskip("matplotlib")
    (tmp_path / "mhp").mkdir()
    (tmp_path / "rhd").mkdir()
    ho3d_root = _write_synthetic_ho3d(tmp_path, frames=3)[0]
    _write_mhp_valid(str(tmp_path / "mhp"), n_frames=3)
    _write_rhd_valid(str(tmp_path / "rhd"), n=4)
    for name, root in (("ho3d", str(ho3d_root)),
                       ("mhp", str(tmp_path / "mhp")),
                       ("rhd", str(tmp_path / "rhd"))):
        out = tmp_path / f"out_{name}"
        paths = validate_data.run_sample_pipeline(
            name, root, 2, str(out))
        assert len(paths) == 2 and all(os.path.exists(p)
                                       for p in paths), name


def test_mhp_missing_calib_dir_is_warn_not_error(tmp_path):
    """A camera whose whole calibration dir is absent is SKIPPED by the
    loader (MHPDataset.__init__), so the validator warns; only an
    existing dir with missing pickles (a loader crash) is an error."""
    import shutil
    _write_mhp_valid(str(tmp_path))
    shutil.rmtree(tmp_path / "calibrations" / "data_1" / "webcam_1")
    report = validate_data.validate_mhp(str(tmp_path))
    assert "mhp-cam-skipped" in report.codes("warn")
    assert report.n_errors == 0
    assert report.n_samples == 0  # no usable camera remains


def test_frei_frame_checks_survive_broken_xyz(tmp_path):
    """Frame-size/readability diagnostics must not be hidden by a
    broken label file."""
    root = _write_synthetic_frei(tmp_path, n=2, img_size=128)[0]
    with open(root / "training_xyz.json", "w") as f:
        json.dump(np.zeros((2, 5, 3)).tolist(), f)  # wrong shape
    report = validate_data.validate_frei(str(root))
    assert "frei-xyz-shape" in report.codes("error")
    assert "frei-frame-size" in report.codes("warn")


def test_rhd_projection_check_skips_corrupt_first_sample(tmp_path):
    """A corrupt idx0 must not disable the intrinsics-consistency
    check — it runs on the first schema-valid sample."""
    _write_rhd_valid(str(tmp_path))
    p = tmp_path / "training" / "anno_training.pickle"
    with open(p, "rb") as f:
        anno = pickle.load(f)
    anno[0]["xyz"] = anno[0]["xyz"][:21]   # corrupt idx0
    for i in list(anno)[1:]:               # break intrinsics elsewhere
        anno[i]["K"][0, 0] *= 3.0
        anno[i]["K"][1, 1] *= 3.0
    with open(p, "wb") as f:
        pickle.dump(anno, f)
    report = validate_data.validate_rhd(str(tmp_path))
    assert "rhd-anno-shape" in report.codes("error")
    assert "rhd-projection" in report.codes("error")


def test_vip_bad_favor_precision_fails_at_build():
    from scat_tpu.config import Options
    from scat_tpu.models import build_model
    with pytest.raises(ValueError, match="favor_precision"):
        build_model(Options(net="ViP", favor_precision="mixed-high"),
                    32)


def test_hrnet_bad_stop_after_asserts():
    import jax
    import jax.numpy as jnp
    from scat_tpu.models.hrnet import HRNet
    m = HRNet(c=16, nof_joints=32, stop_after="stage4")
    with pytest.raises(AssertionError):
        m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
               train=False)


def test_mhp_count_is_per_camera_pairs(tmp_path):
    """Advisor r04: n_samples must count jpg+joints.txt PAIRS per
    camera (what MHPSequence yields), not n_txt x n_cams — an extra
    unpaired annotation or an extra unpaired jpg must not change it."""
    _write_mhp_valid(str(tmp_path), n_frames=2)
    frames = tmp_path / "annotated_frames" / "data_1"
    # annotation with no jpg
    (frames / "9_joints.txt").write_text(
        "".join(f"{j} 0.0 0.0 600.0\n" for j in range(21)))
    # jpg with no annotation
    from PIL import Image
    Image.fromarray(np.zeros((480, 640, 3), np.uint8)).save(
        frames / "8_webcam_1.jpg")
    report = validate_data.validate_mhp(str(tmp_path))
    assert report.n_samples == 2


def test_detect_dataset_generic_labels_dir_not_stb(tmp_path):
    """Advisor r04: a bare labels/ directory without {seq}_SK.pkl or a
    B* sequence must NOT auto-detect as STB."""
    (tmp_path / "labels").mkdir()
    (tmp_path / "labels" / "whatever.txt").write_text("x")
    assert validate_data.detect_dataset(str(tmp_path)) is None
    # but a real STB marker restores detection
    (tmp_path / "labels" / "B1Counting_SK.pkl").write_bytes(b"")
    assert validate_data.detect_dataset(str(tmp_path)) == "stb"


def test_sample_pipeline_prefers_train_split(tmp_path):
    """Advisor r04: on a tree holding BOTH splits the --n pipeline must
    exercise the TRAINING split (the files the subsequent training run
    reads), not B1."""
    root = _write_synthetic_stb(tmp_path, n=1)
    # tree already holds B1 (eval) sequences? ensure a train seq exists
    has_train = any(
        (root / s).is_dir() for s in validate_data.STB_TRAIN_SEQS)
    has_eval = any(
        (root / s).is_dir() for s in validate_data.STB_EVAL_SEQS)
    from scat_tpu.data.stb import STBDataset
    import unittest.mock as mock
    seen = {}
    real_init = STBDataset.__init__

    def spy(self, name, **kw):
        seen["name"] = name
        return real_init(self, name, **kw)

    with mock.patch.object(STBDataset, "__init__", spy):
        try:
            validate_data.run_sample_pipeline(
                "stb", str(root), 1, str(tmp_path / "out"))
        except Exception:
            pass  # the crop dump may fail on a 1-sample tree; the
        #            split choice is what's under test
    if has_train:
        assert seen["name"] == "STB_train"
    else:
        assert has_eval and seen["name"] == "STB_eval"
