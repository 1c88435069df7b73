"""Packaging: the framework is pip-installable and wheels are
self-contained.

The reference is a run-from-checkout research repo; a framework needs an
installed-tree story.  setup.py copies the shipped runtime data
(extra_data assets, native C++ source) into the wheel under
``scat_tpu/_assets`` / ``scat_tpu/_native``; ``assets.find_asset`` and
``data.native_loader`` fall back to those locations when no checkout
surrounds the package.  These tests guard that contract end-to-end:
build a real wheel, extract it, and exercise the asset/native resolution
from a cwd OUTSIDE the checkout.
"""
import importlib
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_points_resolve():
    """Every [project.scripts] target imports and is callable."""
    # stdlib only since 3.11; the package claims >=3.10, so skip (not
    # crash at collection) the pyproject-parsing test there
    tomllib = pytest.importorskip("tomllib")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)["project"]
    scripts = proj["scripts"]
    assert scripts, "no console scripts declared"
    for name, target in scripts.items():
        mod, func = target.split(":")
        assert callable(getattr(importlib.import_module(mod), func)), name


def test_version_single_source():
    import scat_tpu
    tomllib = pytest.importorskip("tomllib")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)["project"]
    # version is dynamic = read from scat_tpu.__version__; pinning it in
    # pyproject too would reintroduce the drift dynamic versioning removes
    assert "version" in proj.get("dynamic", [])
    assert scat_tpu.__version__.count(".") == 2


def test_find_asset_env_override(tmp_path, monkeypatch):
    d = tmp_path / "alt"
    d.mkdir()
    (d / "hand.obj").write_text("v 0 0 0\n")
    monkeypatch.setenv("SCAT_EXTRA_DATA", str(d))
    from scat_tpu import assets
    assert assets.find_asset("hand.obj") == str(d / "hand.obj")
    # absent files fall back to the checkout path (meaningful errors)
    assert assets.find_asset("MANO_RIGHT.pkl") == os.path.join(
        REPO, "extra_data", "MANO_RIGHT.pkl")


@pytest.mark.slow
def test_wheel_is_self_contained(tmp_path):
    wheel_dir = tmp_path / "wheels"
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-w", str(wheel_dir), REPO],
        check=True, capture_output=True, timeout=600)
    [wheel] = list(wheel_dir.glob("*.whl"))
    tree = tmp_path / "site"
    with zipfile.ZipFile(wheel) as z:
        names = z.namelist()
        z.extractall(tree)
    for rel in ("scat_tpu/_assets/hand.obj",
                "scat_tpu/_assets/mean_mano_params.pkl",
                "scat_tpu/_native/scat_native.cpp",
                "scat_tpu/_native/build.sh"):
        assert rel in names, rel
    # the wheel must NOT drag the test suite or benchmarks along
    assert not any(n.startswith(("tests/", "benchmarks/")) for n in names)

    # installed-tree UX: resolve assets + native source with cwd OUTSIDE
    # the checkout and only the extracted wheel on sys.path
    code = (
        "import sys\n"
        "import scat_tpu.assets as a\n"
        "site = sys.argv[1]\n"
        "assert a.DEFAULT_HAND_OBJ.startswith(site), a.DEFAULT_HAND_OBJ\n"
        "m = a.load_mean_params()\n"
        "assert m.shape == (66,) and float(m[0]) == 5.0\n"
        "mano = a.load_mano()\n"
        "assert mano.v_template.shape == (778, 3)\n"
        "from scat_tpu.data import native_loader as nl\n"
        "assert nl._SRC_DIR.startswith(site), nl._SRC_DIR\n"
    )
    env = dict(os.environ, PYTHONPATH=str(tree), JAX_PLATFORMS="cpu")
    env.pop("SCAT_EXTRA_DATA", None)
    subprocess.run([sys.executable, "-c", code, str(tree)],
                   check=True, capture_output=True,
                   cwd=str(tmp_path), env=env, timeout=300)

    # the wheel-layout build.sh must compile the native library
    # STANDALONE (runpy on ../data/native_loader.py, no scat_tpu
    # package import — a slim build image has g++/numpy but no ML stack)
    build_env = dict(os.environ)
    build_env.pop("PYTHONPATH", None)  # nothing but the script's runpy
    subprocess.run(["bash", str(tree / "scat_tpu/_native/build.sh")],
                   check=True, capture_output=True, env=build_env,
                   timeout=300)
    assert (tree / "scat_tpu/_native/libscat_native.so").exists()


def test_asset_defaults_are_lazy(tmp_path, monkeypatch):
    """DEFAULT_* module attrs re-resolve per access (PEP 562): an
    SCAT_EXTRA_DATA set AFTER `import scat_tpu` must still win —
    freezing at import time silently routed a real MANO_RIGHT.pkl to
    the synthetic fallback."""
    from scat_tpu import assets  # imported (long) before the env change
    d = tmp_path / "late"
    d.mkdir()
    (d / "MANO_RIGHT.pkl").write_bytes(b"x")
    monkeypatch.setenv("SCAT_EXTRA_DATA", str(d))
    assert assets.DEFAULT_MANO_PKL == str(d / "MANO_RIGHT.pkl")
    monkeypatch.delenv("SCAT_EXTRA_DATA")
    assert assets.DEFAULT_MANO_PKL != str(d / "MANO_RIGHT.pkl")
    with pytest.raises(AttributeError):
        assets.NO_SUCH_ATTR


@pytest.mark.slow
def test_sdist_builds_wheel(tmp_path):
    """pip's no-matching-wheel fallback path: sdist -> wheel must work,
    i.e. MANIFEST.in ships the out-of-package files BuildPyWithData
    copies (extra_data assets, native source)."""
    import tarfile
    dist = tmp_path / "dist"
    subprocess.run(
        [sys.executable, "-m", "build", "--sdist", "--no-isolation",
         "-o", str(dist), REPO],
        check=True, capture_output=True, timeout=600)
    [sdist] = list(dist.glob("*.tar.gz"))
    with tarfile.open(sdist) as t:
        t.extractall(tmp_path / "src", filter="data")
    [srcdir] = list((tmp_path / "src").iterdir())
    for rel in ("extra_data/hand.obj", "native/scat_native.cpp"):
        assert (srcdir / rel).exists(), rel
    wheel_dir = tmp_path / "wheels"
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-w", str(wheel_dir), str(srcdir)],
        check=True, capture_output=True, timeout=600)
    [wheel] = list(wheel_dir.glob("*.whl"))
    with zipfile.ZipFile(wheel) as z:
        names = z.namelist()
    assert "scat_tpu/_assets/hand.obj" in names
    assert "scat_tpu/_native/scat_native.cpp" in names
