"""ctypes bindings for the native host input pipeline
(native/scat_native.cpp): libjpeg/libpng decode + fused affine warp +
normalize in a C++ thread pool, overlapping the TPU step.

Falls back to the PIL + on-device path transparently when the shared
library hasn't been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def _source_dir() -> str:
    """Locate the C++ source: checkout-layout ``native/`` first, then the
    copy setup.py ships inside wheels as ``scat_tpu/_native/``."""
    checkout = os.path.join(_REPO_ROOT, "native")
    if os.path.exists(os.path.join(checkout, "scat_native.cpp")):
        return checkout
    return os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "_native")


_SRC_DIR = _source_dir()
_SRC_PATH = os.path.join(_SRC_DIR, "scat_native.cpp")


def _src_digest() -> str:
    import hashlib
    try:
        with open(_SRC_PATH, "rb") as f:
            return hashlib.sha1(f.read()).hexdigest()[:12]
    except OSError:
        return "nosrc"


def _so_location() -> str:
    """Build beside the source in a writable checkout (keeps the manual
    ``native/build.sh`` output valid); read-only site-packages installs
    fall back to a per-user cache keyed by a source-content hash, so an
    upgraded package (even with normalized file mtimes) or a second
    venv with a different version never loads a stale binary."""
    if os.access(_SRC_DIR, os.W_OK):
        return os.path.join(_SRC_DIR, "libscat_native.so")
    return os.path.join(os.path.expanduser("~"), ".cache", "scat_tpu",
                        f"libscat_native-{_src_digest()}.so")


_SO_PATH = _so_location()

_lib = None

# THE build recipe — native/build.sh delegates here so the flags live in
# exactly one place.  No -march=native: the .so may outlive the build
# machine (containers, cached layers); generic x86-64 + O3 is portable.
_CXX_CMD = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17"]
_CXX_LIBS = ["-ljpeg", "-lpng", "-lpthread"]


def _build() -> bool:
    # compile to a process-unique temp path, then os.replace: concurrent
    # processes (multi-host tests, two jobs sharing a checkout or the
    # user cache) each publish a COMPLETE binary atomically — a racing
    # dlopen never maps a half-written .so
    tmp = f"{_SO_PATH}.tmp.{os.getpid()}"
    cmd = _CXX_CMD + [_SRC_PATH, "-o", tmp] + _CXX_LIBS
    try:
        os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO_PATH)
        return True
    except subprocess.CalledProcessError as e:
        # visible once: a failed build silently demotes every loader to
        # the slower PIL path otherwise
        tail = (e.stderr or b"").decode(errors="replace")[-300:]
        print(f"[native] build failed, falling back to the PIL "
              f"pipeline: {tail}")
        return False
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"[native] build unavailable ({e}); using the PIL "
              "pipeline")
        return False
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass


def _stale() -> bool:
    """Rebuild when the source is newer than the binary."""
    try:
        return os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
    except OSError:
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.scat_decode_image.restype = ctypes.c_int
    lib.scat_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int]
    lib.scat_affine_warp_u8.restype = None
    lib.scat_affine_warp_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int]
    lib.scat_init_pool.restype = None
    lib.scat_init_pool.argtypes = [ctypes.c_int]
    lib.scat_load_batch.restype = ctypes.c_int
    lib.scat_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.scat_load_batch_aug.restype = ctypes.c_int
    lib.scat_load_batch_aug.argtypes = lib.scat_load_batch.argtypes + [
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lib


def load_library(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if auto_build and (not os.path.exists(_SO_PATH) or _stale()):
        _build()
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = _bind(ctypes.CDLL(_SO_PATH))
    except (OSError, AttributeError) as e:
        # A pre-existing .so built from older source can lack a newer
        # symbol (AttributeError from dlsym) even when the mtime check
        # didn't trigger a rebuild. Rebuild once — dlopen reloads the
        # replaced inode — then fall back to the PIL path, never crash.
        lib = None
        if auto_build and _build():
            try:
                lib = _bind(ctypes.CDLL(_SO_PATH))
            except (OSError, AttributeError):
                lib = None
        if lib is None:
            print(f"[native] stale/unloadable {_SO_PATH} ({e}); using "
                  "the PIL pipeline")
            return None
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def init_pool(n_threads: int = 4) -> None:
    lib = load_library()
    if lib:
        lib.scat_init_pool(n_threads)


def decode_image(path: str, height: int, width: int) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.scat_decode_image(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width)
    if rc != 0:
        raise IOError(f"decode failed ({rc}): {path}")
    return out


def affine_warp(image_u8: np.ndarray, M_inv: np.ndarray, oh: int, ow: int
                ) -> np.ndarray:
    """Single-image warp; ``M_inv`` [2,3] output-px -> input-px."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    image_u8 = np.ascontiguousarray(image_u8, np.uint8)
    Minv = np.ascontiguousarray(M_inv, np.float32).reshape(6)
    out = np.empty((oh, ow, 3), np.float32)
    H, W = image_u8.shape[:2]
    lib.scat_affine_warp_u8(
        image_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W,
        Minv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow)
    return out


def load_batch(paths: Sequence[str], height: int, width: int,
               M_inv: np.ndarray, oh: int = 224, ow: int = 224,
               blur_ksize: Optional[np.ndarray] = None,
               blur_axis: Optional[np.ndarray] = None
               ) -> tuple[np.ndarray, np.ndarray]:
    """Decode+warp a batch concurrently.

    ``blur_ksize``/``blur_axis`` [N] int: optional per-image motion blur
    applied to the full frame before the warp (ksize<=1 = none; axis 0
    vertical, 1 horizontal — the reference's per-sample draw,
    load_STB.py:266-268).

    Returns (images [N,oh,ow,3] float32 in [-1,1], valid [N] float32) —
    failed decodes come back all -1 with valid=0, mirroring the
    reference's empty-crop filter convention (train.py:143-150).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    Minv = np.ascontiguousarray(M_inv, np.float32).reshape(n, 6)
    out = np.empty((n, oh, ow, 3), np.float32)
    status = np.empty((n,), np.int32)
    int_ptr = ctypes.POINTER(ctypes.c_int)
    if blur_ksize is None:
        ks_p = ctypes.cast(None, int_ptr)
        ax_p = ctypes.cast(None, int_ptr)
    else:
        ks = np.ascontiguousarray(blur_ksize, np.int32)
        ax = np.ascontiguousarray(
            blur_axis if blur_axis is not None else np.zeros(n),
            np.int32)
        ks_p = ks.ctypes.data_as(int_ptr)
        ax_p = ax.ctypes.data_as(int_ptr)
    lib.scat_load_batch_aug(
        arr, n, height, width,
        Minv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow,
        status.ctypes.data_as(int_ptr), ks_p, ax_p)
    valid = (status == 0).astype(np.float32)
    return out, valid


def build_native(force: bool = False):
    """Build the library at its canonical location; the single public
    entry for ``native/build.sh`` and wheel post-install hooks."""
    if force or not os.path.exists(_SO_PATH) or _stale():
        if not _build():
            return None
    return _SO_PATH if os.path.exists(_SO_PATH) else None


if __name__ == "__main__":
    import sys
    path = build_native(force="--force" in sys.argv)
    if path is None:
        sys.exit("native build failed")
    print(f"built {path}")
