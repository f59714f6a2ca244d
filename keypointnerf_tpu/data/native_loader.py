"""ctypes bindings for the native C++ data-pipeline core (native/kpnerf_data.cc).

Provides undistort / INTER_AREA resize / nearest resize / mask compositing
plus a threaded prefetcher, replacing the reference's OpenCV +
torch-DataLoader host path (reference src/zju_dataset.py:273-286) with
OpenMP C++ that the TPU feeder can call without Python in the loop.

The library is built on demand with `make` (g++ -O3 -fopenmp). Callers
should check `available()` and fall back to cv2 when the toolchain is
missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libkpnerf_data.so"))

_lib = None
_lib_lock = threading.Lock()

_f32p = ctypes.POINTER(ctypes.c_float)
_LOAD_FN = ctypes.CFUNCTYPE(None, ctypes.c_int64, ctypes.c_void_p)


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=os.path.abspath(_NATIVE_DIR), check=True,
            capture_output=True,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.kp_undistort.argtypes = [
            _f32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p, _f32p
        ]
        lib.kp_resize_area.argtypes = [
            _f32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.kp_resize_nearest.argtypes = lib.kp_resize_area.argtypes
        lib.kp_mask_apply.argtypes = [_f32p, _f32p, _f32p, ctypes.c_int, ctypes.c_int]
        lib.kp_prefetch_create.argtypes = [_LOAD_FN, ctypes.c_void_p, ctypes.c_int]
        lib.kp_prefetch_create.restype = ctypes.c_void_p
        lib.kp_prefetch_submit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int
        ]
        lib.kp_prefetch_wait.argtypes = [ctypes.c_void_p]
        lib.kp_prefetch_wait.restype = ctypes.c_int64
        lib.kp_prefetch_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_f32p)


def undistort(img: np.ndarray, K: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """cv2.undistort-equivalent. img: (H, W[, C]) float32."""
    lib = _load()
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    out = np.empty_like(img)
    K = np.ascontiguousarray(K, np.float32).reshape(9)
    d = np.zeros(5, np.float32)
    dist = np.asarray(dist, np.float32).ravel()
    d[: min(5, dist.size)] = dist[:5]
    lib.kp_undistort(_ptr(img), _ptr(out), h, w, c, _ptr(K), _ptr(d))
    return out[..., 0] if squeeze else out


def resize_area(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    img = np.ascontiguousarray(img, np.float32)
    sh, sw, c = img.shape
    out = np.empty((dh, dw, c), np.float32)
    lib.kp_resize_area(_ptr(img), _ptr(out), sh, sw, dh, dw, c)
    return out[..., 0] if squeeze else out


def resize_nearest(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    img = np.ascontiguousarray(img, np.float32)
    sh, sw, c = img.shape
    out = np.empty((dh, dw, c), np.float32)
    lib.kp_resize_nearest(_ptr(img), _ptr(out), sh, sw, dh, dw, c)
    return out[..., 0] if squeeze else out


def mask_apply(img: np.ndarray, mask: np.ndarray):
    """Zero background in-place; returns (img, float mask (H, W, 1))."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    m_in = np.ascontiguousarray(mask, np.float32).reshape(img.shape[0], img.shape[1])
    m_out = np.empty_like(m_in)
    lib.kp_mask_apply(_ptr(img), _ptr(m_in), _ptr(m_out), img.shape[0], img.shape[1])
    return img, m_out[..., None]


class Prefetcher:
    """Threaded sample prefetcher backed by the C++ worker pool.

    `load(index)` runs on native threads (ctypes callbacks release the
    GIL around C work; numpy/imageio inside also drop it for IO). Results
    are stored by the callback into a Python dict guarded by a lock.
    """

    def __init__(self, load: Callable[[int], object], n_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._results = {}
        self._lock = threading.Lock()
        self._user_load = load

        def _cb(index, _user):
            try:
                value = self._user_load(int(index))
            except Exception as e:  # keep worker alive
                value = e
            with self._lock:
                self._results[int(index)] = value

        self._cb = _LOAD_FN(_cb)  # keep a reference alive
        self._handle = lib.kp_prefetch_create(self._cb, None, n_threads)

    def submit(self, indices: Sequence[int]):
        arr = (ctypes.c_int64 * len(indices))(*indices)
        self._lib.kp_prefetch_submit(self._handle, arr, len(indices))

    def get(self) -> tuple[int, object]:
        idx = int(self._lib.kp_prefetch_wait(self._handle))
        with self._lock:
            return idx, self._results.pop(idx)

    def close(self):
        if self._handle:
            self._lib.kp_prefetch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
