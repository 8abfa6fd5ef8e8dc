"""ctypes bindings for the native C++ NIfTI loader (native/pmpu_io.cpp).

Auto-builds ``libpmpu_io.so`` with the in-repo Makefile on first use and
falls back silently to the pure-Python loader (``pmpu_tpu.data.nifti``)
when a toolchain isn't available — behavior is identical (tested), the
native path is just a multithreaded, GIL-free startup accelerator.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpmpu_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception as e:  # pragma: no cover - toolchain-dependent
        log.info("native io build unavailable: %s", e)
        return False


def get_lib():
    """The loaded CDLL, or None when native IO is unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:  # pragma: no cover
            log.info("native io load failed: %s", e)
            return None
        lib.pmpu_read_header.restype = ctypes.c_int
        lib.pmpu_read_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pmpu_load_volume_f32.restype = ctypes.c_int64
        lib.pmpu_load_volume_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pmpu_load_dataset_f32.restype = ctypes.c_int
        lib.pmpu_load_dataset_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def read_shape(path: str) -> tuple:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native io unavailable")
    dims = (ctypes.c_int64 * 8)()
    dt = ctypes.c_int()
    scl = (ctypes.c_double * 2)()
    off = ctypes.c_int64()
    rc = lib.pmpu_read_header(path.encode(), dims, ctypes.byref(dt), scl, ctypes.byref(off))
    if rc != 0:
        raise ValueError(f"{path}: native header error {rc}")
    nd = int(dims[0])
    if not (1 <= nd <= 7):
        raise ValueError(f"{path}: bad NIfTI dim[0]={nd}")
    shape = tuple(int(dims[1 + i]) for i in range(nd))
    if any(d < 1 for d in shape):
        raise ValueError(f"{path}: non-positive dimension in {shape}")
    return shape


def load_volume(path: str) -> np.ndarray:
    """One volume as C-order float32 (scl applied) — parity with
    ``nifti.load(path, dtype=np.float32)``."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native io unavailable")
    shape = read_shape(path)[:3]
    n = int(np.prod(shape))
    out = np.empty(n, dtype=np.float32)
    sh = (ctypes.c_int64 * 3)()
    rc = lib.pmpu_load_volume_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, sh
    )
    if rc < 0:
        raise ValueError(f"{path}: native load error {-rc}")
    return out.reshape(shape)


def load_dataset(paths: list, cube: int, nthreads: int = 0) -> np.ndarray:
    """Parallel stacked load: (len(paths), cube, cube, cube) float32, each
    volume zero-padded at the high end (reference pad-to-cube semantics)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native io unavailable")
    n = len(paths)
    out = np.empty((n, cube, cube, cube), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.pmpu_load_dataset_f32(
        arr, n, cube, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads
    )
    if rc != 0:
        raise ValueError(f"native dataset load error {rc}")
    return out
