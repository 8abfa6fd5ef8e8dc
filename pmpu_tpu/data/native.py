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


_DTYPE_BYTES = {2: 1, 256: 1, 4: 2, 512: 2, 8: 4, 768: 4, 16: 4,
                64: 8, 1024: 8, 1280: 8}


def _read_header(path: str) -> tuple:
    """(shape, datatype, vox_offset) with structural validation."""
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
    return shape, int(dt.value), int(off.value)


def read_shape(path: str) -> tuple:
    return _read_header(path)[0]


def _gz_yields_at_least(path: str, want: int) -> bool:
    """True iff the (possibly multi-member) gzip stream decompresses to at
    least ``want`` bytes. Streaming count only — nothing is stored, and the
    scan stops the moment ``want`` is reached, so cost is bounded by the
    claim (which the max-expansion check has already capped)."""
    import zlib

    seen = 0
    d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
    try:
        with open(path, "rb") as f:
            buf = b""
            while True:
                if not buf:
                    buf = f.read(1 << 20)
                    if not buf:
                        return False  # input exhausted before `want`
                seen += len(d.decompress(buf, 1 << 20))
                if seen >= want:
                    return True
                if d.eof:
                    # member boundary — a following gzip member continues
                    # the logical stream (zlib's gzread concatenates them
                    # the same way); anything else ends it
                    buf = d.unused_data
                    if len(buf) < 2:
                        buf += f.read(1 << 20)
                    if not buf.startswith(b"\x1f\x8b"):
                        return False
                    d = zlib.decompressobj(wbits=31)
                else:
                    buf = d.unconsumed_tail
    except zlib.error:
        return False


def _preflight_payload(path: str, count: int, esz: int, vox_offset: int) -> None:
    """Reject implausible header-claimed sizes BEFORE allocating the output
    buffer — a corrupt header with huge positive dims must raise a clean
    ValueError, not attempt a multi-TB np.empty. Plain files are checked
    exactly against the file size; gzip members against the trailing ISIZE
    field (decompressed size mod 2^32 — exact for payloads < 4 GB, which is
    every claim we can't otherwise verify)."""
    claimed = vox_offset + count * esz
    try:
        fsize = os.path.getsize(path)
    except OSError as e:
        raise ValueError(f"{path}: {e}") from e
    if not path.endswith(".gz"):
        if claimed > fsize:
            raise ValueError(
                f"{path}: header claims {claimed} bytes but file has {fsize}"
            )
        return
    if claimed > fsize * 1032 + (1 << 16):
        # deflate's maximum expansion ratio is 1032:1 — a 98 TiB claim
        # from a 500-byte file is impossible, not just unlikely. This
        # bound alone already forbids the multi-TB np.empty.
        raise ValueError(
            f"{path}: header claims {claimed} bytes from a "
            f"{fsize}-byte gzip (exceeds max deflate expansion)"
        )
    if claimed < (1 << 32):
        try:
            with open(path, "rb") as f:
                f.seek(-4, os.SEEK_END)
                isize = int.from_bytes(f.read(4), "little")
        except OSError as e:
            # a .gz shorter than 4 bytes (or one that vanished mid-check)
            # must stay inside the codec's ValueError contract rather than
            # leak an OSError — don't rely on read_header's 348-byte
            # minimum having run first
            raise ValueError(f"{path}: {e}") from e
        if claimed > isize and not _gz_yields_at_least(path, claimed):
            # ISIZE is the LAST member's decompressed size, so a mismatch
            # is not proof of corruption: multi-member gzips (bgzip,
            # concatenated files per RFC 1952) are valid and gzread loads
            # them transparently. Only when an exact bounded streaming
            # count (rare path — single-member files settle on ISIZE
            # alone) confirms the shortfall do we reject.
            raise ValueError(
                f"{path}: header claims {claimed} bytes but gzip "
                f"decompresses to {isize}"
            )


def load_volume(path: str) -> np.ndarray:
    """One volume as C-order float32 (scl applied) — parity with
    ``nifti.load(path, dtype=np.float32)``."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native io unavailable")
    full_shape, datatype, vox_offset = _read_header(path)
    shape = full_shape[:3]
    n = int(np.prod(shape))
    esz = _DTYPE_BYTES.get(datatype)
    if esz is None:
        raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
    _preflight_payload(path, int(np.prod(full_shape)), esz, vox_offset)
    out = np.empty(n, dtype=np.float32)
    sh = (ctypes.c_int64 * 3)()
    rc = lib.pmpu_load_volume_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, sh
    )
    if rc < 0:
        raise ValueError(f"{path}: native load error {-rc}")
    return out.reshape(shape)


def load_dataset(paths: list, cube: int, nthreads: int = 0, out=None) -> np.ndarray:
    """Parallel stacked load: (len(paths), cube, cube, cube) float32, each
    volume zero-padded at the high end (reference pad-to-cube semantics).

    ``out``: optional preallocated C-contiguous float32 (n,cube,cube,cube)
    buffer the C++ loader fills in place — pass an ``np.memmap`` for the
    out-of-core volume pool (the decompressed pool then never touches the
    heap; the OS pages it)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native io unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, cube, cube, cube), dtype=np.float32)
    elif (
        out.shape != (n, cube, cube, cube)
        or out.dtype != np.float32
        or not out.flags["C_CONTIGUOUS"]
    ):
        raise ValueError(
            f"out must be C-contiguous float32 {(n, cube, cube, cube)}, "
            f"got {out.dtype} {out.shape}"
        )
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.pmpu_load_dataset_f32(
        arr, n, cube, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads
    )
    if rc != 0:
        raise ValueError(f"native dataset load error {rc}")
    return out
