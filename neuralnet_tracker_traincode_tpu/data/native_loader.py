"""ctypes bindings for the native C++ loader core (JPEG decode + batch pack).

Builds `native/nntc_loader.cpp` on first use (g++ -O3 -ljpeg, cached next to
the source). Falls back to cv2 transparently when the toolchain or libjpeg is
unavailable — set $NNTC_NO_NATIVE=1 to force the fallback.
"""

import ctypes
import os
import subprocess
import threading
from os.path import dirname, getmtime, isfile, join, realpath
from typing import List, Optional, Sequence, Tuple

import numpy as np

_SRC = join(dirname(realpath(__file__)), "..", "..", "native", "nntc_loader.cpp")
_SO = join(dirname(realpath(__file__)), "..", "..", "native", "nntc_loader.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO, "-ljpeg", "-lpthread",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=300)
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        print(f"native loader build failed:\n{res.stderr.decode()[:2000]}")
        return False
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("NNTC_NO_NATIVE"):
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not isfile(_SO) or (isfile(_SRC) and getmtime(_SRC) > getmtime(_SO)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.nntc_decode_jpeg.restype = ctypes.c_int
        lib.nntc_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.nntc_pack_batch_gray.restype = ctypes.c_int
        lib.nntc_pack_batch_gray.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def decode_jpeg_gray(buffer: np.ndarray, max_size: int = 8192) -> Optional[np.ndarray]:
    """Decode a JPEG buffer to (H, W) uint8 grayscale; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.ascontiguousarray(buffer, np.uint8)
    # Rows are written at stride max_size (the decoder writes into a padded slot).
    out = np.empty((max_size, max_size), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.nntc_decode_jpeg(
        buf.ctypes.data_as(ctypes.c_char_p), buf.nbytes,
        out.ctypes.data_as(ctypes.c_void_p), max_size, max_size, 1,
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        return None
    return out[: h.value, : w.value].copy()


def pack_jpeg_batch_gray(
    buffers: Sequence[np.ndarray], pad_size: int, nthreads: Optional[int] = None
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode JPEG buffers straight into a zero-padded (N, pad, pad, 1) batch.

    Returns (batch, heights, widths) or None when the native lib is missing or
    any image failed/overflowed (caller falls back to the python path).
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(buffers)
    blob = np.concatenate([np.ascontiguousarray(b, np.uint8).ravel() for b in buffers])
    lengths = np.asarray([b.size for b in buffers], np.uintp)
    offsets = np.zeros(n, np.uintp)
    np.cumsum(lengths[:-1], out=offsets[1:])
    out = np.zeros((n, pad_size, pad_size, 1), np.uint8)
    heights = np.zeros(n, np.int32)
    widths = np.zeros(n, np.int32)
    failures = lib.nntc_pack_batch_gray(
        blob.ctypes.data_as(ctypes.c_char_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        lengths.ctypes.data_as(ctypes.c_void_p),
        n,
        out.ctypes.data_as(ctypes.c_void_p),
        pad_size,
        heights.ctypes.data_as(ctypes.c_void_p),
        widths.ctypes.data_as(ctypes.c_void_p),
        nthreads or max(1, (os.cpu_count() or 1)),
    )
    if failures:
        return None
    return out, heights, widths
