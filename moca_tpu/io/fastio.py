"""ctypes bindings for the native fastio library (native/fastio.cpp).

Optional: `make -C native` builds libfastio.so; without it the numpy
fallbacks in io/video.py are used.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    path = os.path.join(here, "native", "libfastio.so")
    if not os.path.exists(path):
        raise OSError(f"{path} not built (run: make -C native)")
    lib = ctypes.CDLL(path)
    lib.float_to_uint8.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_size_t]
    lib.uint8_to_float.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_size_t]
    lib.pack_frames.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t, ctypes.c_size_t]
    lib.fastio_abi_version.restype = ctypes.c_int
    assert lib.fastio_abi_version() == 1
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def float_to_uint8(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.uint8)
    lib.float_to_uint8(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), x.size)
    return out


def uint8_to_float(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.uint8)
    out = np.empty(x.shape, np.float32)
    lib.uint8_to_float(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size)
    return out


def pack_frames(frames) -> np.ndarray:
    """Assemble equally-shaped uint8 frames into one contiguous [T, ...]
    clip buffer (multithreaded memcpy in native/fastio.cpp, replacing
    np.stack's single-threaded copy on the FIFO→encoder path)."""
    lib = _load()
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    shape = frames[0].shape
    if any(f.shape != shape for f in frames):
        raise ValueError("pack_frames requires equally-shaped frames")
    out = np.empty((len(frames),) + shape, np.uint8)
    ptr_t = ctypes.POINTER(ctypes.c_uint8)
    ptrs = (ptr_t * len(frames))(*[f.ctypes.data_as(ptr_t) for f in frames])
    lib.pack_frames(ptrs, out.ctypes.data_as(ptr_t), len(frames),
                    frames[0].nbytes)
    return out
