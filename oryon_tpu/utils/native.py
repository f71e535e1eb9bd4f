"""ctypes binding for the native host runtime (native/oryon_native.cpp).

Builds the shared library on first use (``make`` in native/); every entry
point has a numpy fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liboryon_native.so"))
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            # build into a process-unique dir then atomically rename:
            # concurrent first-use workers racing `make` on the same output
            # path could dlopen a half-written .so
            tmp_out = _LIB_PATH + f".build-{os.getpid()}"
            subprocess.run(["make", "-s", f"OUT={tmp_out}"],
                           cwd=os.path.abspath(_NATIVE_DIR),
                           check=True, capture_output=True, timeout=120)
            if not os.path.exists(_LIB_PATH):
                os.replace(tmp_out, _LIB_PATH)
            elif os.path.exists(tmp_out):
                os.remove(tmp_out)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_encode.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_void_p, ctypes.c_int]
        lib.rle_decode.restype = ctypes.c_int64
        lib.rle_decode.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_void_p, ctypes.c_int64]
        lib.resize_bilinear_u8.restype = None
        lib.resize_bilinear_u8.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 3 + [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.resize_nearest_u8.restype = None
        lib.resize_nearest_u8.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_void_p,
                                          ctypes.c_int, ctypes.c_int]
        _lib = lib
    except (OSError, subprocess.SubprocessError):
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def rle_encode(mask: np.ndarray) -> np.ndarray:
    """Binary mask -> int32 run lengths (first run counts zeros).
    Reference RLE codec semantics (utils/misc.py:16-42)."""
    flat = np.ascontiguousarray(mask.reshape(-1).astype(np.uint8))
    lib = _load()
    if lib is not None:
        runs = np.empty(flat.size + 1, np.int32)
        n = lib.rle_encode(flat.ctypes.data, flat.size, runs.ctypes.data,
                           runs.size)
        if n >= 0:
            return runs[:n].copy()
    # numpy fallback
    b = flat.astype(bool)
    changes = np.nonzero(np.diff(b.astype(np.int8)))[0] + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(bounds).astype(np.int32)
    if b.size and b[0]:
        runs = np.concatenate([[np.int32(0)], runs])
    return runs


def rle_decode(runs: np.ndarray, shape: Tuple[int, ...]) -> np.ndarray:
    n = int(np.prod(shape))
    runs = np.ascontiguousarray(runs.astype(np.int32))
    lib = _load()
    out = np.zeros(n, np.uint8)
    if lib is not None:
        lib.rle_decode(runs.ctypes.data, len(runs), out.ctypes.data, n)
        return out.reshape(shape)
    pos = 0
    val = 0
    for r in runs:
        out[pos: pos + r] = val
        pos += int(r)
        val = 1 - val
    return out.reshape(shape)


def resize_bilinear_u8(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """[H, W, C] uint8 bilinear resize (half-pixel), native fast path."""
    lib = _load()
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    oh, ow = out_hw
    if lib is not None:
        src = np.ascontiguousarray(img.reshape(h, w, c).astype(np.uint8))
        dst = np.empty((oh, ow, c), np.uint8)
        lib.resize_bilinear_u8(src.ctypes.data, h, w, c, dst.ctypes.data, oh, ow)
        return dst if img.ndim == 3 else dst[..., 0]
    from oryon_tpu.data.augment import resize_bilinear

    out = resize_bilinear(img.astype(np.float32), out_hw)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize_nearest_u8(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    lib = _load()
    h, w = img.shape[:2]
    oh, ow = out_hw
    # the C kernel is single-channel: interleaved multi-channel input would
    # be indexed as if planar (garbage output) — route 3D through numpy
    if lib is not None and img.ndim == 2:
        src = np.ascontiguousarray(img.astype(np.uint8))
        dst = np.empty((oh, ow), np.uint8)
        lib.resize_nearest_u8(src.ctypes.data, h, w, dst.ctypes.data, oh, ow)
        return dst
    from oryon_tpu.data.augment import resize_nearest

    return resize_nearest(img.astype(np.uint8), out_hw)
