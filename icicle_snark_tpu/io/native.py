"""ctypes binding for the native zkey ingest path (native/zkey_native.cc).

Auto-builds the shared library on first use (g++ is baked into the
image); every entry point degrades to the numpy implementation when the
toolchain or build is unavailable, and the test suite compares the two.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libzkey_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.zkey_open.restype = ctypes.c_void_p
        lib.zkey_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.zkey_close.argtypes = [ctypes.c_void_p]
        lib.zkey_section.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.zkey_section.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint64)
        ]
        lib.zkey_decode_plan.restype = ctypes.c_int64
        lib.zkey_decode_plan.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
            ctypes.c_uint32, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_plan(zkey_path: str, n8r: int, domain_size: int):
    """Native section-4 decode + plan sort.

    Returns (s_sorted u32 (n,), slot_sorted i64 (n,),
             coef_sorted u32 (n, n8r/4)) or None if unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    h = lib.zkey_open(zkey_path.encode(), b"zkey")
    if not h:
        return None
    try:
        size = ctypes.c_uint64()
        sec = lib.zkey_section(h, 4, ctypes.byref(size))
        if not sec or size.value < 4:
            return None
        n = (size.value - 4) // (12 + n8r)
        words = n8r // 4
        s_sorted = np.empty(n, np.uint32)
        slot_sorted = np.empty(n, np.int64)
        coef_sorted = np.empty((n, words), np.uint32)
        got = lib.zkey_decode_plan(
            sec, size.value, n8r, domain_size,
            s_sorted.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            slot_sorted.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            coef_sorted.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        if got != n:
            return None
        return s_sorted, slot_sorted, coef_sorted
    finally:
        lib.zkey_close(h)
