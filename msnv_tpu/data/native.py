"""ctypes bindings for the native data-path library (native/msnv_data.cc).

Auto-builds `native/libmsnv_data.so` on first use if a compiler is present;
every entry point has a pure-python fallback (wavio / np.loadtxt /
ops.quantize) with bit-identical behavior, so the native library is a pure
speedup, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmsnv_data.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "msnv_data.cc")
    stale = (os.path.isfile(_SO_PATH) and os.path.isfile(src)
             and os.path.getmtime(src) > os.path.getmtime(_SO_PATH))
    if (not os.path.isfile(_SO_PATH) or stale) and os.path.isfile(
            os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # no compiler / build failure -> fallback
            print(f"msnv native build skipped: {e}", file=sys.stderr)
            return None
    if not os.path.isfile(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.msnv_read_wav.restype = ctypes.c_int
    lib.msnv_read_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
    lib.msnv_parse_floats.restype = ctypes.c_int
    lib.msnv_parse_floats.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
    lib.msnv_uquantize.restype = None
    lib.msnv_uquantize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    lib.msnv_free.restype = None
    lib.msnv_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_wav(path: str):
    """Native WAV decode; falls back to wavio.read_wav."""
    lib = _load()
    if lib is None:
        from msnv_tpu.data.wavio import read_wav as py_read
        return py_read(path)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.msnv_read_wav(path.encode(), ctypes.byref(out),
                           ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        raise IOError(f"msnv_read_wav({path}) failed: rc={rc}")
    arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    lib.msnv_free(out)
    return arr, int(sr.value)


def loadtxt(path: str) -> np.ndarray:
    """Native whitespace-float parser; np.loadtxt-shaped result
    (1-D for single-column files, 2-D otherwise)."""
    lib = _load()
    if lib is None:
        return np.loadtxt(path)
    out = ctypes.POINTER(ctypes.c_double)()
    n = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.msnv_parse_floats(path.encode(), ctypes.byref(out),
                               ctypes.byref(n), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"msnv_parse_floats({path}) failed: rc={rc}")
    arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    lib.msnv_free(out)
    c = int(cols.value)
    if c > 1:
        return arr.reshape(-1, c)
    return arr


def uquantize(x: np.ndarray, q_levels: int = 256) -> np.ndarray:
    """Native mu-law quantize; bit-identical to ops.quantize.uquantize."""
    lib = _load()
    if lib is None:
        from msnv_tpu.ops.quantize import uquantize as jq
        return np.asarray(jq(x.astype(np.float32), q_levels), np.int32)
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.shape, dtype=np.int32)
    lib.msnv_uquantize(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size,
        q_levels, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
