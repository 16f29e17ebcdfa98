"""Build/load the native host runtime (g++ -> .so, loaded via ctypes).

pybind11 is not available in this environment, so the native layer exposes a
plain C ABI and numpy arrays cross via ctypes pointers. Every native entry
point has a bit-identical pure-Python fallback, so the framework still works
when no compiler is present (`have_native()` is False then).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "bhrt_native.cpp")


def _build(so_path: str) -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-o", so_path, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Returns the loaded ctypes library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so_path = os.path.join(os.path.dirname(__file__), "_bhrt_native.so")
        src_mtime = os.path.getmtime(_SRC)
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < src_mtime:
            if not _build(so_path):
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.bhrt_png_unfilter.restype = ctypes.c_int
        lib.bhrt_png_unfilter.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.bhrt_bvh_build.restype = ctypes.c_int64
        lib.bhrt_bvh_build.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.bhrt_obj_load.restype = ctypes.c_void_p
        lib.bhrt_obj_load.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.bhrt_obj_fill.restype = ctypes.c_int
        lib.bhrt_obj_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 9
        lib.bhrt_obj_free.restype = None
        lib.bhrt_obj_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def have_native() -> bool:
    return get_lib() is not None
