"""Native (C++) runtime components, loaded via ctypes.

Compiled on demand with g++ (no pybind11 in the image); every native entry
point has a pure-Python fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _compile(src: str, out: str) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", out, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception as e:  # noqa: BLE001 — any toolchain failure = fallback
        print(f"[fovtix native] compile failed: {e}", file=sys.stderr)
        return False


def load_library():
    """Compile (once) and load the native library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_DIR, "bvh_builder.cpp")
        so = os.path.join(_DIR, "libfovtix_native.so")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            if not _compile(src, so):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            print(f"[fovtix native] load failed: {e}", file=sys.stderr)
            return None
        lib.fovtix_build_bvhw.restype = ctypes.c_int
        lib.fovtix_build_bvhw.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # tris
            ctypes.c_int64,  # T
            ctypes.c_int,  # leaf_size
            ctypes.c_int,  # arity
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),  # boxes
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),  # meta
            ctypes.POINTER(ctypes.c_int64),  # num_nodes
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),  # tri_perm
            ctypes.POINTER(ctypes.c_int64),  # num_slots
        ]
        lib.fovtix_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB
