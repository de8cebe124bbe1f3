"""Build + load the native meshops library (ctypes, compiled on first use)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "meshops.cpp")
_LIB = os.path.join(_DIR, "libmeshops.so")
_lock = threading.Lock()
_lib = None


def _compile():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (compiling if needed) the meshops shared library; None on failure
    so callers can fall back to pure-numpy implementations."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _compile()
            lib = ctypes.CDLL(_LIB)
        except Exception as e:  # pragma: no cover
            print(f"[meshops] native build failed ({e}); using numpy fallback")
            return None

        from ctypes import (POINTER, c_float, c_int, c_int32, c_int64,
                            c_void_p)
        fp = POINTER(c_float)
        ip = POINTER(c_int32)

        lib.extract_isosurface.argtypes = [
            fp, c_int, c_int, c_int, c_float,
            POINTER(fp), POINTER(c_int64), POINTER(ip), POINTER(c_int64)]
        lib.extract_isosurface.restype = c_int
        lib.meshops_free.argtypes = [c_void_p]
        lib.vertex_normals_curvature.argtypes = [
            fp, c_int64, ip, c_int64, fp, fp]
        lib.vertex_normals_curvature.restype = c_int
        lib.cluster_remesh.argtypes = [
            fp, c_int64, ip, c_int64, c_float,
            POINTER(fp), POINTER(c_int64), POINTER(ip), POINTER(c_int64)]
        lib.cluster_remesh.restype = c_int
        lib.bvh_build.argtypes = [
            fp, c_int64, ip, c_int64, c_int,
            POINTER(fp), POINTER(ip), POINTER(ip), POINTER(c_int64),
            POINTER(ip)]
        lib.bvh_build.restype = c_int
        _lib = lib
        return _lib
