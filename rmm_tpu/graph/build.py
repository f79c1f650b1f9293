"""Build/load the native graph engine (ctypes, no pybind11 in image)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "graph_engine.cpp")
_LIBDIR = os.path.join(os.path.dirname(__file__), "_lib")
_LIBPATH = os.path.join(_LIBDIR, "librmmgraph.so")
_lock = threading.Lock()
_lib = None


def _compile() -> None:
    os.makedirs(_LIBDIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        _SRC, "-o", _LIBPATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> ctypes.CDLL | None:
    """Load (compiling if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_LIBPATH)
                    or os.path.getmtime(_LIBPATH) < os.path.getmtime(_SRC)):
                _compile()
            lib = ctypes.CDLL(_LIBPATH)
        except (OSError, subprocess.CalledProcessError):
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.rmm_graph_create.restype = ctypes.c_void_p
        lib.rmm_graph_create.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                         ctypes.c_int64]
        lib.rmm_graph_destroy.argtypes = [ctypes.c_void_p]
        lib.rmm_graph_num_edges.restype = ctypes.c_int64
        lib.rmm_graph_num_edges.argtypes = [ctypes.c_void_p]
        lib.rmm_in_degrees.argtypes = [ctypes.c_void_p, i64p]
        common = [ctypes.c_void_p, i64p, i64p, i64p, ctypes.c_int64, i64p,
                  ctypes.c_int32, ctypes.c_uint64, ctypes.c_int32,
                  ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p, i64p,
                  i64p]
        lib.rmm_sample_from_edges.restype = ctypes.c_int64
        lib.rmm_sample_from_edges.argtypes = common
        lib.rmm_sample_from_nodes.restype = ctypes.c_int64
        lib.rmm_sample_from_nodes.argtypes = [
            ctypes.c_void_p, i64p, ctypes.c_int64, i64p, ctypes.c_int32,
            ctypes.c_uint64, ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, i64p, i64p, i64p,
        ]
        lib.rmm_negative_sample.argtypes = [
            i64p, i64p, ctypes.c_int64, i64p, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, i64p, i64p,
        ]
        dp = ctypes.POINTER(ctypes.c_double)
        lib.rmm_ports.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                  ctypes.c_int64, dp, dp]
        _lib = lib
        return _lib
