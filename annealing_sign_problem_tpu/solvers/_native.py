"""ctypes loader for the native host solvers (cbits/solvers.cpp).

Compiles on first use with g++ and caches the shared object next to the
sources. Falls back to ``None`` (callers use numpy paths) when no compiler
is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np
from numpy.ctypeslib import ndpointer

from ..utils.log import logger

_lock = threading.Lock()
_lib = None
_tried = False

_CBITS = os.path.join(os.path.dirname(__file__), "..", "..", "cbits")


def _compile(src: str, out: str) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", out, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native solver build failed ({}); using numpy fallbacks", e)
        return False


def library():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.abspath(os.path.join(_CBITS, "solvers.cpp"))
        if not os.path.exists(src):
            return None
        so = os.path.join(os.path.dirname(src), "libaspsolvers.so")
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            if not _compile(src, so):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            logger.warning("failed to load native solvers ({})", e)
            return None

        i64p = ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64p = ndpointer(np.float64, flags="C_CONTIGUOUS")

        lib.greedy_coloring.restype = ctypes.c_int32
        lib.greedy_coloring.argtypes = [ctypes.c_int64, i64p, i32p, i32p]

        lib.greedy_solve.restype = ctypes.c_int64
        lib.greedy_solve.argtypes = [ctypes.c_int64, i64p, i32p, f64p, f64p, f64p]

        lib.anneal_chain.restype = ctypes.c_int64
        lib.anneal_chain.argtypes = [
            ctypes.c_int64, i64p, i32p, f64p, f64p,
            ctypes.c_double, ctypes.c_double, ctypes.c_int64,
            ctypes.c_uint64, f64p,
        ]
        _lib = lib
        return _lib
