"""Lazy build + ctypes loader for the native kernels.

g++ compiles src/*.cpp into a cached shared library on first use; callers
degrade to the numpy implementations when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "src", "ap_kernel.cpp")
_LIB = os.path.join(_DIR, "libunivtg_ap.so")
_lock = threading.Lock()
_cached: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        _SRC,
        "-o",
        _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def load_ap_kernel() -> Optional[ctypes.CDLL]:
    """Returns the loaded library or None (numpy fallback)."""
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed:
        return None
    with _lock:
        if _cached is not None or _failed:
            return _cached
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        lib.detection_ap_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # gt
            ctypes.POINTER(ctypes.c_int64),  # gt_off
            ctypes.POINTER(ctypes.c_double),  # pred
            ctypes.POINTER(ctypes.c_double),  # scores
            ctypes.POINTER(ctypes.c_int64),  # pred_off
            ctypes.c_int64,  # n_queries
            ctypes.POINTER(ctypes.c_double),  # thds
            ctypes.c_int64,  # n_thds
            ctypes.c_int64,  # n_threads
            ctypes.POINTER(ctypes.c_double),  # out
        ]
        lib.detection_ap_batch.restype = None
        _cached = lib
        return _cached
