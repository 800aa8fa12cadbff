"""Lazy build + ctypes loader for the native kernels.

g++ compiles each src/*.cpp into a cached shared library on first use;
callers degrade to the numpy implementations when no toolchain is
available. One library per source file keeps rebuilds incremental and a
broken kernel from taking down the others.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Dict, Optional

_DIR = os.path.dirname(__file__)
_lock = threading.Lock()
_cached: Dict[str, Optional[ctypes.CDLL]] = {}


def _build(src: str, lib: str, extra_flags=()) -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        src,
        "-o",
        lib,
        *extra_flags,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load(
    src_name: str,
    lib_name: str,
    configure: Callable[[ctypes.CDLL], None],
    extra_flags=(),
) -> Optional[ctypes.CDLL]:
    """Build-if-stale then dlopen + signature-configure; memoized. Returns
    None (numpy fallback) when the toolchain or dlopen fails."""
    if lib_name in _cached:
        return _cached[lib_name]
    with _lock:
        if lib_name in _cached:
            return _cached[lib_name]
        src = os.path.join(_DIR, "src", src_name)
        lib_path = os.path.join(_DIR, lib_name)
        lib: Optional[ctypes.CDLL] = None
        stale = not os.path.exists(lib_path) or os.path.getmtime(
            lib_path
        ) < os.path.getmtime(src)
        if not stale or _build(src, lib_path, extra_flags):
            try:
                lib = ctypes.CDLL(lib_path)
                configure(lib)
            except (OSError, AttributeError):
                lib = None
        _cached[lib_name] = lib
        return lib


def _configure_ap(lib: ctypes.CDLL) -> None:
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


def load_ap_kernel() -> Optional[ctypes.CDLL]:
    """Returns the loaded AP library or None (numpy fallback)."""
    return _load("ap_kernel.cpp", "libunivtg_ap.so", _configure_ap)


def _configure_reader(lib: ctypes.CDLL) -> None:
    lib.read_npz_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),  # paths
        ctypes.c_int64,  # n
        ctypes.c_char_p,  # key
        ctypes.c_int32,  # normalize
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),  # out_ptrs
        ctypes.POINTER(ctypes.c_int64),  # out_rows (or -errcode)
        ctypes.POINTER(ctypes.c_int64),  # out_cols
        ctypes.c_int64,  # n_threads
    ]
    lib.read_npz_batch.restype = None
    lib.free_feature_buffers.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64,
    ]
    lib.free_feature_buffers.restype = None


def load_feature_reader() -> Optional[ctypes.CDLL]:
    """Returns the loaded npz feature-reader library or None."""
    return _load(
        "feature_reader.cpp", "libunivtg_reader.so", _configure_reader, ("-lz",)
    )
