"""Python surface for the native batch .npz feature reader.

`read_npz_batch(paths)` decodes many per-id feature archives in one ctypes
call: the C++ side (native/src/feature_reader.cpp) parses the zip, inflates
the DEFLATE stream, parses the npy header, converts f2/f8 to f32 and fuses
the row L2 normalization — all with the GIL released and an internal thread
pool. Files the native path can't handle (zip64, >2-D, exotic dtypes,
corruption) come back as None per-slot and the caller falls back to
np.load, so behavior is a strict superset of the numpy path.

Reference semantics being accelerated: np.load(...)[key].astype(float32)
followed by l2_normalize (main/dataset.py:680-696,
utils/basic_utils.py:97-99).
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

from univtg_tpu.native.build import load_feature_reader


def native_io_enabled() -> bool:
    """Native feature IO is opt-in (UNIVTG_NATIVE_IO=1): its L2 norm
    accumulates in float64 like numpy's but may differ from np.linalg.norm
    in the last ulp, so the default path stays bit-identical to numpy."""
    return os.environ.get("UNIVTG_NATIVE_IO", "0") == "1"


def read_npz_batch(
    paths: Sequence[str],
    key: str = "features",
    normalize: bool = True,
    n_threads: int = 8,
) -> Optional[List[Optional[np.ndarray]]]:
    """Read many .npz feature files natively.

    Returns a list aligned with `paths`: float32 (rows, cols) arrays or
    None for any file the native reader rejects (non-2-D, zip64, exotic
    dtype, corruption). Returns None wholesale when the native library is
    unavailable (caller uses its numpy path).
    """
    lib = load_feature_reader()
    if lib is None or not paths:
        return None if lib is None else []
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    out_ptrs = (ctypes.POINTER(ctypes.c_float) * n)()
    out_rows = (ctypes.c_int64 * n)()
    out_cols = (ctypes.c_int64 * n)()
    lib.read_npz_batch(
        c_paths,
        n,
        key.encode(),
        1 if normalize else 0,
        out_ptrs,
        out_rows,
        out_cols,
        n_threads,
    )
    results: List[Optional[np.ndarray]] = []
    try:
        for i in range(n):
            rows = out_rows[i]
            if rows < 0 or not out_ptrs[i]:
                results.append(None)
                continue
            cols = out_cols[i]
            buf = np.ctypeslib.as_array(out_ptrs[i], shape=(int(rows), int(cols)))
            results.append(np.array(buf, dtype=np.float32))  # own the memory
    finally:
        lib.free_feature_buffers(out_ptrs, n)
    return results


def read_npz(
    path: str, key: str = "features", normalize: bool = True
) -> Optional[np.ndarray]:
    """Single-file native read; None when unavailable or rejected."""
    out = read_npz_batch([path], key=key, normalize=normalize, n_threads=1)
    if not out:
        return None
    return out[0]
