"""Weight-only int8 quantization for serving.

Per-output-channel symmetric int8 for every 2-D+ kernel in a param pytree:
4x smaller checkpoints / HBM-at-rest, with dequantization either at load
time (storage tier) or inside a Pallas fused dequant-matmul
(univtg_tpu/ops/pallas_int8.py) for bandwidth-bound serving.

Biases, LayerNorm scales, and embeddings stay f32 (negligible size, high
sensitivity).
"""
from __future__ import annotations

from typing import Tuple

import jax
import numpy as np


def _is_quantizable(path: str, leaf) -> bool:
    arr = np.asarray(leaf)
    if arr.ndim < 2 or arr.dtype not in (np.float32, np.float64):
        return False
    lower = path.lower()
    if "norm" in lower or "embedding" in lower or "bias" in lower:
        return False
    return True


def _path_str(path) -> str:
    return "/".join(p.key if hasattr(p, "key") else str(p) for p in path)


def quantize_params(params) -> Tuple[dict, dict]:
    """Params pytree -> (int8/other pytree, {path: scales}).

    Scales are per-output-channel (last axis) symmetric: W ~= q * scale.
    """
    scales = {}

    def quantize(path, leaf):
        path = _path_str(path)
        if not _is_quantizable(path, leaf):
            return leaf
        w = np.asarray(leaf, np.float32)
        amax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        scales[path] = scale
        return q

    return jax.tree_util.tree_map_with_path(quantize, params), scales


def dequantize_params(qparams, scales) -> dict:
    """Inverse of quantize_params (storage-tier load path)."""

    def dequantize(path, leaf):
        path = _path_str(path)
        if path not in scales:
            return leaf
        return (np.asarray(leaf, np.float32) * scales[path]).astype(np.float32)

    return jax.tree_util.tree_map_with_path(dequantize, qparams)


def save_quantized(path: str, params):
    """Serialize an int8 checkpoint ({'q': pytree, 'scales': dict})."""
    from flax import serialization

    q, scales = quantize_params(jax.tree_util.tree_map(np.asarray, params))
    blob = {"q": q, "scales": scales}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))


def load_quantized(path: str) -> dict:
    from flax import serialization

    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    return dequantize_params(blob["q"], blob["scales"])


def restore_serving_params(path: str, params_template):
    """Serving-side checkpoint loader: accepts EITHER a float training
    checkpoint (the {params, opt_state, ...} blob train/checkpoint.py
    writes) OR an int8 serving checkpoint from save_quantized — detected by
    the blob's keys, so `cli serve`/`cli ground --resume` work with both
    without a flag."""
    from flax import serialization

    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    host_template = jax.tree_util.tree_map(np.asarray, params_template)
    if isinstance(blob, dict) and set(blob.keys()) == {"q", "scales"}:
        restored = dequantize_params(blob["q"], blob["scales"])
    else:  # float training blob: {params, opt_state, ...} or bare params
        restored = blob.get("params", blob) if isinstance(blob, dict) else blob
    return serialization.from_state_dict(host_template, restored)
