"""Feature-extraction pipeline: video/text -> CLIP features -> npz.

Replaces run_on_video/video_extractor.py (vid2clip/txt2clip) and
data_utils.py's ClipFeatureExtractor with batched jitted encoders: the
reference pushes frames through the image tower one at a time
(video_extractor.py:58-63); here frames go through in fixed-size padded
batches so every step hits the MXU at full tile occupancy, and host decode
overlaps device compute for multi-video runs.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from univtg_tpu.extract.clip.model import CLIP, CLIPConfig
from univtg_tpu.extract.clip.tokenizer import tokenize
from univtg_tpu.extract.video import decode_frames


class ClipEncoder:
    """Batched, jitted CLIP encoders with padded fixed batch shapes."""

    def __init__(self, params, cfg: CLIPConfig, image_batch: int = 64, text_batch: int = 32):
        self.cfg = cfg
        self.params = params
        self.image_batch = image_batch
        self.text_batch = text_batch
        model = CLIP(cfg)
        self._encode_image = jax.jit(
            lambda p, x: model.apply(p, x, method=CLIP.encode_image)
        )

        def _encode_u8(p, raw):
            # /255 + CLIP mean/std on DEVICE: raw uint8 frames transfer 4x
            # fewer bytes than pre-normalized float32 (the serving path is
            # transfer-bound; docs/PERF.md "Serving latency")
            from univtg_tpu.extract.video import CLIP_MEAN, CLIP_STD

            x = raw.astype(jnp.float32) / 255.0
            x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
            return model.apply(p, x, method=CLIP.encode_image)

        self._encode_image_u8 = jax.jit(_encode_u8)
        self._encode_text = jax.jit(
            lambda p, t: model.apply(p, t, method=CLIP.encode_text)
        )

    def encode_images(self, frames: np.ndarray) -> np.ndarray:
        """(T, H, W, 3) frames -> (T, embed_dim) features.

        Accepts either pre-normalized float32 frames (preprocess_frames) or
        raw uint8 frames; uint8 is normalized on device and costs 4x less
        host->device bandwidth."""
        encode = (
            self._encode_image_u8 if frames.dtype == np.uint8 else self._encode_image
        )
        T = len(frames)
        B = self.image_batch
        out = []
        for i in range(0, T, B):
            chunk = frames[i : i + B]
            pad = B - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            feats = np.asarray(encode(self.params, jnp.asarray(chunk)))
            out.append(feats[: len(frames[i : i + B])])
        return np.concatenate(out) if out else np.zeros((0, self.cfg.embed_dim), np.float32)

    def encode_texts(self, texts: Sequence[str], max_valid_length: int = 32):
        """Texts -> list of (L_i, width) last_hidden_state arrays (valid
        positions only) + (N, embed_dim) pooled features."""
        tokens = tokenize(list(texts), self.cfg.context_length, max_valid_length)
        hidden, pooled = [], []
        B = self.text_batch
        for i in range(0, len(tokens), B):
            chunk = tokens[i : i + B]
            pad = B - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, tokens.shape[1]), np.int32)])
            out = self._encode_text(self.params, jnp.asarray(chunk))
            lh = np.asarray(out["last_hidden_state"])[: len(tokens[i : i + B])]
            po = np.asarray(out["pooler_output"])[: len(tokens[i : i + B])]
            for row, tok in zip(lh, tokens[i : i + B]):
                n_valid = int(np.argmax(tok)) + 1  # EOT position + 1
                hidden.append(row[:n_valid])
            pooled.append(po)
        return hidden, np.concatenate(pooled)


def vid2clip(encoder: ClipEncoder, video_path: str, save_dir: Optional[str] = None,
             clip_len: float = 2.0) -> np.ndarray:
    """Video file -> (T, embed_dim) clip features (video_extractor.py:19-77).

    Frames go to the device as raw uint8 (normalized on device) -- 4x fewer
    transfer bytes than host-normalized float32."""
    frames, _ = decode_frames(video_path, clip_len=clip_len)
    feats = encoder.encode_images(frames)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        np.savez(os.path.join(save_dir, "vid.npz"), features=feats)
    return feats


def txt2clip(encoder: ClipEncoder, text: str, save_dir: Optional[str] = None) -> np.ndarray:
    """Query -> (L, width) token features (video_extractor.py:79-87)."""
    hidden, _ = encoder.encode_texts([text])
    feats = hidden[0]
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        np.savez(os.path.join(save_dir, "txt.npz"), features=feats)
    return feats


def extract_query_features(
    encoder: ClipEncoder, rows: List[dict], out_dir: str, max_valid_length: int = 32
):
    """Offline per-dataset query dump: jsonl rows -> {qid}.npz[last_hidden_state]
    (run_on_video/text_extractor.py:11-36)."""
    os.makedirs(out_dir, exist_ok=True)
    hidden, _ = encoder.encode_texts([r["query"] for r in rows], max_valid_length)
    for row, h in zip(rows, hidden):
        np.savez(os.path.join(out_dir, f"{row['qid']}.npz"), last_hidden_state=h)
