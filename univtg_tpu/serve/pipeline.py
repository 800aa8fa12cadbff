"""Serving: single jitted grounding core shared by the CLI demo, batch
evaluation, and end-to-end video+query grounding.

Mirrors the reference's gradio path (main_gradio.py:58-115): L2-normalized
features + TEF + timestamp grid -> model forward -> top-1/top-5 windows
ranked by foreground confidence + argmax highlight. Feature lengths are
padded to a static bucket ladder so any video length reuses one of a few
compiled programs.
"""
from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from univtg_tpu.core.padding import bucket_length, default_buckets
from univtg_tpu.data.features import l2_normalize
from univtg_tpu.data.mr import tef_features, timestamp_grid
from univtg_tpu.models import ModelConfig, UniVTG


def hms(seconds: float) -> str:
    return time.strftime("%H:%M:%S", time.gmtime(seconds))


class PreparedVideo:
    """Bucket-padded video tensors, ready to batch into a forward pass.
    Prepared once per video and reused across every query that targets it
    (the host-side L2-norm + TEF + padding dominates per-request cost for
    long videos)."""

    __slots__ = ("vid", "vid_mask", "ts", "ctx_l", "bucket")

    def __init__(self, vid, vid_mask, ts, ctx_l, bucket):
        self.vid = vid
        self.vid_mask = vid_mask
        self.ts = ts
        self.ctx_l = ctx_l
        self.bucket = bucket


class GroundingPipeline:
    def __init__(
        self,
        cfg: ModelConfig,
        params,
        clip_len: float = 2.0,
        buckets: Optional[Sequence[int]] = None,
        clip_encoder=None,
        eval_mode: Optional[str] = None,
        param_dtype: Optional[str] = None,
    ):
        """eval_mode=None matches the reference demo (raw saliency,
        main_gradio.py:103); 'add' matches the batch evaluator's fused
        saliency+fg ranking (inference_mr.py:124-131).

        param_dtype='bfloat16' casts the float weights once at construction:
        halves weight HBM at rest (173 -> 87 MB for the flagship) at
        bf16-class accuracy — the class the MXU computes in anyway under
        compute_dtype='bfloat16'. Measured latency at serving shapes is
        unchanged (the forward is FLOP-bound from B=4 up and XLA hoists the
        weight cast out of hot loops; docs/PERF.md "Serving param dtype").
        Use it to pack more models/videos per chip. None keeps checkpoint
        precision."""
        self.param_dtype = param_dtype
        params = self._cast_param_dtype(params, param_dtype)
        self.cfg = cfg
        self.params = params
        self.clip_len = clip_len
        self.buckets = list(buckets or default_buckets(2048, base=128))
        self.clip_encoder = clip_encoder  # optional ClipEncoder for raw video
        self.eval_mode = eval_mode
        model = UniVTG(cfg)
        # ONE decode implementation shared with the batch evaluator
        # (train/steps.decode_dense_outputs, incl. the fp16 saliency parity
        # cast) -- serve and eval cannot drift (tests/test_serve.py::
        # test_serve_decode_equals_batch_eval_decode)
        from univtg_tpu.train.steps import decode_dense_outputs

        def fwd(params, txt, txt_mask, vid, vid_mask, timestamp):
            out = model.apply({"params": params}, txt, txt_mask, vid, vid_mask, train=False)
            return decode_dense_outputs(out, vid_mask, timestamp, eval_mode)

        self._fwd = jax.jit(fwd)

    @staticmethod
    def _cast_param_dtype(params, param_dtype):
        if param_dtype is None:
            return params
        dt = jnp.dtype(param_dtype)
        # jnp.issubdtype, not np: ml_dtypes bfloat16 is not an np float
        # subtype, and a bf16 tree must still upcast to float32
        return jax.tree_util.tree_map(
            lambda l: l.astype(dt)
            if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating) else l,
            params,
        )

    def swap_params(self, params):
        """Hot-swap the serving weights without restarting or recompiling.

        Applies the same param_dtype cast the constructor did, then
        validates tree structure, leaf shapes, AND leaf dtypes against the
        currently-served params, so the existing jitted programs stay valid
        — the swap is one Python attribute assignment, atomic under the
        GIL; requests dispatched after it use the new weights, requests
        already in flight finish on the old ones. Raises ValueError on any
        mismatch and leaves the served params untouched."""
        params = self._cast_param_dtype(params, self.param_dtype)
        old_flat, old_def = jax.tree_util.tree_flatten(self.params)
        new_flat, new_def = jax.tree_util.tree_flatten(params)
        if old_def != new_def:
            raise ValueError(
                f"checkpoint param tree does not match the served model: "
                f"{new_def} vs {old_def}"
            )
        for o, n in zip(old_flat, new_flat):
            # metadata-only comparison: numpy and jax leaves both expose
            # .shape/.dtype -- never jnp.asarray here (it would device-put
            # ~2x the full model per reload just to read metadata)
            o_shape, n_shape = np.shape(o), np.shape(n)
            o_dt = getattr(o, "dtype", None) or np.asarray(o).dtype
            n_dt = getattr(n, "dtype", None) or np.asarray(n).dtype
            if o_shape != n_shape or o_dt != n_dt:
                raise ValueError(
                    f"checkpoint leaf mismatch: got {n_shape}/{n_dt}, "
                    f"serving {o_shape}/{o_dt}"
                )
        self.params = params

    def prepare_video(self, vid_feats: np.ndarray) -> PreparedVideo:
        """(T, Dv) clip features -> bucket-padded tensors. Servers cache the
        result per video id and pass it to ground_prepared_many."""
        vid = l2_normalize(np.asarray(vid_feats, np.float32))
        if len(vid) > self.buckets[-1]:
            # bucket_length truncates overlong inputs to the top bucket;
            # actually drop the tail clips so the pad below stays >= 0
            vid = vid[: self.buckets[-1]]
        ctx_l = len(vid)
        ts = timestamp_grid(ctx_l, self.clip_len)
        vid = np.concatenate([vid, tef_features(ctx_l)], axis=1)

        Lb = bucket_length(ctx_l, self.buckets)
        pad = Lb - ctx_l
        vid = np.pad(vid, ((0, pad), (0, 0)))
        ts = np.pad(ts, ((0, pad), (0, 0)))
        vid_mask = np.zeros(Lb, np.float32)
        vid_mask[:ctx_l] = 1
        return PreparedVideo(vid, vid_mask, ts, ctx_l, Lb)

    def _prepare_txt(self, txt_feats: np.ndarray):
        txt = l2_normalize(np.asarray(txt_feats, np.float32))
        Lt = bucket_length(len(txt), [32, 77])
        mask = np.zeros(Lt, np.float32)
        mask[: len(txt)] = 1
        txt = np.pad(txt, ((0, Lt - len(txt)), (0, 0)))
        return txt, mask

    def ground_features(self, vid_feats: np.ndarray, txt_feats: np.ndarray, top_k: int = 5):
        """(T, Dv) clip features + (L, Dt) token features -> grounding dict."""
        return self.ground_features_many(vid_feats, [txt_feats], top_k)[0]

    def _decode_row(self, scores, spans, saliency, ctx_l: int, top_k: int):
        scores = scores[:ctx_l]
        duration = ctx_l * self.clip_len
        # clamp like the batch-eval path (main/inference_mr.py:153); the
        # reference demo skips this and can emit negative timestamps
        spans = np.clip(spans[:ctx_l] * duration, 0, duration)
        saliency = saliency[:ctx_l]
        order = np.argsort(-scores, kind="stable")[:top_k]
        windows = [[float(spans[i, 0]), float(spans[i, 1]), float(scores[i])] for i in order]
        return {
            "top1_window": windows[0][:2],
            "topk_windows": windows,
            "saliency": saliency,
            "top1_highlight": float(np.argmax(saliency) * self.clip_len),
            "duration": duration,
        }

    def ground_features_many(
        self, vid_feats: np.ndarray, txt_feats_list: Sequence[np.ndarray], top_k: int = 5
    ):
        """Batch-serve N queries against ONE video. The video is prepared
        once and tiled over the batch dim; queries group by text bucket
        (32/77), and the batch dim pads to a power-of-two ladder so a
        server sees a handful of compiled programs, not one per request
        size. Returns one grounding dict per query (identical to
        ground_features per query, tests/test_serve.py)."""
        if len(txt_feats_list) == 0:
            return []
        # video prep is query-independent: do it once (it dominates host
        # cost for long videos)
        pv = self.prepare_video(vid_feats)
        return self.ground_prepared_many([(pv, t) for t in txt_feats_list], top_k)

    def ground_prepared_many(
        self,
        items: Sequence[tuple],
        top_k: int = 5,
    ):
        """Cross-video batched serving: items are (PreparedVideo, txt_feats)
        pairs from possibly MANY different videos. Requests group by
        (video bucket, text bucket) and each group runs as ONE device
        dispatch with the batch dim padded to a power-of-two ladder, so a
        busy server amortizes dispatch overhead across concurrent requests
        regardless of which videos they target. Per-request results are
        identical to ground_features (tests/test_server.py)."""
        N = len(items)
        results: list = [None] * N
        groups: dict = {}
        for i, (pv, t) in enumerate(items):
            txt, mask = self._prepare_txt(t)
            groups.setdefault((pv.bucket, txt.shape[0]), []).append((i, pv, txt, mask))
        for group in groups.values():
            n = len(group)
            nb = 1 << (n - 1).bit_length()  # pad batch to the pow-2 ladder
            pad = [group[-1]] * (nb - n)
            txt = np.stack([g[2] for g in group + pad])
            txt_mask = np.stack([g[3] for g in group + pad])
            pvs = [g[1] for g in group + pad]
            if all(p is pvs[0] for p in pvs):
                # single-video fast path: tile without host copies (a long
                # video row is ~20 MB; N queries must not multiply that)
                pv0 = pvs[0]
                vid = np.broadcast_to(pv0.vid, (nb,) + pv0.vid.shape)
                vid_mask = np.broadcast_to(pv0.vid_mask, (nb,) + pv0.vid_mask.shape)
                ts = np.broadcast_to(pv0.ts, (nb,) + pv0.ts.shape)
            else:
                vid = np.stack([p.vid for p in pvs])
                vid_mask = np.stack([p.vid_mask for p in pvs])
                ts = np.stack([p.ts for p in pvs])
            out = self._fwd(
                self.params,
                jnp.asarray(txt),
                jnp.asarray(txt_mask),
                jnp.asarray(vid),
                jnp.asarray(vid_mask),
                jnp.asarray(ts),
            )
            scores_all = np.asarray(out["scores"])
            spans_all = np.asarray(out["spans"])
            sal_all = np.asarray(out["saliency"])
            for row, (i, pv, _, _) in enumerate(group):
                results[i] = self._decode_row(
                    scores_all[row], spans_all[row], sal_all[row], pv.ctx_l, top_k
                )
        return results

    def ground_video(self, video_path: str, query: str, top_k: int = 5):
        """Raw video + text query -> grounding (requires a clip_encoder)."""
        assert self.clip_encoder is not None, "construct with clip_encoder"
        from univtg_tpu.extract.pipeline import txt2clip, vid2clip

        vid_feats = vid2clip(self.clip_encoder, video_path, clip_len=self.clip_len)
        txt_feats = txt2clip(self.clip_encoder, query)
        return self.ground_features(vid_feats, txt_feats, top_k)

    def describe(self, result: dict, query: str) -> str:
        """Human-readable response (main_gradio.py:103-115)."""
        mr = " - ".join(hms(int(t)) for t in result["top1_window"])
        return "\n".join(
            [
                f"For query: {query}",
                f"The Top-1 interval is: {mr}",
                f"The Top-1 highlight is: {hms(result['top1_highlight'])}",
            ]
        )
