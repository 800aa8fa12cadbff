"""Moment-DETR baseline: query-based DETR-style moment localization.

Selectable alongside the dense-regression UniVTG model (the reference's
--model_id moment_detr; model/moment_detr.py + model/transformer.py).
Architecture: shared input projectors -> encoder over [vid; txt] -> decoder
with `num_queries` learnable slots -> per-query 2-class head + cxw span MLP,
plus a linear saliency head over the encoder's video memory.

Vanilla DETR layers here use residual dropout (not droppath) and relu FFNs
(model/transformer.py:211-268).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from univtg_tpu.core.spans import cxw_to_xx, giou_cross, giou_paired
from univtg_tpu.models.config import ModelConfig
from univtg_tpu.models.layers import LN_EPS, InputProj, MLP
from univtg_tpu.models.positional import TrainableTextPos, sine_position_from_mask
from univtg_tpu.ops.attention import multihead_attention


@dataclasses.dataclass(frozen=True)
class MomentDETRConfig(ModelConfig):
    num_queries: int = 10
    num_decoder_layers: int = 2
    aux_loss: bool = True
    contrastive_align: bool = False
    contrastive_hdim: int = 64


class _MHA(nn.Module):
    dim: int
    num_heads: int
    dropout: float

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask, *, train: bool):
        in_proj_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (self.dim, 3 * self.dim)
        )
        in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * self.dim,))
        out_kernel = self.param(
            "out_kernel", nn.initializers.xavier_uniform(), (self.dim, self.dim)
        )
        out_bias = self.param("out_bias", nn.initializers.zeros, (self.dim,))
        rng = self.make_rng("dropout") if train and self.dropout > 0 else None
        return multihead_attention(
            q,
            k,
            v,
            in_proj_kernel=in_proj_kernel,
            in_proj_bias=in_proj_bias,
            out_kernel=out_kernel,
            out_bias=out_bias,
            num_heads=self.num_heads,
            key_padding_mask=key_padding_mask,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=rng,
        )


class DETREncoderLayer(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, mask, pos, *, train: bool):
        drop = lambda h: nn.Dropout(self.dropout, deterministic=not train)(h)
        qk = x + pos
        attn = _MHA(self.dim, self.num_heads, self.dropout, name="self_attn")(
            qk, qk, x, mask, train=train
        )
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x + drop(attn))
        h = nn.relu(nn.Dense(self.ffn_dim, name="linear1")(x))
        h = nn.Dense(self.dim, name="linear2")(drop(h))
        return nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x + drop(h))


class DETRDecoderLayer(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    dropout: float

    @nn.compact
    def __call__(self, tgt, memory, memory_mask, pos, query_pos, *, train: bool):
        drop = lambda h: nn.Dropout(self.dropout, deterministic=not train)(h)
        qk = tgt + query_pos
        sa = _MHA(self.dim, self.num_heads, self.dropout, name="self_attn")(
            qk, qk, tgt, None, train=train
        )
        tgt = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(tgt + drop(sa))
        ca = _MHA(self.dim, self.num_heads, self.dropout, name="cross_attn")(
            tgt + query_pos, memory + pos, memory, memory_mask, train=train
        )
        tgt = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(tgt + drop(ca))
        h = nn.relu(nn.Dense(self.ffn_dim, name="linear1")(tgt))
        h = nn.Dense(self.dim, name="linear2")(drop(h))
        return nn.LayerNorm(epsilon=LN_EPS, name="norm3")(tgt + drop(h))


class MomentDETR(nn.Module):
    cfg: MomentDETRConfig

    @nn.compact
    def __call__(self, src_txt, src_txt_mask, src_vid, src_vid_mask, *, train=False):
        cfg = self.cfg
        vid = InputProj(cfg.hidden_dim, cfg.n_input_proj, cfg.input_dropout, name="input_vid_proj")(
            src_vid, train=train
        )
        txt = InputProj(cfg.hidden_dim, cfg.n_input_proj, cfg.input_dropout, name="input_txt_proj")(
            src_txt, train=train
        )
        src = jnp.concatenate([vid, txt], axis=1)
        mask = jnp.concatenate([src_vid_mask, src_txt_mask], axis=1)
        pos_vid = sine_position_from_mask(src_vid_mask, cfg.hidden_dim)
        if cfg.use_txt_pos:
            pos_txt = TrainableTextPos(cfg.max_q_l, cfg.hidden_dim, cfg.input_dropout, name="txt_pos")(
                txt, train=train
            )
        else:
            pos_txt = jnp.zeros_like(txt)
        pos = jnp.concatenate([pos_vid, pos_txt], axis=1)

        memory = src
        for i in range(cfg.num_layers):
            memory = DETREncoderLayer(
                cfg.hidden_dim, cfg.num_heads, cfg.ffn_dim, cfg.dropout,
                name=f"encoder_layers_{i}",
            )(memory, mask, pos, train=train)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (cfg.num_queries, cfg.hidden_dim)
        )
        B = src.shape[0]
        query_pos = jnp.tile(query_embed[None], (B, 1, 1))
        tgt = jnp.zeros_like(query_pos)
        hs = []
        final_norm = nn.LayerNorm(epsilon=LN_EPS, name="decoder_norm")
        for i in range(cfg.num_decoder_layers):
            tgt = DETRDecoderLayer(
                cfg.hidden_dim, cfg.num_heads, cfg.ffn_dim, cfg.dropout,
                name=f"decoder_layers_{i}",
            )(tgt, memory, mask, pos, query_pos, train=train)
            hs.append(final_norm(tgt))
        hs = jnp.stack(hs)  # (#layers, B, Q, D)

        class_head = nn.Dense(2, name="class_embed")
        span_head = MLP(cfg.hidden_dim, 2 if cfg.span_loss_type == "l1" else cfg.max_v_l * 2,
                        3, name="span_embed")
        outputs_class = class_head(hs)
        outputs_coord = span_head(hs)
        if cfg.span_loss_type == "l1":
            outputs_coord = nn.sigmoid(outputs_coord)

        vid_mem = memory[:, : vid.shape[1]]
        out = {
            "pred_logits": outputs_class[-1],  # (B, Q, 2) raw logits
            "pred_spans": outputs_coord[-1],  # (B, Q, 2) normalized cxw
            "saliency_scores": nn.Dense(1, name="saliency_proj")(vid_mem)[..., 0],
        }
        if cfg.contrastive_align:
            nrm = lambda x: x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
            )
            out["proj_queries"] = nrm(
                nn.Dense(cfg.contrastive_hdim, name="ca_query")(hs)
            )[-1]
            out["proj_txt_mem"] = nrm(
                nn.Dense(cfg.contrastive_hdim, name="ca_txt")(memory[:, vid.shape[1]:])
            )
            out["proj_vid_mem"] = nrm(
                nn.Dense(cfg.contrastive_hdim, name="ca_vid")(vid_mem)
            )
        if cfg.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": a, "pred_spans": b}
                for a, b in zip(outputs_class[:-1], outputs_coord[:-1])
            ]
        return out


# ---------------------------------------------------------------------------
# Hungarian matching + losses (static shapes, host-callback LSAP)
# ---------------------------------------------------------------------------


def _lsap_host(cost: np.ndarray, n_tgt: np.ndarray) -> np.ndarray:
    """Batched LSAP on host. cost (B, Q, Wmax); n_tgt (B,) valid targets.
    Returns (B, Wmax) int32: assigned query index per target (-1 = padding)."""
    from scipy.optimize import linear_sum_assignment

    B, Q, W = cost.shape
    out = np.full((B, W), -1, np.int32)
    for b in range(B):
        n = int(n_tgt[b])
        if n == 0:
            continue
        rows, cols = linear_sum_assignment(cost[b, :, :n])
        for r, c in zip(rows, cols):
            out[b, c] = r
    return out


import functools


@functools.lru_cache(maxsize=8)
def _perm_table(num_queries: int, num_targets: int) -> np.ndarray:
    """All injective target->query assignments: (P(Q,W), W) int32."""
    import itertools

    return np.asarray(
        list(itertools.permutations(range(num_queries), num_targets)), np.int32
    )


def _match_exhaustive(cost, n_windows):
    """Exact min-cost assignment by enumerating all P(Q, W) injective maps.

    XLA-native (no host callback): feasible because moment grounding uses
    tiny problems (Q=10 queries, <=5 GT windows -> 30240 candidates).
    Padded target columns get constant-zero cost, so they absorb leftover
    queries without influencing the optimum for the real targets.
    """
    B, Q, W = cost.shape
    perms = jnp.asarray(_perm_table(Q, W))  # (P, W)
    valid = (jnp.arange(W)[None, :] < n_windows[:, None]).astype(cost.dtype)
    cost = cost * valid[:, None, :]  # (B, Q, W), padded cols -> 0
    # total[b, p] = sum_j cost[b, perms[p, j], j]
    gathered = cost[:, perms, jnp.arange(W)[None, :]]  # (B, P, W)
    best = jnp.argmin(gathered.sum(-1), axis=1)  # (B,)
    assign = perms[best]  # (B, W)
    return jnp.where(valid > 0, assign, -1).astype(jnp.int32)


def hungarian_match(outputs, span_labels, n_windows, cost_span=10.0, cost_giou=1.0,
                    cost_class=4.0, impl: str = "auto", span_loss_type: str = "l1"):
    """Per-batch-item bipartite matching (model/matcher.py:36-100).

    Args:
      outputs: pred_logits (B, Q, 2) raw; pred_spans (B, Q, 2) cxw for 'l1'
        or (B, Q, 2*max_v_l) st/ed logits for 'ce'.
      span_labels: (B, Wmax, 2): normalized cxw floats ('l1') or inclusive
        (st, ed) clip indices ('ce'); zero-padded.
      n_windows: (B,) valid window counts.
      impl: 'exhaustive' (XLA-native enumeration, exact for Q,W small),
        'callback' (host scipy LSAP), or 'auto' (exhaustive when the
        permutation table is small -- required on TPU runtimes without host
        callbacks -- else callback).
    Returns:
      (B, Wmax) int32: matched query per window (-1 where padded).
    """
    prob = jax.nn.softmax(outputs["pred_logits"], axis=-1)[..., 0]  # fg prob
    cost_cls = -prob[:, :, None]  # (B, Q, 1) broadcast over targets
    if span_loss_type == "ce":
        B, Q, twoL = outputs["pred_spans"].shape
        L = twoL // 2
        sp = jax.nn.softmax(
            outputs["pred_spans"].reshape(B, Q, 2, L), axis=-1
        )  # (B, Q, 2, L)
        idx = span_labels.astype(jnp.int32)  # (B, Wmax, 2)
        # cost = -p_st[tgt_st] - p_ed[tgt_ed] (model/matcher.py:82-85)
        p_st = jnp.take_along_axis(
            sp[:, :, 0, :][:, :, None, :], idx[:, None, :, 0:1], axis=-1
        )[..., 0]
        p_ed = jnp.take_along_axis(
            sp[:, :, 1, :][:, :, None, :], idx[:, None, :, 1:2], axis=-1
        )[..., 0]
        cost = cost_span * (-p_st - p_ed) + cost_class * cost_cls
    else:
        l1 = jnp.abs(
            outputs["pred_spans"][:, :, None, :] - span_labels[:, None, :, :]
        ).sum(-1)
        giou = giou_cross(cxw_to_xx(outputs["pred_spans"]), cxw_to_xx(span_labels))
        cost = cost_span * l1 + cost_giou * (-giou) + cost_class * cost_cls
    cost = jax.lax.stop_gradient(cost)  # non-differentiable routing decision
    n_windows = jax.lax.stop_gradient(n_windows)

    B, Q, W = cost.shape
    if impl == "auto":
        import math

        n_perms = math.perm(Q, W)
        impl = "exhaustive" if n_perms <= 200_000 else "callback"
    if impl == "exhaustive":
        return _match_exhaustive(cost, n_windows)
    return jax.pure_callback(
        _lsap_host,
        jax.ShapeDtypeStruct((B, W), jnp.int32),
        cost,
        n_windows,
        vmap_method="sequential",
    )


def contrastive_align_loss(outputs, assign, w_valid, temperature=0.07):
    """Matched-query vs text-token InfoNCE (model/moment_detr.py:272-290).

    Args:
      outputs: proj_queries (B, Q, d), proj_txt_mem (B, Lt, d) normalized.
      assign: (B, Wmax) matched query per target (-1 pad).
      w_valid: (B, Wmax) float validity.
    """
    logits = jnp.einsum(
        "bqd,btd->bqt", outputs["proj_queries"], outputs["proj_txt_mem"]
    ).sum(2) / temperature  # (B, Q)
    B, Q = logits.shape
    pos_map = jnp.zeros((B, Q))
    valid_assign = jnp.where(w_valid > 0, assign, -1)
    pos_map = jax.vmap(
        lambda m, a: m.at[jnp.maximum(a, 0)].max(jnp.where(a >= 0, 1.0, 0.0))
    )(pos_map, valid_assign)
    pos_term = (logits * pos_map).sum(1)
    num_pos = jnp.maximum(pos_map.sum(1), 1.0)
    neg_term = jax.nn.logsumexp(logits, axis=1)
    return (-pos_term / num_pos + neg_term).mean()


def moment_detr_losses(
    outputs,
    targets,
    *,
    eos_coef=0.1,
    saliency_margin=0.2,
    temperature=0.07,
    aux=True,
    span_loss_type: str = "l1",
):
    """DETR-style matched losses (model/moment_detr.py:165-360).

    targets: span_labels (B, Wmax, 2) -- cxw floats ('l1') or st/ed clip
    indices ('ce'); n_windows (B,); saliency_pos/neg_labels (B, P).
    """
    span_labels = targets["span_labels"]
    n_windows = targets["n_windows"]
    B, Wmax = span_labels.shape[:2]
    w_valid = (jnp.arange(Wmax)[None, :] < n_windows[:, None]).astype(jnp.float32)

    def matched_losses(out, with_align=False):
        assign = hungarian_match(
            out, span_labels, n_windows, span_loss_type=span_loss_type
        )  # (B, Wmax)
        safe_assign = jnp.maximum(assign, 0)
        pred = jnp.take_along_axis(
            out["pred_spans"], safe_assign[..., None], axis=1
        )  # (B, Wmax, 2) or (B, Wmax, 2L)
        denom = jnp.maximum(w_valid.sum(), 1.0)
        if span_loss_type == "ce":
            # start/end classification over clip indices
            # (model/moment_detr.py:215-227); no GIoU term
            L = pred.shape[-1] // 2
            logp = jax.nn.log_softmax(pred.reshape(B, Wmax, 2, L), axis=-1)
            idx = span_labels.astype(jnp.int32)[..., None]  # (B, Wmax, 2, 1)
            ce = -jnp.take_along_axis(logp, idx, axis=-1)[..., 0]  # (B, Wmax, 2)
            loss_b = (ce * w_valid[..., None]).sum() / (denom * 2)
            loss_g = jnp.zeros(())
        else:
            l1 = jnp.abs(pred - span_labels).sum(-1)
            giou = giou_paired(cxw_to_xx(pred), cxw_to_xx(span_labels))
            # reference means over (matched, 2) coordinate entries
            # (moment_detr.py:213,230: F.l1_loss(...).mean())
            loss_b = (l1 * w_valid).sum() / (denom * 2)
            loss_g = ((1.0 - giou) * w_valid).sum() / denom

        # per-query CE: matched queries are foreground (class 0)
        Q = out["pred_logits"].shape[1]
        fg = jnp.zeros((B, Q))
        valid_assign = jnp.where(w_valid > 0, assign, -1)
        fg = jax.vmap(
            lambda f, a: f.at[jnp.maximum(a, 0)].max(jnp.where(a >= 0, 1.0, 0.0))
        )(fg, valid_assign)
        logp = jax.nn.log_softmax(out["pred_logits"], axis=-1)
        ce = -(fg * logp[..., 0] + (1.0 - fg) * logp[..., 1])
        weights = fg * 1.0 + (1.0 - fg) * eos_coef
        loss_f = (ce * weights).mean()
        ld = {"loss_b": loss_b, "loss_g": loss_g, "loss_f": loss_f}
        if with_align and "proj_queries" in out:
            ld["loss_contrastive_align"] = contrastive_align_loss(
                out, assign, w_valid, temperature
            )
        return ld

    losses = matched_losses(outputs, with_align=True)

    # hinge saliency (moment_detr.py:255-270)
    sal = outputs["saliency_scores"]
    pos_idx = targets["saliency_pos_labels"]
    neg_idx = targets["saliency_neg_labels"]
    batch_idx = jnp.arange(B)[:, None]
    pos_scores = sal[batch_idx, pos_idx]
    neg_scores = sal[batch_idx, neg_idx]
    n_pairs = pos_idx.shape[1]
    losses["loss_s_intra"] = (
        jnp.clip(saliency_margin + neg_scores - pos_scores, 0, None).sum()
        / (B * n_pairs)
        * 2
    )

    if aux and "aux_outputs" in outputs:
        for i, aux_out in enumerate(outputs["aux_outputs"]):
            for k, v in matched_losses(aux_out).items():
                losses[f"{k}_{i}"] = v
    return losses
