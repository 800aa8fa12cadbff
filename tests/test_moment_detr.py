"""Moment-DETR parity vs the reference PyTorch model + matcher/loss checks."""
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from model.moment_detr import Model as RefMD  # noqa: E402
from model.transformer import build_transformer as build_detr_transformer  # noqa: E402
from model.position_encoding import build_position_encoding  # noqa: E402
from model.matcher import HungarianMatcher as RefMatcher  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from univtg_tpu.interop.torch_ckpt import md_params_from_torch_state_dict  # noqa: E402
from univtg_tpu.models.moment_detr import (  # noqa: E402
    MomentDETR,
    MomentDETRConfig,
    hungarian_match,
    moment_detr_losses,
)

CFG = MomentDETRConfig(
    vid_dim=20,
    txt_dim=16,
    hidden_dim=64,
    num_layers=2,
    num_heads=4,
    ffn_dim=96,
    dropout=0.1,
    input_dropout=0.5,
    num_queries=6,
    num_decoder_layers=2,
    max_v_l=24,
    max_q_l=10,
    aux_loss=True,
)


def build_ref(cfg):
    args = SimpleNamespace(
        hidden_dim=cfg.hidden_dim,
        dropout=cfg.dropout,
        nheads=cfg.num_heads,
        dim_feedforward=cfg.ffn_dim,
        enc_layers=cfg.num_layers,
        dec_layers=cfg.num_decoder_layers,
        pre_norm=False,
        position_embedding="sine",
        max_q_l=cfg.max_q_l,
        input_dropout=cfg.input_dropout,
        t_feat_dim=cfg.txt_dim,
        v_feat_dim=cfg.vid_dim,
        span_loss_type="l1",
        use_txt_pos=False,
        n_input_proj=cfg.n_input_proj,
    )
    torch.manual_seed(1)
    transformer = build_detr_transformer(args)
    pos, txt_pos = build_position_encoding(args)
    model = RefMD(
        transformer,
        pos,
        txt_pos,
        txt_dim=cfg.txt_dim,
        vid_dim=cfg.vid_dim,
        num_queries=cfg.num_queries,
        input_dropout=cfg.input_dropout,
        aux_loss=cfg.aux_loss,
        span_loss_type="l1",
        n_input_proj=cfg.n_input_proj,
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(5)
    B, Lv, Lt = 2, 24, 10
    vid = rng.standard_normal((B, Lv, CFG.vid_dim)).astype(np.float32)
    txt = rng.standard_normal((B, Lt, CFG.txt_dim)).astype(np.float32)
    vid_mask = np.ones((B, Lv), np.float32)
    txt_mask = np.ones((B, Lt), np.float32)
    vid_mask[1, 17:] = 0
    txt_mask[1, 6:] = 0
    return vid * vid_mask[..., None], vid_mask, txt * txt_mask[..., None], txt_mask


def test_forward_parity(batch):
    vid, vid_mask, txt, txt_mask = batch
    ref = build_ref(CFG)
    params = md_params_from_torch_state_dict(ref.state_dict(), CFG)
    model = MomentDETR(CFG)
    with torch.no_grad():
        ro = ref(
            src_txt=torch.from_numpy(txt),
            src_txt_mask=torch.from_numpy(txt_mask),
            src_vid=torch.from_numpy(vid),
            src_vid_mask=torch.from_numpy(vid_mask),
        )
    jo = model.apply(params, txt, txt_mask, vid, vid_mask, train=False)
    for k in ("pred_logits", "pred_spans", "saliency_scores"):
        np.testing.assert_allclose(
            np.asarray(jo[k]), ro[k].numpy(), atol=1e-4, rtol=1e-4, err_msg=k
        )
    assert len(jo["aux_outputs"]) == CFG.num_decoder_layers - 1
    np.testing.assert_allclose(
        np.asarray(jo["aux_outputs"][0]["pred_spans"]),
        ro["aux_outputs"][0]["pred_spans"].numpy(),
        atol=1e-4,
    )


def test_matcher_parity(batch):
    rng = np.random.default_rng(9)
    B, Q, Wmax = 3, 6, 4
    logits = rng.standard_normal((B, Q, 2)).astype(np.float32)
    centers = rng.uniform(0.2, 0.8, (B, Q)).astype(np.float32)
    widths = rng.uniform(0.05, 0.3, (B, Q)).astype(np.float32)
    spans = np.stack([centers, widths], -1)
    n_windows = np.array([1, 3, 2], np.int32)
    tgt = np.zeros((B, Wmax, 2), np.float32)
    for b in range(B):
        c = rng.uniform(0.2, 0.8, n_windows[b])
        w = rng.uniform(0.05, 0.3, n_windows[b])
        tgt[b, : n_windows[b]] = np.stack([c, w], -1)

    ref_matcher = RefMatcher(
        cost_class=4, cost_span=10, cost_giou=1, span_loss_type="l1", max_v_l=75
    )
    ref_out = ref_matcher(
        {
            "pred_logits": torch.from_numpy(logits),
            "pred_spans": torch.from_numpy(spans),
        },
        {
            "span_labels": [
                {"spans": torch.from_numpy(tgt[b, : n_windows[b]])} for b in range(B)
            ]
        },
    )
    got = np.asarray(
        hungarian_match(
            {"pred_logits": jnp.asarray(logits), "pred_spans": jnp.asarray(spans)},
            jnp.asarray(tgt),
            jnp.asarray(n_windows),
        )
    )
    for b in range(B):
        src_idx, tgt_idx = ref_out[b]
        want = np.full(Wmax, -1, np.int32)
        want[tgt_idx.numpy()] = src_idx.numpy()
        np.testing.assert_array_equal(got[b], want)


def test_losses_finite_and_jittable(batch):
    vid, vid_mask, txt, txt_mask = batch
    model = MomentDETR(CFG)
    params = model.init(
        jax.random.PRNGKey(0), txt, txt_mask, vid, vid_mask, train=False
    )
    out = model.apply(params, txt, txt_mask, vid, vid_mask, train=False)
    targets = {
        "span_labels": jnp.asarray(
            [[[0.3, 0.2], [0.7, 0.1]], [[0.5, 0.4], [0.0, 0.0]]], jnp.float32
        ),
        "n_windows": jnp.asarray([2, 1], jnp.int32),
        "saliency_pos_labels": jnp.asarray([[3], [5]], jnp.int32),
        "saliency_neg_labels": jnp.asarray([[20], [1]], jnp.int32),
    }
    losses = moment_detr_losses(out, targets)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert "loss_b_0" in losses  # aux losses present


def test_contrastive_align_loss(batch):
    """Reference semantics check (model/moment_detr.py:272-290): manual
    computation with a known assignment."""
    from univtg_tpu.models.moment_detr import contrastive_align_loss

    rng = np.random.default_rng(3)
    B, Q, Lt, d = 2, 4, 5, 8
    pq = rng.standard_normal((B, Q, d)).astype(np.float32)
    pt = rng.standard_normal((B, Lt, d)).astype(np.float32)
    pq /= np.linalg.norm(pq, axis=-1, keepdims=True)
    pt /= np.linalg.norm(pt, axis=-1, keepdims=True)
    assign = np.array([[1, -1], [2, 3]], np.int32)  # (B, Wmax=2)
    w_valid = np.array([[1.0, 0.0], [1.0, 1.0]], np.float32)

    got = float(
        contrastive_align_loss(
            {"proj_queries": jnp.asarray(pq), "proj_txt_mem": jnp.asarray(pt)},
            jnp.asarray(assign),
            jnp.asarray(w_valid),
        )
    )
    # manual: logits = sum_t <q, t>/T; positives = matched queries
    logits = (pq @ pt.transpose(0, 2, 1)).sum(2) / 0.07
    want = 0.0
    for b, pos in enumerate([[1], [2, 3]]):
        pos_term = sum(logits[b, p] for p in pos) / len(pos)
        neg_term = np.log(np.exp(logits[b]).sum())
        want += -pos_term + neg_term
    want /= B
    assert got == pytest.approx(want, rel=1e-5)


def test_contrastive_align_in_model_losses(batch):
    import jax as _jax

    vid, vid_mask, txt, txt_mask = batch
    cfg = MomentDETRConfig(**{**CFG.__dict__, "contrastive_align": True})
    model = MomentDETR(cfg)
    params = model.init(_jax.random.PRNGKey(0), txt, txt_mask, vid, vid_mask, train=False)
    out = model.apply(params, txt, txt_mask, vid, vid_mask, train=False)
    assert "proj_queries" in out
    targets = {
        "span_labels": jnp.asarray([[[0.3, 0.2]], [[0.5, 0.4]]], jnp.float32),
        "n_windows": jnp.asarray([1, 1], jnp.int32),
        "saliency_pos_labels": jnp.asarray([[3], [5]], jnp.int32),
        "saliency_neg_labels": jnp.asarray([[20], [1]], jnp.int32),
    }
    losses = moment_detr_losses(out, targets)
    assert "loss_contrastive_align" in losses
    assert np.isfinite(float(losses["loss_contrastive_align"]))


def test_ce_span_type_matcher_and_losses():
    """'ce' start/end-classification spans: matcher parity vs the reference
    ce cost branch and CE loss vs the reference criterion."""
    from model.moment_detr import SetCriterion as RefCrit

    rng = np.random.default_rng(21)
    B, Q, L, Wmax = 2, 6, 12, 3
    logits = rng.standard_normal((B, Q, 2)).astype(np.float32)
    span_logits = rng.standard_normal((B, Q, 2 * L)).astype(np.float32)
    n_windows = np.array([2, 1], np.int32)
    tgt = np.zeros((B, Wmax, 2), np.float32)
    tgt[0, :2] = [[1, 4], [6, 10]]
    tgt[1, :1] = [[3, 7]]

    ref_matcher = RefMatcher(
        cost_class=4, cost_span=10, cost_giou=1, span_loss_type="ce", max_v_l=L
    )
    ref_out = ref_matcher(
        {
            "pred_logits": torch.from_numpy(logits),
            "pred_spans": torch.from_numpy(span_logits),
        },
        {
            "span_labels": [
                {"spans": torch.from_numpy(tgt[b, : n_windows[b]]).long()}
                for b in range(B)
            ]
        },
    )
    got = np.asarray(
        hungarian_match(
            {
                "pred_logits": jnp.asarray(logits),
                "pred_spans": jnp.asarray(span_logits),
            },
            jnp.asarray(tgt),
            jnp.asarray(n_windows),
            span_loss_type="ce",
        )
    )
    for b in range(B):
        src_idx, tgt_idx = ref_out[b]
        want = np.full(Wmax, -1, np.int32)
        want[tgt_idx.numpy()] = src_idx.numpy()
        np.testing.assert_array_equal(got[b], want, err_msg=str(b))

    # CE span loss parity on the matched pairs
    crit = RefCrit(
        matcher=ref_matcher, weight_dict={}, eos_coef=0.1,
        losses=["spans"], temperature=0.07, span_loss_type="ce", max_v_l=L,
    )
    ref_ld = crit(
        {
            "pred_logits": torch.from_numpy(logits),
            "pred_spans": torch.from_numpy(span_logits),
        },
        {
            "span_labels": [
                {"spans": torch.from_numpy(tgt[b, : n_windows[b]]).long()}
                for b in range(B)
            ]
        },
    )
    targets = {
        "span_labels": jnp.asarray(tgt),
        "n_windows": jnp.asarray(n_windows),
        "saliency_pos_labels": jnp.asarray([[0], [0]], jnp.int32),
        "saliency_neg_labels": jnp.asarray([[1], [1]], jnp.int32),
    }
    got_ld = moment_detr_losses(
        {
            "pred_logits": jnp.asarray(logits),
            "pred_spans": jnp.asarray(span_logits),
            "saliency_scores": jnp.zeros((B, L)),
        },
        targets,
        span_loss_type="ce",
        aux=False,
    )
    assert float(got_ld["loss_b"]) == pytest.approx(float(ref_ld["loss_b"]), abs=1e-5)
    assert float(got_ld["loss_g"]) == 0.0


def test_matcher_callback_impl_matches_exhaustive():
    rng = np.random.default_rng(13)
    B, Q, Wmax = 2, 6, 3
    outputs = {
        "pred_logits": jnp.asarray(rng.standard_normal((B, Q, 2)), jnp.float32),
        "pred_spans": jnp.asarray(
            np.stack([rng.uniform(0.2, 0.8, (B, Q)), rng.uniform(0.05, 0.3, (B, Q))], -1),
            jnp.float32,
        ),
    }
    tgt = np.zeros((B, Wmax, 2), np.float32)
    tgt[0, :2] = [[0.3, 0.1], [0.7, 0.2]]
    tgt[1, :1] = [[0.5, 0.25]]
    n = jnp.asarray([2, 1], jnp.int32)
    a = np.asarray(hungarian_match(outputs, jnp.asarray(tgt), n, impl="exhaustive"))
    b = np.asarray(hungarian_match(outputs, jnp.asarray(tgt), n, impl="callback"))
    np.testing.assert_array_equal(a, b)
