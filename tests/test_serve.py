"""Serving path: grounding decode parity vs the reference gradio math on the
bundled tmp/ feature fixtures, plus end-to-end video+query grounding through
the cv2 decode + tiny CLIP towers."""
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from model.univtg import Model as RefModel  # noqa: E402
from model.transformer_encoder_droppath import build_transformer  # noqa: E402
from model.position_encoding import build_position_encoding  # noqa: E402

from univtg_tpu.data.features import l2_normalize  # noqa: E402
from univtg_tpu.data.mr import tef_features, timestamp_grid  # noqa: E402
from univtg_tpu.interop import params_from_torch_state_dict  # noqa: E402
from univtg_tpu.models import ModelConfig  # noqa: E402
from univtg_tpu.serve import GroundingPipeline  # noqa: E402

CFG = ModelConfig(
    vid_dim=514,  # 512 clip features + 2 TEF
    txt_dim=512,
    hidden_dim=64,
    num_layers=2,
    num_heads=4,
    ffn_dim=96,
    max_v_l=75,
    max_q_l=32,
)


def build_ref():
    args = SimpleNamespace(
        hidden_dim=CFG.hidden_dim, dropout=0.1, droppath=0.1, nheads=CFG.num_heads,
        dim_feedforward=CFG.ffn_dim, enc_layers=CFG.num_layers, dec_layers=2,
        pre_norm=False, position_embedding="sine", max_q_l=CFG.max_q_l,
        input_dropout=0.5, t_feat_dim=CFG.txt_dim, v_feat_dim=CFG.vid_dim,
        span_loss_type="l1", use_txt_pos=False, n_input_proj=2,
    )
    torch.manual_seed(3)
    model = RefModel(
        build_transformer(args), *build_position_encoding(args),
        txt_dim=args.t_feat_dim, vid_dim=args.v_feat_dim, input_dropout=0.5,
        span_loss_type="l1", n_input_proj=2,
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def fixture_feats():
    vid = np.load("/root/reference/tmp/vid.npz")["features"].astype(np.float32)
    txt = np.load("/root/reference/tmp/txt.npz")["features"].astype(np.float32)
    return vid, txt


def ref_gradio_forward(ref, vid_raw, txt_raw, clip_len=2.0):
    """The reference demo decode (main_gradio.py:58-103) in numpy/torch."""
    vid = torch.from_numpy(l2_normalize(vid_raw))
    txt = torch.from_numpy(l2_normalize(txt_raw))
    ctx_l = vid.shape[0]
    ts = torch.from_numpy(timestamp_grid(ctx_l, clip_len))
    vid = torch.cat([vid, torch.from_numpy(tef_features(ctx_l))], dim=1)
    with torch.no_grad():
        out = ref(
            src_vid=vid[None],
            src_txt=txt[None],
            src_vid_mask=torch.ones(1, ctx_l),
            src_txt_mask=torch.ones(1, txt.shape[0]),
        )
    pred_logits = out["pred_logits"][0, :, 0]
    pred_windows = (out["pred_spans"][0] + ts) * ctx_l * clip_len
    top1 = pred_windows[torch.argmax(pred_logits)].tolist()
    top5_scores = torch.topk(pred_logits, k=5).values.tolist()
    highlight = float(torch.argmax(out["saliency_scores"][0]) * clip_len)
    return top1, top5_scores, highlight


def test_pipeline_matches_gradio_decode(fixture_feats):
    vid, txt = fixture_feats
    ref = build_ref()
    params = params_from_torch_state_dict(ref.state_dict(), CFG)
    pipe = GroundingPipeline(CFG, params["params"], clip_len=2.0, buckets=[16, 32])

    want_top1, want_top5_scores, want_hl = ref_gradio_forward(ref, vid, txt)
    got = pipe.ground_features(vid, txt)
    # the serve path clamps windows to [0, duration] (inference_mr.py:153)
    want_top1 = np.clip(want_top1, 0, got["duration"])
    np.testing.assert_allclose(got["top1_window"], want_top1, atol=1e-3)
    # near-tied confidences make the top-5 *order* platform-dependent;
    # the score multiset must match
    np.testing.assert_allclose(
        [w[2] for w in got["topk_windows"]], want_top5_scores, atol=1e-5
    )
    assert got["top1_highlight"] == want_hl
    assert got["duration"] == vid.shape[0] * 2.0
    text = pipe.describe(got, "test query")
    assert "Top-1 interval" in text


def test_video_decode_cv2():
    from univtg_tpu.extract.video import decode_frames

    path = "/root/reference/examples/charades.mp4"
    if not os.path.exists(path):
        pytest.skip("no example video")
    frames, meta = decode_frames(path, clip_len=2.0, backend="cv2")
    assert frames.shape[1:] == (224, 224, 3)
    # ~31s video at 2s clips
    assert 13 <= len(frames) <= 17
    assert meta["fps"] > 0


def test_end_to_end_video_grounding():
    from univtg_tpu.extract.clip.model import CLIP, CLIPConfig
    from univtg_tpu.extract.pipeline import ClipEncoder

    path = "/root/reference/examples/charades.mp4"
    if not os.path.exists(path):
        pytest.skip("no example video")
    import jax

    clip_cfg = CLIPConfig(
        embed_dim=512,
        image_resolution=224,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=32,
        context_length=77,
        vocab_size=49408,
        transformer_width=64,
        transformer_heads=4,
        transformer_layers=2,
    )
    model = CLIP(clip_cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 224, 224, 3), np.float32),
        np.zeros((1, 77), np.int32),
    )
    enc = ClipEncoder(params, clip_cfg, image_batch=8, text_batch=2)

    # grounding model consumes CLIP's last_hidden_state (width = 64 here)
    g_cfg = ModelConfig(
        vid_dim=514, txt_dim=64, hidden_dim=64, num_layers=1, num_heads=4,
        ffn_dim=64, max_v_l=75, max_q_l=32,
    )
    from univtg_tpu.models import UniVTG

    g_model = UniVTG(g_cfg)
    g_params = g_model.init(
        jax.random.PRNGKey(1),
        np.zeros((1, 8, 64), np.float32),
        np.ones((1, 8), np.float32),
        np.zeros((1, 16, 514), np.float32),
        np.ones((1, 16), np.float32),
        train=False,
    )["params"]
    pipe = GroundingPipeline(
        g_cfg, g_params, clip_len=2.0, buckets=[16, 32], clip_encoder=enc
    )
    out = pipe.ground_video(path, "person opens a door")
    assert 0 <= out["top1_window"][0] <= out["duration"]
    assert len(out["topk_windows"]) == 5
    assert 0 <= out["top1_highlight"] <= out["duration"]


def test_ground_features_many_matches_single(fixture_feats):
    """Batched multi-query serving returns per-query results identical to
    the single-query path, across mixed text buckets."""
    vid, txt = fixture_feats
    ref = build_ref()
    params = params_from_torch_state_dict(ref.state_dict(), CFG)
    pipe = GroundingPipeline(CFG, params["params"], clip_len=2.0, buckets=[16, 32])

    rng = np.random.default_rng(4)
    queries = [
        txt,                                      # bucket 32
        txt[:5] + 0.1,                            # bucket 32, different text
        rng.standard_normal((40, txt.shape[1])).astype(np.float32),  # bucket 77
    ]
    many = pipe.ground_features_many(vid, queries)
    assert len(many) == 3
    for q, got in zip(queries, many):
        want = pipe.ground_features(vid, q)
        np.testing.assert_allclose(got["top1_window"], want["top1_window"], atol=1e-4)
        np.testing.assert_allclose(
            [w[2] for w in got["topk_windows"]],
            [w[2] for w in want["topk_windows"]],
            atol=1e-5,
        )
        np.testing.assert_allclose(got["saliency"], want["saliency"], atol=1e-4)
        assert got["duration"] == want["duration"]
    assert pipe.ground_features_many(vid, []) == []


def test_bf16_param_serving_close_to_f32(fixture_feats):
    """param_dtype='bfloat16' (the HBM-bandwidth serving mode) keeps the
    grounding decisions: same top-1 highlight, overlapping top-1 window."""
    vid_feats, txt_feats = fixture_feats
    import jax
    import jax.numpy as jnp

    ref = build_ref()
    params = params_from_torch_state_dict(ref.state_dict(), CFG)["params"]
    want = GroundingPipeline(CFG, params, clip_len=2.0, buckets=[16, 32]).ground_features(
        vid_feats, txt_feats
    )
    pipe16 = GroundingPipeline(
        CFG, params, clip_len=2.0, buckets=[16, 32], param_dtype="bfloat16"
    )
    assert all(
        l.dtype == jnp.bfloat16
        for l in jax.tree_util.tree_leaves(pipe16.params)
        if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
    )
    got = pipe16.ground_features(vid_feats, txt_feats)
    assert got["top1_highlight"] == want["top1_highlight"]
    np.testing.assert_allclose(got["top1_window"], want["top1_window"], atol=2.0)
    np.testing.assert_allclose(got["saliency"], want["saliency"], atol=0.05)


def test_serve_decode_equals_batch_eval_decode(fixture_feats):
    """Serve and batch-eval run the SAME decode (train/steps.
    decode_dense_outputs, incl. the fp16 saliency parity cast): identical
    inputs through both surfaces produce identical tensors."""
    import jax
    import jax.numpy as jnp

    from univtg_tpu.models import UniVTG
    from univtg_tpu.train.steps import make_eval_step

    vid_raw, txt_raw = fixture_feats
    ref = build_ref()
    params = params_from_torch_state_dict(ref.state_dict(), CFG)["params"]

    for eval_mode in (None, "add"):
        pipe = GroundingPipeline(
            CFG, params, clip_len=2.0, buckets=[16, 32], eval_mode=eval_mode
        )
        pv = pipe.prepare_video(vid_raw)
        vid, vid_mask, ts = pv.vid, pv.vid_mask, pv.ts
        txt, txt_mask = pipe._prepare_txt(txt_raw)
        serve_out = pipe._fwd(
            params,
            jnp.asarray(txt[None]), jnp.asarray(txt_mask[None]),
            jnp.asarray(vid[None]), jnp.asarray(vid_mask[None]),
            jnp.asarray(ts[None]),
        )

        eval_step = make_eval_step(UniVTG(CFG), eval_mode=eval_mode)
        eval_out = eval_step(
            params,
            {
                "src_txt": jnp.asarray(txt[None]),
                "src_txt_mask": jnp.asarray(txt_mask[None]),
                "src_vid": jnp.asarray(vid[None]),
                "src_vid_mask": jnp.asarray(vid_mask[None]),
            },
            {"timestamp": jnp.asarray(ts[None])},
        )
        for key in ("scores", "spans", "saliency"):
            np.testing.assert_array_equal(
                np.asarray(serve_out[key]), np.asarray(eval_out[key]), err_msg=key
            )
