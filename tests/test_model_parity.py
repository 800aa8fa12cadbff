"""Forward-pass parity vs the reference PyTorch model (CPU): after mapping
the torch state_dict through the interop layer, every model output must
match within 1e-4 (BASELINE.json fidelity requirement)."""
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from model.univtg import Model as RefModel  # noqa: E402
from model.transformer_encoder_droppath import build_transformer  # noqa: E402
from model.position_encoding import build_position_encoding  # noqa: E402

from univtg_tpu.models import ModelConfig, UniVTG  # noqa: E402
from univtg_tpu.interop import params_from_torch_state_dict  # noqa: E402

CFG = ModelConfig(
    vid_dim=20,
    txt_dim=16,
    hidden_dim=64,
    num_layers=2,
    num_heads=4,
    ffn_dim=96,
    dropout=0.1,
    droppath=0.1,
    input_dropout=0.5,
    max_v_l=24,
    max_q_l=10,
)


def build_ref_model(cfg: ModelConfig):
    args = SimpleNamespace(
        hidden_dim=cfg.hidden_dim,
        dropout=cfg.dropout,
        droppath=cfg.droppath,
        nheads=cfg.num_heads,
        dim_feedforward=cfg.ffn_dim,
        enc_layers=cfg.num_layers,
        dec_layers=2,
        pre_norm=cfg.pre_norm,
        position_embedding="sine",
        max_q_l=cfg.max_q_l,
        input_dropout=cfg.input_dropout,
        t_feat_dim=cfg.txt_dim,
        v_feat_dim=cfg.vid_dim,
        span_loss_type=cfg.span_loss_type,
        use_txt_pos=cfg.use_txt_pos,
        n_input_proj=cfg.n_input_proj,
    )
    torch.manual_seed(0)
    transformer = build_transformer(args)
    pos_embed, txt_pos_embed = build_position_encoding(args)
    model = RefModel(
        transformer,
        pos_embed,
        txt_pos_embed,
        txt_dim=args.t_feat_dim,
        vid_dim=args.v_feat_dim,
        input_dropout=args.input_dropout,
        span_loss_type=args.span_loss_type,
        use_txt_pos=args.use_txt_pos,
        n_input_proj=args.n_input_proj,
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def batch(rng=np.random.default_rng(7)):
    B, Lv, Lt = 3, 24, 10
    vid = rng.standard_normal((B, Lv, CFG.vid_dim)).astype(np.float32)
    txt = rng.standard_normal((B, Lt, CFG.txt_dim)).astype(np.float32)
    vid_mask = np.zeros((B, Lv), np.float32)
    txt_mask = np.zeros((B, Lt), np.float32)
    for i, (lv, lt) in enumerate([(24, 10), (17, 6), (9, 3)]):
        vid_mask[i, :lv] = 1
        txt_mask[i, :lt] = 1
    vid = vid * vid_mask[..., None]
    txt = txt * txt_mask[..., None]
    return vid, vid_mask, txt, txt_mask


@pytest.fixture(scope="module")
def models(batch):
    ref = build_ref_model(CFG)
    params = params_from_torch_state_dict(ref.state_dict(), CFG)
    return ref, UniVTG(CFG), params


def test_forward_parity(models, batch):
    """Per-sample exact-length reference forward vs our batched padded
    forward: valid positions must agree within 1e-4. (The reference's
    *batched* conv heads leak padded-token embeddings into boundary scores;
    this framework masks them, so the exact-length run is the contract.)"""
    ref, model, params = models
    vid, vid_mask, txt, txt_mask = batch
    out = model.apply(params, txt, txt_mask, vid, vid_mask, train=False)

    for i in range(vid.shape[0]):
        lv = int(vid_mask[i].sum())
        lt = int(txt_mask[i].sum())
        with torch.no_grad():
            ref_out = ref(
                src_txt=torch.from_numpy(txt[i : i + 1, :lt]),
                src_txt_mask=torch.from_numpy(txt_mask[i : i + 1, :lt]),
                src_vid=torch.from_numpy(vid[i : i + 1, :lv]),
                src_vid_mask=torch.from_numpy(vid_mask[i : i + 1, :lv]),
            )
        for key in ("pred_logits", "pred_spans", "saliency_scores", "vid_mem_proj", "txt_mem_proj"):
            want = ref_out[key][0].numpy()
            if key == "txt_mem_proj":
                got = np.asarray(out[key][i])
            elif key in ("pred_logits", "pred_spans", "saliency_scores", "vid_mem_proj"):
                got = np.asarray(out[key][i, :lv])
            np.testing.assert_allclose(
                got, want, atol=1e-4, rtol=1e-4, err_msg=f"{key}[{i}]"
            )
            assert np.max(np.abs(got - want)) < 1e-4, key


def test_padding_invariance(models, batch):
    """Batched padded decode must equal exact-length decode (the property
    the reference's batched path lacks)."""
    _, model, params = models
    vid, vid_mask, txt, txt_mask = batch
    out_pad = model.apply(params, txt, txt_mask, vid, vid_mask, train=False)
    i, lv, lt = 1, 17, 6
    out_exact = model.apply(
        params,
        txt[i : i + 1, :lt],
        txt_mask[i : i + 1, :lt],
        vid[i : i + 1, :lv],
        vid_mask[i : i + 1, :lv],
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_pad["pred_logits"][i, :lv]),
        np.asarray(out_exact["pred_logits"][0]),
        atol=1e-5,
    )


def test_cls_branch_parity(models, batch):
    ref, model, params = models
    vid, vid_mask, txt, txt_mask = batch
    rng = np.random.default_rng(11)
    cls = rng.standard_normal((3, 4, CFG.txt_dim)).astype(np.float32)
    cls_mask = np.ones((3, 4), np.float32)
    with torch.no_grad():
        ref_out = ref(
            src_txt=torch.from_numpy(txt),
            src_txt_mask=torch.from_numpy(txt_mask),
            src_vid=torch.from_numpy(vid),
            src_vid_mask=torch.from_numpy(vid_mask),
            src_cls=torch.from_numpy(cls),
            src_cls_mask=torch.from_numpy(cls_mask),
        )
    out = model.apply(params, txt, txt_mask, vid, vid_mask, cls, cls_mask, train=False)
    np.testing.assert_allclose(
        np.asarray(out["cls_mem_proj"]), ref_out["cls_mem_proj"].numpy(), atol=1e-4
    )


def test_jit_and_shapes(models, batch):
    import jax

    _, model, params = models
    vid, vid_mask, txt, txt_mask = batch
    fwd = jax.jit(lambda p, *a: model.apply(p, *a, train=False))
    out = fwd(params, txt, txt_mask, vid, vid_mask)
    assert out["pred_logits"].shape == (3, 24, 1)
    assert out["pred_spans"].shape == (3, 24, 2)
    assert out["saliency_scores"].shape == (3, 24)
    # offsets must be (left<=0, right>=0)
    spans = np.asarray(out["pred_spans"])
    assert (spans[..., 0] <= 0).all() and (spans[..., 1] >= 0).all()
