"""Canonical experiment presets.

Encodes the hyperparameters of the reference's launch scripts (SURVEY.md
2.7: scripts/qvhl_pretrain.sh, pretrain.sh, cotrain.sh, HL/QFVS runs) as
config builders. Feature-dim arithmetic follows the scripts: slowfast 2304 +
CLIP 512 (+2 TEF) video, CLIP 512 text.
"""
from __future__ import annotations

from univtg_tpu.data.mr import MRDataConfig
from univtg_tpu.data.hl import HLDataConfig
from univtg_tpu.data.qfvs import QFVSDataConfig
from univtg_tpu.models import ModelConfig
from univtg_tpu.models.losses import LossWeights
from univtg_tpu.train.driver_mr import TrainConfig
from univtg_tpu.train.driver_hl import HLTrainConfig
from univtg_tpu.train.driver_qfvs import QFVSTrainConfig

SLOWFAST_DIM = 2304
CLIP_DIM = 512
TEF_DIM = 2


def flagship_model(**kw) -> ModelConfig:
    """The released UniVTG architecture (hidden 1024, 4 layers, ff 1024)."""
    base = dict(
        vid_dim=SLOWFAST_DIM + CLIP_DIM + TEF_DIM,
        txt_dim=CLIP_DIM,
        hidden_dim=1024,
        num_layers=4,
        num_heads=8,
        ffn_dim=1024,
        droppath=0.1,
        input_dropout=0.5,
        max_v_l=75,
        max_q_l=32,
    )
    base.update(kw)
    return ModelConfig(**base)


def qvhighlights_mr(
    data_root: str = "data/qvhighlights",
    results_dir: str = "results/mr-qvhighlights",
    **kw,
) -> TrainConfig:
    """QVHighlights MR+HL fine-tuning (scripts/qvhl_pretrain.sh: bsz 32,
    lr 1e-4, 200 epochs, b10/g1/f10/s0.1, eval_mode add, nms 0.7)."""
    data = dict(
        dset_name="qvhighlights",
        v_feat_dirs=(f"{data_root}/vid_slowfast", f"{data_root}/vid_clip"),
        q_feat_dir=f"{data_root}/txt_clip",
        v_feat_dim=SLOWFAST_DIM + CLIP_DIM,
        q_feat_dim=CLIP_DIM,
        clip_len=2.0,
        max_q_l=32,
        max_v_l=75,
    )
    cfg = TrainConfig(
        model=flagship_model(),
        train_data=MRDataConfig(
            data_path=f"{data_root}/metadata/qvhighlights_train.jsonl", **data
        ),
        eval_data=MRDataConfig(
            data_path=f"{data_root}/metadata/qvhighlights_val.jsonl", **data
        ),
        results_dir=results_dir,
        bsz=32,
        n_epoch=200,
        lr=1e-4,
        lr_drop=200,
        lr_warmup=10,
        weights=LossWeights(b=10, g=1, f=10, s_intra=0.1, s_inter=0.1),
        eval_mode="add",
        nms_thd=0.7,
        main_metric="MR-full-mAP",
    )
    for k, v in kw.items():
        cfg = _replace(cfg, k, v)
    return cfg


def _downstream_mr(dset_name, data_root, results_dir, clip_len, main_metric,
                   train_name="train.jsonl", val_name="val.jsonl", **kw):
    """Shared downstream MR template (Charades-STA / Ego4D-NLQ / TACoS)."""
    data = dict(
        dset_name=dset_name,
        v_feat_dirs=(f"{data_root}/vid_slowfast", f"{data_root}/vid_clip"),
        q_feat_dir=f"{data_root}/txt_clip",
        v_feat_dim=SLOWFAST_DIM + CLIP_DIM,
        q_feat_dim=CLIP_DIM,
        clip_len=clip_len,
        max_q_l=32,
        max_v_l=75,
    )
    cfg = TrainConfig(
        model=flagship_model(),
        train_data=MRDataConfig(data_path=f"{data_root}/metadata/{train_name}", **data),
        eval_data=MRDataConfig(data_path=f"{data_root}/metadata/{val_name}", **data),
        results_dir=results_dir,
        bsz=32,
        n_epoch=100,
        lr=1e-4,
        lr_drop=100,
        lr_warmup=10,
        weights=LossWeights(b=10, g=1, f=10, s_intra=0.1, s_inter=0.1),
        eval_mode="add",
        main_metric=main_metric,
    )
    for k, v in kw.items():
        cfg = _replace(cfg, k, v)
    return cfg


def charades_mr(data_root="data/charades", results_dir="results/mr-charades", **kw):
    return _downstream_mr(
        "charades", data_root, results_dir, clip_len=1.0,
        main_metric="MR-full-R1@0.5",
        train_name="charades_train.jsonl", val_name="charades_test.jsonl", **kw,
    )


def nlq_mr(data_root="data/ego4d", results_dir="results/mr-nlq", **kw):
    return _downstream_mr(
        "ego4d", data_root, results_dir, clip_len=2.0,
        main_metric="MR-full-R1@0.3",
        train_name="nlq_train.jsonl", val_name="nlq_val.jsonl", **kw,
    )


def tacos_mr(data_root="data/tacos", results_dir="results/mr-tacos", **kw):
    return _downstream_mr(
        "tacos", data_root, results_dir, clip_len=2.0,
        main_metric="MR-full-R1@0.3", **kw,
    )


def anet_mr(data_root="data/anet", results_dir="results/mr-anet", **kw):
    return _downstream_mr(
        "activitynet", data_root, results_dir, clip_len=2.0,
        main_metric="MR-full-R1@0.5", **kw,
    )


def didemo_mr(data_root="data/didemo", results_dir="results/mr-didemo", **kw):
    return _downstream_mr(
        "didemo", data_root, results_dir, clip_len=2.0,
        main_metric="MR-full-R1@0.5", **kw,
    )


def youtube_hl(
    data_root: str = "data/youtube", results_dir: str = "results/hl-youtube", **kw
) -> HLTrainConfig:
    cfg = HLTrainConfig(
        model=flagship_model(vid_dim=SLOWFAST_DIM + CLIP_DIM + TEF_DIM),
        data=HLDataConfig(
            dset_name="youtube",
            anno_path=f"{data_root}/youtube_anno.json",
            v_feat_dirs=(f"{data_root}/vid_slowfast", f"{data_root}/vid_clip"),
            q_feat_dir=f"{data_root}/txt_clip",
        ),
        results_dir=results_dir,
        bsz=4,
        n_epoch=200,
        lr=1e-4,
        weights=LossWeights(b=0, g=0, f=10, s_intra=0.1, s_inter=0.1),
    )
    for k, v in kw.items():
        cfg = _replace(cfg, k, v)
    return cfg


def tvsum_hl(
    data_root: str = "data/tvsum", results_dir: str = "results/hl-tvsum", **kw
) -> HLTrainConfig:
    cfg = HLTrainConfig(
        model=flagship_model(vid_dim=SLOWFAST_DIM + CLIP_DIM + TEF_DIM),
        data=HLDataConfig(
            dset_name="tvsum",
            anno_path=f"{data_root}/tvsum_anno.json",
            v_feat_dirs=(f"{data_root}/vid_slowfast", f"{data_root}/vid_clip"),
            q_feat_dir=f"{data_root}/txt_clip",
        ),
        results_dir=results_dir,
        bsz=4,
        n_epoch=200,
        lr=1e-4,
        weights=LossWeights(b=0, g=0, f=10, s_intra=0.1, s_inter=0.1),
    )
    for k, v in kw.items():
        cfg = _replace(cfg, k, v)
    return cfg


def qfvs(
    data_root: str = "data/qfvs", results_dir: str = "results/qfvs", **kw
) -> QFVSTrainConfig:
    cfg = QFVSTrainConfig(
        model=flagship_model(
            vid_dim=CLIP_DIM + TEF_DIM, max_v_l=200, hidden_dim=1024
        ),
        data=QFVSDataConfig(root=data_root),
        tags_mat_path="data/ute_query/Tags.mat",
        results_dir=results_dir,
        n_epoch=20,
    )
    for k, v in kw.items():
        cfg = _replace(cfg, k, v)
    return cfg


def vlp_pretrain(
    data_root: str = "data", results_dir: str = "results/vlp-pretrain", **kw
):
    """Large-scale point+interval+curve pretraining (scripts/pretrain.sh:
    bsz 64, 10 epochs, hidden 1024, Ego4D point + VideoCC interval/curve;
    corpus jsonl paths follow the reference vlp_mapping,
    main/dataset.py:66-97)."""
    from univtg_tpu.data.vlp import VLPCorpusSpec, VLPDataConfig
    from univtg_tpu.train.driver_vlp import VLPTrainConfig

    def corpus(rel_jsonl, dset, ftype, v_suffix="", q_suffix=""):
        return VLPCorpusSpec(
            data_path=f"{data_root}/{rel_jsonl}",
            dset_name=dset,
            v_feat_dirs=(
                f"{data_root}/{dset}/vid_slowfast{v_suffix}",
                f"{data_root}/{dset}/vid_clip{v_suffix}",
            ),
            q_feat_dir=f"{data_root}/{dset}/txt_clip{q_suffix}",
            type=ftype,
        )

    cfg = VLPTrainConfig(
        model=flagship_model(),
        vlp_data=VLPDataConfig(
            corpora=(
                corpus("ego4d/metadata/point_egoclip_wo_val.jsonl", "ego4d", "point",
                       "_point", "_point"),
                corpus("videocc/metadata/interval_900k.jsonl", "videocc", "interval"),
                corpus("videocc/metadata/curve_5_window.jsonl", "videocc", "curve",
                       "", "_concept"),
            ),
            v_feat_dim=SLOWFAST_DIM + CLIP_DIM,
            q_feat_dim=CLIP_DIM,
            txt_drop_ratio=0.1,
        ),
        train_data=None,
        eval_data=MRDataConfig(  # zero-shot QVHighlights (train_vlp_ddp.py:246-259)
            dset_name="qvhighlights",
            data_path=f"{data_root}/qvhighlights/metadata/qvhighlights_val.jsonl",
            v_feat_dirs=(
                f"{data_root}/qvhighlights/vid_slowfast",
                f"{data_root}/qvhighlights/vid_clip",
            ),
            q_feat_dir=f"{data_root}/qvhighlights/txt_clip",
            v_feat_dim=SLOWFAST_DIM + CLIP_DIM,
            q_feat_dim=CLIP_DIM,
        ),
        results_dir=results_dir,
        bsz=64,
        n_epoch=10,
        lr=1e-4,
        lr_warmup=1,
        lr_drop=200,
        weights=LossWeights(b=10, g=1, f=10, s_intra=0.1, s_inter=0.1),
        eval_mode="add",
        max_es_cnt=-1,
    )
    for k, v in kw.items():
        cfg = _replace(cfg, k, v)
    return cfg


def cotrain(
    data_root: str = "data", results_dir: str = "results/cotrain",
    resume: str = "", **kw,
):
    """Multi-corpus downstream co-training (scripts/cotrain.sh: 6 corpora,
    100 epochs, resume from pretraining). Corpus types follow vlp_mapping
    (main/dataset.py:77-96): qvhighlights=curve, the rest=interval."""
    from univtg_tpu.data.vlp import VLPCorpusSpec, VLPDataConfig
    from univtg_tpu.train.driver_vlp import VLPTrainConfig

    def corpus(dset, jsonl, ftype, clip_len=2.0):
        return VLPCorpusSpec(
            data_path=f"{data_root}/{dset}/metadata/{jsonl}",
            dset_name=dset,
            v_feat_dirs=(
                f"{data_root}/{dset}/vid_slowfast",
                f"{data_root}/{dset}/vid_clip",
            ),
            q_feat_dir=f"{data_root}/{dset}/txt_clip",
            type=ftype,
            clip_len=clip_len,
        )

    cfg = VLPTrainConfig(
        model=flagship_model(),
        vlp_data=VLPDataConfig(
            corpora=(
                corpus("qvhighlights", "qvhighlights_train.jsonl", "curve"),
                corpus("charades", "charades_train.jsonl", "interval", 1.0),
                corpus("ego4d", "nlq_train.jsonl", "interval"),
                corpus("tacos", "train.jsonl", "interval"),
                corpus("anet", "train.jsonl", "interval"),
                corpus("didemo", "train.jsonl", "interval"),
            ),
            v_feat_dim=SLOWFAST_DIM + CLIP_DIM,
            q_feat_dim=CLIP_DIM,
            txt_drop_ratio=0.1,
        ),
        train_data=None,
        eval_data=MRDataConfig(
            dset_name="qvhighlights",
            data_path=f"{data_root}/qvhighlights/metadata/qvhighlights_val.jsonl",
            v_feat_dirs=(
                f"{data_root}/qvhighlights/vid_slowfast",
                f"{data_root}/qvhighlights/vid_clip",
            ),
            q_feat_dir=f"{data_root}/qvhighlights/txt_clip",
            v_feat_dim=SLOWFAST_DIM + CLIP_DIM,
            q_feat_dim=CLIP_DIM,
        ),
        results_dir=results_dir,
        bsz=64,
        n_epoch=100,
        lr=1e-4,
        lr_warmup=1,
        lr_drop=200,
        weights=LossWeights(b=10, g=1, f=10, s_intra=0.1, s_inter=0.1),
        eval_mode="add",
        max_es_cnt=-1,
    )
    for k, v in kw.items():
        cfg = _replace(cfg, k, v)
    return cfg


def _replace(cfg, key, value):
    import dataclasses

    if "." in key:
        head, rest = key.split(".", 1)
        sub = _replace(getattr(cfg, head), rest, value)
        return dataclasses.replace(cfg, **{head: sub})
    field_types = {f.name: f for f in dataclasses.fields(cfg)}
    assert key in field_types, f"unknown config field {key}"
    return dataclasses.replace(cfg, **{key: value})


PRESETS = {
    "qvhighlights_mr": qvhighlights_mr,
    "charades_mr": charades_mr,
    "nlq_mr": nlq_mr,
    "tacos_mr": tacos_mr,
    "anet_mr": anet_mr,
    "didemo_mr": didemo_mr,
    "tvsum_hl": tvsum_hl,
    "youtube_hl": youtube_hl,
    "qfvs": qfvs,
    "vlp_pretrain": vlp_pretrain,
    "cotrain": cotrain,
}
