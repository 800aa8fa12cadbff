"""Highlight-detection training driver (the reference's main/train_hl.py).

Per-domain loop with a fresh model per domain, best-mAP checkpointing, and a
final per-domain + AVG metrics json. Losses: labels + saliency only
(model/univtg.py:439-440).
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np

from univtg_tpu.data.hl import HLDataConfig, HLDataset, collate_hl
from univtg_tpu.data.loader import Loader
from univtg_tpu.evals.hl_domain import evaluate_tvsum, evaluate_youtube
from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.models.losses import LossWeights
from univtg_tpu.parallel import make_mesh, replicate_params, shard_batch
from univtg_tpu.train import checkpoint as ckpt
from univtg_tpu.train.schedule import build_schedule
from univtg_tpu.train.steps import (
    forward,
    init_state,
    make_optimizer,
    make_train_step,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class HLTrainConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: HLDataConfig = dataclasses.field(default_factory=HLDataConfig)
    domains: Optional[Sequence[str]] = None  # None -> all in the split table
    results_dir: str = "results/hl"
    bsz: int = 4
    eval_bsz: int = 4
    n_epoch: int = 200
    lr: float = 1e-4
    lr_drop: int = 200
    lr_gamma: float = 0.1
    lr_warmup: float = 10
    wd: float = 1e-4
    grad_clip: float = 0.1
    weights: LossWeights = dataclasses.field(
        default_factory=lambda: LossWeights(b=0, g=0, f=10, s_intra=0.1, s_inter=0.1)
    )
    losses: Sequence[str] = ("labels", "saliency")
    eval_epoch: int = 5
    eval_mode: Optional[str] = "add"
    f_loss_coef: float = 10.0  # drives the eval score-fusion selection
    s_loss_intra_coef: float = 0.1
    seed: int = 2018
    dp: Optional[int] = None
    tp: int = 1
    # shared hot-loop runtime knobs (train/epoch_runner.py) -- the same
    # machinery the MR/VLP driver runs: host-side transfer casting
    # ('float32' | 'bfloat16' | 'int8'), background prefetch
    # double-buffering, and the XProf profile window over the first
    # profile_steps steps of the first epoch of the FIRST domain
    transfer_dtype: str = "float32"
    prefetch_depth: int = 2
    profile_dir: str = ""
    profile_steps: int = 5


def _pred_scores(cfg: HLTrainConfig, outputs):
    """Eval-score selection (main/train_hl.py:53-62)."""
    prob = np.asarray(outputs["pred_logits"])[..., 0]
    sal = np.asarray(outputs["saliency_scores"])
    if cfg.f_loss_coef == 0:
        return sal
    if cfg.s_loss_intra_coef == 0:
        return prob
    if cfg.eval_mode == "add":
        return sal + prob
    return prob


def eval_domain(cfg: HLTrainConfig, model, params, dataset: HLDataset, eval_step):
    dataset.set_state("val")
    loader = Loader(
        dataset,
        cfg.eval_bsz,
        lambda items, pad_batch_to: collate_hl(
            items, cfg.data.max_q_l, cfg.data.max_v_l, pad_batch_to
        ),
        shuffle=False,
    )
    scores, metas = [], []
    for batch in loader:
        outputs = eval_step(params, batch["model_inputs"])
        fused = _pred_scores(cfg, outputs)
        lens = np.asarray(batch["model_inputs"]["src_vid_mask"]).sum(1).astype(int)
        for i, m in enumerate(batch["meta"]):
            scores.append(fused[i, : lens[i]])
            metas.append(m)
    if cfg.data.dset_name == "tvsum":
        annos = [
            np.asarray(dataset.label[m["vid"]]["anno"], np.float32)[: len(s)]
            for m, s in zip(metas, scores)
        ]
        mAP = evaluate_tvsum(scores, annos)
    else:
        labels = [dataset.get_saliency(m["idx"])[: len(s)] for m, s in zip(metas, scores)]
        mAP = evaluate_youtube(scores, labels)
    dataset.set_state("train")
    return round(mAP * 100, 4)


def infer_hl(cfg: HLTrainConfig, ckpt_dir: str) -> dict:
    """Eval-only pass over the per-domain best checkpoints (the reference's
    main/inference_hl.py)."""
    from univtg_tpu.data.hl import load_hl_splits

    domains = cfg.domains or list(
        load_hl_splits(cfg.data.dset_name, cfg.data.splits_path)
    )
    model = UniVTG(cfg.model)
    optimizer = make_optimizer(lambda s: 0.0)
    # one jitted step shared by all domains (per-domain wrappers would
    # recompile 6-10x)
    eval_step = jax.jit(lambda p, mi: forward(model, p, mi, train=False))
    state = init_state(model, cfg.model, optimizer, jax.random.PRNGKey(0))
    scores = {}
    for domain in domains:
        data_cfg = dataclasses.replace(cfg.data, domain=domain)
        dataset = HLDataset(data_cfg)
        params = ckpt.restore_params(
            os.path.join(ckpt_dir, f"model_{domain}_best.ckpt"), state.params
        )
        scores[domain] = eval_domain(cfg, model, params, dataset, eval_step)
    scores["AVG"] = sum(scores.values()) / len(scores)
    return scores


def train_hl(cfg: HLTrainConfig) -> dict:
    os.makedirs(cfg.results_dir, exist_ok=True)
    from univtg_tpu.data.hl import load_hl_splits

    domains = cfg.domains or list(
        load_hl_splits(cfg.data.dset_name, cfg.data.splits_path)
    )
    mesh = make_mesh(cfg.dp, cfg.tp)
    scores = {}

    def make_loader(domain):
        data_cfg = dataclasses.replace(cfg.data, domain=domain)
        dataset = HLDataset(data_cfg)
        dataset.set_state("train")
        loader = Loader(
            dataset,
            cfg.bsz,
            lambda items, pad_batch_to: collate_hl(
                items, cfg.data.max_q_l, cfg.data.max_v_l, pad_batch_to
            ),
            shuffle=True,
            seed=cfg.seed,
        )
        return dataset, loader

    # one model + jitted steps for every domain (per-domain wrappers would
    # recompile 6-10x; schedule quantization uses the first domain's epoch
    # length -- HL domain sizes are near-equal, warmup boundaries shift by
    # <1 epoch for uneven ones)
    first_ds, first_loader = make_loader(domains[0])
    schedule = build_schedule(
        cfg.lr, cfg.lr_warmup, cfg.lr_drop, cfg.lr_gamma, max(1, len(first_loader))
    )
    optimizer = make_optimizer(schedule, cfg.wd, cfg.grad_clip)
    model = UniVTG(cfg.model)
    train_step = make_train_step(
        model, optimizer, cfg.weights, tuple(cfg.losses), donate=False
    )
    eval_step = jax.jit(lambda params, mi: forward(model, params, mi, train=False))

    from univtg_tpu.train.epoch_runner import StepProfiler, run_train_epoch

    profiler = StepProfiler(cfg.profile_dir, cfg.profile_steps)
    for di, domain in enumerate(domains):
        dataset, loader = (first_ds, first_loader) if di == 0 else make_loader(domain)
        # fresh model per domain (train_hl.py:193-209)
        state = init_state(model, cfg.model, optimizer, jax.random.PRNGKey(cfg.seed))
        state = state.replace(params=replicate_params(mesh, state.params))
        rng = jax.random.PRNGKey(cfg.seed + 1)

        best = 0.0
        for epoch in range(cfg.n_epoch):
            dataset.set_state("train")
            loader.set_epoch(epoch)
            profiler.start()
            n_done = 0

            def _rec(metrics):
                nonlocal n_done
                n_done += 1
                profiler.after_step(n_done, metrics)

            state, _ = run_train_epoch(
                loader, train_step, state, rng, mesh,
                transfer_dtype=cfg.transfer_dtype,
                prefetch_depth=cfg.prefetch_depth,
                record=_rec,
            )
            profiler.stop()
            if (epoch + 1) % cfg.eval_epoch == 0:
                mAP = eval_domain(cfg, model, state.params, dataset, eval_step)
                if mAP > best:
                    best = mAP
                    ckpt.save_checkpoint(
                        os.path.join(cfg.results_dir, f"model_{domain}_best.ckpt"),
                        state,
                        epoch,
                    )
        scores[domain] = best
        logger.info(f"domain {domain}: best mAP {best}")
    scores["AVG"] = sum(scores.values()) / len(scores)
    with open(
        os.path.join(cfg.results_dir, f"best_{cfg.data.dset_name}_metrics.json"), "w"
    ) as f:
        json.dump(scores, f, indent=1)
    return scores
