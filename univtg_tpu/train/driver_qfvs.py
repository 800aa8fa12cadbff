"""QFVS training driver (the reference's main/train_qfvs.py).

Leave-one-out over the 4 UT-Egocentric videos: per item the model runs three
times (concept1, concept2, oracle=concat) over the segment-flattened grid
and the three criteria are summed (train_qfvs.py:179-195); evaluation picks
the top-2% shots and scores bipartite semantic-matching F1 against the
oracle summaries (train_qfvs.py:33-145).
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from univtg_tpu.data.qfvs import (
    QFVSDataConfig,
    QFVSDataset,
    _oracle_dir,
    load_video_grid,
    prepare_qfvs_batch,
    read_oracle_summary,
)
from univtg_tpu.evals.qfvs_metric import load_videos_tag, semantic_matching
from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.models.losses import LossWeights, compact_to_grid, qfvs_losses
from univtg_tpu.train import checkpoint as ckpt
from univtg_tpu.train.schedule import build_schedule
from univtg_tpu.train.steps import forward, init_state, make_optimizer

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class QFVSTrainConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: QFVSDataConfig = dataclasses.field(default_factory=QFVSDataConfig)
    tags_mat_path: str = ""
    results_dir: str = "results/qfvs"
    n_epoch: int = 20
    lr: float = 1e-4
    lr_drop: int = 200
    lr_gamma: float = 0.1
    lr_warmup: float = -1
    wd: float = 1e-4
    grad_clip: float = 0.1
    weights: LossWeights = dataclasses.field(
        default_factory=lambda: LossWeights(b=0, g=0, f=1.0, s_intra=0.05, s_inter=0.0)
    )
    eval_epoch: int = 1
    splits: Sequence[Sequence[int]] = ((2, 3, 4), (1, 3, 4), (1, 2, 4), (1, 2, 3))
    seed: int = 2018
    max_q_l: int = 32
    # shared hot-loop runtime knobs (train/epoch_runner.py machinery):
    # prefetch_depth > 0 runs the host-side 3-variant batch prep
    # (prepare_qfvs_batch + GT grid scatter) in a background thread while
    # the device executes the previous item's 3-forward step; the profile
    # window covers the first profile_steps steps of the first epoch
    prefetch_depth: int = 2
    profile_dir: str = ""
    profile_steps: int = 5


def make_qfvs_train_step(model, optimizer, weights: LossWeights):
    wd = weights.as_dict()

    def step(state, in1, in2, in_oracle, gt1, gt2, gt_oracle, mask_flat, rng):
        from univtg_tpu.train.steps import step_dropout_rngs

        drop_rng, path_rng = step_dropout_rngs(rng, state.step)
        rngs = {"dropout": drop_rng, "droppath": path_rng}

        def loss_fn(params):
            total = jnp.zeros(())
            aux = {}
            for tag, mi, gt in (
                ("c1", in1, gt1),
                ("c2", in2, gt2),
                ("oracle", in_oracle, gt_oracle),
            ):
                outputs = forward(model, params, mi, train=True, rngs=rngs)
                ld = qfvs_losses(outputs, gt, mask_flat)
                total = total + sum(v * wd[k] for k, v in ld.items() if k in wd)
                aux.update({f"{tag}_{k}": v for k, v in ld.items()})
            aux["loss_overall"] = total
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        import optax

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state, step=state.step + 1), aux

    return jax.jit(step, donate_argnums=(0,))


def _output_mode(cfg: "QFVSTrainConfig") -> str:
    """Score-head selection (train_qfvs.py:106-113): saliency-only when the
    fg head is untrained, logits-only when saliency is untrained, else
    ensemble if configured."""
    if cfg.weights.f == 0:
        return "saliency"
    if cfg.weights.s_intra == 0:
        return "logits"
    return "ensemble" if cfg.data.score_ensemble else "logits"


def _score_one(cfg, model, params, inputs, mode: str, fwd):
    outputs = fwd(params, inputs)
    logits = np.asarray(outputs["pred_logits"])[..., 0].reshape(-1)
    sal = np.asarray(outputs["saliency_scores"]).reshape(-1)
    if mode == "saliency":
        return sal
    if mode == "ensemble":
        return logits + sal
    return logits


def eval_split(cfg: QFVSTrainConfig, model, params, test_video: int, videos_tag,
               fwd=None):
    data_cfg = dataclasses.replace(cfg.data, train_videos=(test_video,))
    dataset = QFVSDataset(data_cfg)
    if fwd is None:
        fwd = jax.jit(lambda p, mi: forward(model, p, mi, train=False))

    features, seg_len = load_video_grid(data_cfg, test_video)
    f1_sum = p_sum = r_sum = 0.0
    files = [
        f
        for f in sorted(os.listdir(_oracle_dir(data_cfg, test_video)))
        if f.endswith("_oracle.txt")
    ]
    for fname in files:
        c1, c2 = fname[: -len("_oracle.txt")].split("_")[:2]
        item = dataset[[i for i, it in enumerate(dataset.items) if it[1] == c1 and it[2] == c2][0]]
        in1, in2, in_oracle, mask_flat = prepare_qfvs_batch(item, cfg.max_q_l)

        mode = _output_mode(cfg)
        score = _score_one(cfg, model, params, in_oracle, mode, fwd)
        if cfg.data.score_gather:
            score = (
                score
                + _score_one(cfg, model, params, in1, mode, fwd)
                + _score_one(cfg, model, params, in2, mode, fwd)
            )
        compact = score[mask_flat > 0]
        tags = videos_tag[test_video - 1]
        compact = compact[: min(len(compact), len(tags))]
        k = int(len(compact) * cfg.data.top_percent)
        top_idx = np.argsort(-compact, kind="stable")[: max(k, 1)]

        gt_summary = read_oracle_summary(
            os.path.join(_oracle_dir(data_cfg, test_video), fname)
        )
        p, r, f1 = semantic_matching(list(top_idx), gt_summary, tags)
        f1_sum += f1
        p_sum += p
        r_sum += r
    n = len(files)
    return {
        "F": round(100 * f1_sum / n, 2),
        "R": round(100 * r_sum / n, 2),
        "P": round(100 * p_sum / n, 2),
    }


def infer_qfvs(cfg: QFVSTrainConfig, ckpt_dir: str, videos_tag=None) -> dict:
    """Eval-only pass over the per-split best checkpoints (the reference's
    main/inference_qfvs.py)."""
    if videos_tag is None:
        videos_tag = load_videos_tag(cfg.tags_mat_path)
    model = UniVTG(cfg.model)
    optimizer = make_optimizer(lambda s: 0.0)
    fwd = jax.jit(lambda p, mi: forward(model, p, mi, train=False))
    state = init_state(model, cfg.model, optimizer, jax.random.PRNGKey(0))
    results = {}
    all_videos = set(cfg.data.train_videos) | set(cfg.data.test_videos)
    for s in cfg.splits:
        all_videos |= set(s)
    for split in cfg.splits:
        test_video = sorted(all_videos - set(split))[0]
        params = ckpt.restore_params(
            os.path.join(ckpt_dir, f"model_V{test_video}_best.ckpt"), state.params
        )
        results[f"V{test_video}"] = eval_split(
            cfg, model, params, test_video, videos_tag, fwd=fwd
        )
    results["AVG_F"] = round(
        sum(v["F"] for k, v in results.items() if k.startswith("V")) / len(cfg.splits), 2
    )
    return results


def train_qfvs(cfg: QFVSTrainConfig, videos_tag=None) -> dict:
    """videos_tag: per-video (num_shots, num_concepts) tag matrices; loaded
    from cfg.tags_mat_path (eval/Tags.mat format) when not given."""
    os.makedirs(cfg.results_dir, exist_ok=True)
    if videos_tag is None:
        videos_tag = load_videos_tag(cfg.tags_mat_path)
    results = {}
    all_videos = set(cfg.data.train_videos) | set(cfg.data.test_videos)
    for s in cfg.splits:
        all_videos |= set(s)

    # one model + jitted step across splits (avoids 4x recompilation;
    # schedule quantization uses the first split's dataset size)
    first_cfg = dataclasses.replace(cfg.data, train_videos=tuple(cfg.splits[0]))
    first_n = len(QFVSDataset(first_cfg))
    schedule = build_schedule(
        cfg.lr, cfg.lr_warmup, cfg.lr_drop, cfg.lr_gamma, max(first_n, 1)
    )
    optimizer = make_optimizer(schedule, cfg.wd, cfg.grad_clip)
    model = UniVTG(cfg.model)
    train_step = make_qfvs_train_step(model, optimizer, cfg.weights)
    eval_fwd = jax.jit(lambda p, mi: forward(model, p, mi, train=False))

    from univtg_tpu.data.prefetch import device_prefetch
    from univtg_tpu.train.epoch_runner import StepProfiler

    # ONE trace window per run (the first profile_steps steps of the first
    # split's first epoch), not one per cross-validation split
    profiler = StepProfiler(cfg.profile_dir, cfg.profile_steps)

    for split in cfg.splits:
        test_video = sorted(all_videos - set(split))[0]
        data_cfg = dataclasses.replace(cfg.data, train_videos=tuple(split))
        dataset = QFVSDataset(data_cfg)
        state = init_state(model, cfg.model, optimizer, jax.random.PRNGKey(cfg.seed))
        rng = jax.random.PRNGKey(cfg.seed + 1)

        best = {"F": 0.0}
        order = np.arange(len(dataset))

        def _prep(idx):
            item = dataset[int(idx)]
            in1, in2, in_oracle, mask_flat = prepare_qfvs_batch(item, cfg.max_q_l)
            S, F = item["mask_GT"].shape
            gts = [
                compact_to_grid(
                    item[key][: int(item["seg_len"].sum())], item["seg_len"], S, F
                )
                for key in ("concept1_GT", "concept2_GT", "oracle_summary")
            ]
            return in1, in2, in_oracle, gts, mask_flat

        for epoch in range(cfg.n_epoch):
            dataset.set_epoch(epoch)
            np.random.default_rng((cfg.seed, epoch)).shuffle(order)
            profiler.start()
            n_done = 0
            # the host-side prep (3-variant batch build + GT grid scatter)
            # for item N+1 overlaps the device's step N
            for in1, in2, in_oracle, gts, mask_flat in device_prefetch(
                list(order), _prep, cfg.prefetch_depth
            ):
                state, metrics = train_step(
                    state, in1, in2, in_oracle, gts[0], gts[1], gts[2], mask_flat, rng
                )
                n_done += 1
                profiler.after_step(n_done, metrics)
            profiler.stop()
            if (epoch + 1) % cfg.eval_epoch == 0:
                scores = eval_split(cfg, model, state.params, test_video, videos_tag, fwd=eval_fwd)
                if scores["F"] > best["F"]:
                    best = scores
                    ckpt.save_checkpoint(
                        os.path.join(cfg.results_dir, f"model_V{test_video}_best.ckpt"),
                        state,
                        epoch,
                    )
        results[f"V{test_video}"] = best
        logger.info(f"split test=V{test_video}: best {best}")
    results["AVG_F"] = round(
        sum(v["F"] for k, v in results.items() if k.startswith("V")) / len(cfg.splits), 2
    )
    with open(os.path.join(cfg.results_dir, "qfvs_metrics.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results
