"""Moment-retrieval training driver (the reference's main/train_mr.py).

Single entry `train_mr(cfg)`: datasets -> mesh -> jitted train/eval steps ->
epoch loop with periodic evaluation, main-metric early stopping, and the
best/latest/periodic checkpoint triple. Metrics stream to jsonl logs instead
of TensorBoard scalars (train_log.jsonl / eval_log.jsonl in results_dir).
"""
from __future__ import annotations

import dataclasses
import functools
import json
import logging
import os
import time
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from univtg_tpu.data.collate import collate_mr
from univtg_tpu.data.loader import Loader
from univtg_tpu.data.mr import MRDataConfig, MRDataset
from univtg_tpu.data.features import save_jsonl
from univtg_tpu.models import ModelConfig, UniVTG
from univtg_tpu.models.losses import LossWeights
from univtg_tpu.parallel import make_mesh, replicate_params, shard_batch
from univtg_tpu.train import checkpoint as ckpt
from univtg_tpu.train.infer_mr import (
    apply_nms,
    evaluate_submission,
    run_inference,
)
from univtg_tpu.train.schedule import build_schedule
from univtg_tpu.train.steps import (
    init_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    # "univtg" (dense regression) or "moment_detr" (query-based baseline;
    # cfg.model must then be a MomentDETRConfig) -- the reference's
    # --model_id dynamic import (main/config.py:341-342)
    model_id: str = "univtg"
    saliency_margin: float = 0.2
    train_data: Optional[MRDataConfig] = None
    eval_data: Optional[MRDataConfig] = None
    results_dir: str = "results/run"
    # optimization (defaults = scripts/qvhl_pretrain.sh)
    bsz: int = 32
    eval_bsz: int = 32
    n_epoch: int = 200
    lr: float = 1e-4
    lr_drop: int = 200
    lr_gamma: float = 0.1
    lr_warmup: float = 10
    wd: float = 1e-4
    grad_clip: float = 0.1
    # losses
    weights: LossWeights = dataclasses.field(
        default_factory=lambda: LossWeights(b=10, g=1, f=10, s_intra=0.1, s_inter=0.1)
    )
    losses: Sequence[str] = ("spans", "labels", "saliency")
    # eval
    eval_epoch: int = 5
    eval_init: bool = False
    main_metric: str = "MR-full-mAP"
    eval_mode: Optional[str] = "add"
    nms_thd: float = -1.0
    max_before_nms: int = 10
    max_after_nms: int = 10
    round_multiple: int = 1
    max_es_cnt: int = 200
    save_interval: int = 50
    # runtime
    seed: int = 2018
    dp: Optional[int] = None
    tp: int = 1
    # expert-parallel degree: ep > 1 builds a (dp[, pp], ep, tp) mesh,
    # activates it for the whole run, and shards the MoE expert bank
    # (cfg.model.moe_experts, ops/moe.py) over the ep axis. Requires a MoE
    # model with moe_experts % ep == 0; composes with pp > 1 on both
    # pipeline schedules (the engines run ep as an AUTO shard_map axis).
    ep: int = 1
    # pipeline-parallel stages: pp > 1 builds a (dp, pp, tp) mesh, activates
    # it for the whole run (jax.set_mesh), and requires
    # cfg.model.pipeline_stages == pp (+ scan_layers). With
    # cfg.model.pipeline_interleave > 1 the driver stores the training state
    # in device-major chunk order so the interleaved schedule is
    # permutation-free per step; checkpoints stay in canonical layer order
    # (converted at restore/save), so they load anywhere.
    pp: int = 1
    # pipeline TRAINING schedule (pp > 1 only):
    #   "gpipe" -- all-forward-then-all-backward via plain autodiff through
    #     the tick scan (supports interleave, tp, remat; activation memory
    #     grows with the microbatch count M);
    #   "1f1b"  -- true one-forward-one-backward with manual per-chunk vjp
    #     (train/steps_1f1b.py): activation memory O(pp) independent of M,
    #     the schedule for large-M small-bubble training. tp > 1 and
    #     pipeline_interleave > 1 compose (collective-uniform ticks /
    #     device-major state, managed here); src_cls TAL banks ride the
    #     heads bundle. Needs post-norm (pre_norm=False), scan_steps=1,
    #     model_id='univtg'. Eval always decodes through the forward
    #     (GPipe) path -- identical numerics, forward has no schedule
    #     choice to make.
    pipeline_schedule: str = "gpipe"
    num_io_threads: int = 8
    use_gates: bool = False  # per-sample loss gating (VLP multi-corpus)
    shard_index: int = 0  # per-host data shard (multi-process pretraining)
    num_shards: int = 1
    # >1: lax.scan K steps per device dispatch (amortizes dispatch latency;
    # univtg model only). Remainder batches run through the single step.
    scan_steps: int = 1
    # optional TensorBoard scalar mirror of the jsonl logs ("" = off;
    # "auto" = {results_dir}/tb)
    tensorboard_dir: str = ""
    # dtype for host->device feature transfer ("bfloat16" halves input
    # bandwidth; "int8" quarters it via per-token quantization; compute
    # always runs in ModelConfig.compute_dtype)
    transfer_dtype: str = "float32"
    # transfer dtype for EVALUATION batches, kept separate so a training
    # throughput setting (int8/bf16) never perturbs checkpoint-selection
    # scores or reported metrics; set equal to transfer_dtype to opt in
    transfer_dtype_eval: str = "float32"
    # batches prepared + device_put ahead of consumption in a background
    # thread (data/prefetch.py); 0 disables, 2 = double buffering
    prefetch_depth: int = 2
    # video-length bucket ladder for TRAINING batches, e.g. (128, 256, 512,
    # 1024): batches pad to the smallest bucket >= the batch max instead of
    # always max_v_l, with window-local length-sorted batching so bucket
    # membership is homogeneous. Bounds compiled programs to len(buckets)
    # while cutting padding FLOPs on mixed-length corpora (SURVEY.md §7).
    # None/() = classic pad-to-max_v_l. Loss numerics are bucket-invariant
    # (tests/test_length_buckets.py).
    length_buckets: Optional[Sequence[int]] = None
    # FAULT INJECTION (elastic-restart testing): the process whose
    # shard_index == inject_fault_rank exits hard (os._exit) right after
    # finishing training epoch inject_fault_epoch -- simulating a member of
    # a multi-process gang crashing mid-run. -1 disables. Recovery contract:
    # relaunch the gang with resume='auto' (or an explicit latest ckpt +
    # resume_all) and the loss curve continues exactly
    # (tests/test_multiprocess.py::test_elastic_restart_two_process_gang).
    inject_fault_epoch: int = -1
    inject_fault_rank: int = 0
    # overlap checkpoint serialization + disk IO with the next training
    # epoch (checkpoint.AsyncCheckpointer); the device->host fetch is still
    # synchronous, only the msgpack+write runs in the background. All writes
    # are atomic (temp + rename) either way.
    async_checkpoint: bool = True
    # XLA/TPU profiler capture: rank 0 traces the first `profile_steps`
    # training steps of the first trained epoch into profile_dir (view in
    # TensorBoard's profile plugin / XProf). "" = off. The reference has
    # no device profiler at all (SURVEY.md §5: wall-clock meters only).
    profile_dir: str = ""
    profile_steps: int = 5
    # Multi-process gangs: spread in-training evaluation across ALL
    # processes instead of the reference's rank-0-only eval
    # (train_vlp_ddp.py:127-195). Each rank runs its stride-shard of the
    # eval set on its own local device (host params are already replicated
    # on every process by the checkpoint gather), the per-rank submissions
    # are allgathered, and rank 0 merges + scores -- identical metrics,
    # eval wall-clock / num_processes. No effect single-process.
    sharded_eval: bool = False


# single implementation shared with the HL/QFVS drivers
from univtg_tpu.train.epoch_runner import strip_meta as _strip_meta  # noqa: E402


def build_model(cfg: TrainConfig):
    if cfg.model_id == "moment_detr":
        from univtg_tpu.models.moment_detr import MomentDETR

        return MomentDETR(cfg.model)
    return UniVTG(cfg.model)


def build_everything(cfg: TrainConfig, steps_per_epoch: int):
    model = build_model(cfg)
    schedule = build_schedule(
        cfg.lr, cfg.lr_warmup, cfg.lr_drop, cfg.lr_gamma, max(steps_per_epoch, 1)
    )
    optimizer = make_optimizer(schedule, cfg.wd, cfg.grad_clip)
    rng = jax.random.PRNGKey(cfg.seed)
    state = init_state(model, cfg.model, optimizer, rng)
    return model, optimizer, state


def train_mr(
    cfg: TrainConfig,
    resume: Optional[str] = None,
    train_dataset=None,
    resume_all: bool = False,
) -> Tuple[dict, str]:
    """Returns (best_metrics, best_ckpt_path). `train_dataset` overrides the
    MRDataset built from cfg.train_data (used by the VLP driver).

    resume semantics follow the reference (main/config.py:362-374): `resume`
    alone loads weights only (pretraining -> downstream co-training);
    `resume_all` additionally restores optimizer state and continues from
    the saved epoch. resume='auto' picks up results_dir/model_latest.ckpt
    with resume_all semantics (elastic restart)."""
    if cfg.ep > 1:
        if cfg.model.moe_experts <= 1:
            raise ValueError(
                f"ep={cfg.ep} needs a MoE model (moe_experts > 1): a dense "
                "model would silently replicate all compute across the ep "
                "axis, wasting those devices"
            )
        if cfg.model.moe_top_k > cfg.model.moe_experts:
            raise ValueError(
                f"moe_top_k={cfg.model.moe_top_k} must be <= "
                f"moe_experts={cfg.model.moe_experts}"
            )
        if cfg.model.moe_experts % cfg.ep != 0:
            raise ValueError(
                f"moe_experts={cfg.model.moe_experts} must tile over "
                f"ep={cfg.ep} expert-parallel shards"
            )
    if cfg.pp <= 1:
        if cfg.ep > 1:
            # activate the mesh so ops.moe.ep_constraint can pin the expert
            # axis of the dispatch buffers (params are ep-sharded via
            # parallel/mesh.py param rules either way)
            mesh = make_mesh(cfg.dp, cfg.tp, ep=cfg.ep)
            with jax.set_mesh(mesh):
                return _train_mr_impl(
                    cfg, resume, train_dataset, resume_all, mesh=mesh
                )
        return _train_mr_impl(cfg, resume, train_dataset, resume_all)
    # Pipeline parallelism: the encoder's pipeline path discovers the mesh
    # through the ambient set_mesh context (parallel/pipeline.py), so the
    # whole run -- train steps, eval decodes, state gathers -- executes
    # under it. Everything else (shard_batch, replicate_params) uses
    # explicit NamedShardings and is unaffected.
    if cfg.model_id == "moment_detr":
        raise ValueError("pipeline parallelism supports model_id='univtg' only")
    if cfg.model.pipeline_stages != cfg.pp:
        raise ValueError(
            f"cfg.pp={cfg.pp} requires cfg.model.pipeline_stages == pp "
            f"(got {cfg.model.pipeline_stages})"
        )
    if cfg.model.pipeline_pre_permuted:
        raise ValueError(
            "pipeline_pre_permuted is an execution layout the driver manages "
            "internally (checkpoints/opt.json stay canonical); leave it False"
        )
    # Multi-process pp composes with dp-across-hosts: the mesh lays pp over
    # each host's local devices (make_mesh row-major (dp, pp, tp) order) and
    # training runs one global SPMD program. Evaluation cannot use the
    # pipelined model from rank 0 alone (its shard_map spans non-addressable
    # devices), so under a process gang the driver evaluates through a LOCAL
    # non-pipeline model on host-gathered canonical params instead
    # (_train_mr_impl: needs_local_eval) -- the sequential scan forward is
    # numerically identical to the pipeline forward (tests/test_pipeline.py).
    v = max(1, cfg.model.pipeline_interleave)
    if cfg.model.num_layers % (cfg.pp * v) != 0:
        raise ValueError(
            f"num_layers={cfg.model.num_layers} must tile over pp={cfg.pp} "
            f"stages x pipeline_interleave={v} chunks"
        )
    if cfg.pipeline_schedule not in ("gpipe", "1f1b"):
        raise ValueError(
            f"pipeline_schedule must be 'gpipe' or '1f1b' "
            f"(got {cfg.pipeline_schedule!r})"
        )
    if cfg.pipeline_schedule == "1f1b":
        # constraints come from the manual-vjp engine (steps_1f1b.py);
        # caught here so a misconfigured run fails before data loading
        if cfg.model.pre_norm or cfg.scan_steps > 1:
            raise ValueError(
                "pipeline_schedule='1f1b' needs pre_norm=False and "
                "scan_steps=1"
            )
    mesh = make_mesh(cfg.dp, cfg.tp, pp=cfg.pp, ep=cfg.ep)
    n_micro = cfg.model.pipeline_microbatches or cfg.pp
    dp_size = mesh.shape["dp"]
    for name, b in (("bsz", cfg.bsz), ("eval_bsz", cfg.eval_bsz)):
        if b % n_micro != 0 or (b // n_micro) % dp_size != 0:
            # caught up front: otherwise an eval-only shape error surfaces
            # after eval_epoch epochs of training are already spent
            raise ValueError(
                f"{name}={b} must split into pipeline_microbatches="
                f"{n_micro} microbatches that each tile over dp={dp_size}"
            )
    with jax.set_mesh(mesh):
        return _train_mr_impl(cfg, resume, train_dataset, resume_all, mesh=mesh)


def _train_mr_impl(
    cfg: TrainConfig,
    resume: Optional[str] = None,
    train_dataset=None,
    resume_all: bool = False,
    mesh=None,
) -> Tuple[dict, str]:
    os.makedirs(cfg.results_dir, exist_ok=True)
    if cfg.sharded_eval and jax.process_count() > 1:
        # the shard/merge roles are keyed on shard_index/num_shards; they
        # must BE the process identity or every rank evaluates the full set
        # and every rank believes it is the merge rank (duplicate racing
        # writes to results_dir)
        if (
            cfg.num_shards != jax.process_count()
            or cfg.shard_index != jax.process_index()
        ):
            raise ValueError(
                f"sharded_eval needs shard_index/num_shards == process "
                f"identity (got {cfg.shard_index}/{cfg.num_shards}, process "
                f"{jax.process_index()}/{jax.process_count()}); train_vlp "
                f"sets these automatically"
            )
    train_ds = train_dataset if train_dataset is not None else MRDataset(cfg.train_data)
    eval_ds = MRDataset(cfg.eval_data) if cfg.eval_data else None

    if mesh is None:
        mesh = make_mesh(cfg.dp, cfg.tp)
    dp_size = mesh.shape["dp"]
    assert cfg.bsz % dp_size == 0 and cfg.eval_bsz % dp_size == 0, (
        f"bsz ({cfg.bsz}) and eval_bsz ({cfg.eval_bsz}) must divide by the "
        f"dp mesh axis ({dp_size})"
    )

    train_max_q = cfg.train_data.max_q_l if cfg.train_data else cfg.model.max_q_l
    train_max_v = cfg.train_data.max_v_l if cfg.train_data else cfg.model.max_v_l
    v_buckets = tuple(cfg.length_buckets) if cfg.length_buckets else None
    lengths = None
    if v_buckets and hasattr(train_ds, "feature_lengths"):
        lengths = train_ds.feature_lengths()
    if v_buckets and cfg.num_shards > 1 and lengths is None:
        # Without shared per-item lengths, each process would bucket from
        # ITS shard's batch max and the padded global shapes would diverge
        # across the SPMD gang -- deadlock, not a clean error, downstream.
        raise ValueError(
            "length_buckets with multi-process sharding (num_shards > 1) "
            "requires a dataset exposing feature_lengths() so every rank "
            "can compute the identical global bucket plan."
        )
    train_loader = Loader(
        train_ds,
        cfg.bsz,
        lambda items, pad_batch_to, pad_v_to=None: collate_mr(
            items, train_max_q, train_max_v, pad_batch_to,
            v_buckets=v_buckets, pad_v_to=pad_v_to,
        ),
        shuffle=True,
        seed=cfg.seed,
        num_threads=cfg.num_io_threads,
        shard_index=cfg.shard_index,
        num_shards=cfg.num_shards,
        lengths=lengths,
        # multi-process + buckets: every rank derives the SAME global batch
        # plan (batches AND per-batch pad targets) from the shared metadata
        # lengths, so SPMD shapes stay rank-uniform (data/loader.py)
        plan_shards=bool(v_buckets),
        plan_buckets=v_buckets,
    )
    steps_per_epoch = len(train_loader)
    model, optimizer, state = build_everything(cfg, steps_per_epoch)
    # Interleaved pipeline (v>1): keep the training state in device-major
    # chunk order so the per-step path is permutation-free (the in-step
    # layer gather would re-shuffle the whole sharded encoder stack across
    # devices every forward + a scatter-add in backward). Checkpoints and
    # opt.json stay canonical -- converted at restore (below) and at every
    # save (_to_canonical_state).
    pre_permuted = cfg.pp > 1 and cfg.model.pipeline_interleave > 1
    if pre_permuted:
        from univtg_tpu.parallel.pipeline import permute_pipeline_params

        model = build_model(
            dataclasses.replace(
                cfg,
                model=dataclasses.replace(
                    cfg.model, pipeline_pre_permuted=True
                ),
            )
        )

    def _to_device_major(tree, inverse=False):
        return permute_pipeline_params(
            tree, cfg.model.num_layers, cfg.pp,
            cfg.model.pipeline_interleave, inverse=inverse,
        )

    def _to_canonical_state(st):
        if not pre_permuted:
            return st
        return st.replace(
            params=_to_device_major(st.params, inverse=True),
            opt_state=_to_device_major(st.opt_state, inverse=True),
        )

    resume_epoch = None
    if resume == "auto":  # elastic restart: pick up the latest checkpoint
        latest = os.path.join(cfg.results_dir, "model_latest.ckpt")
        resume = latest if os.path.exists(latest) else None
        resume_all = True
    if resume:
        if resume_all:
            state, resume_epoch = ckpt.restore_checkpoint(resume, state)
        else:  # weights only
            state = state.replace(
                params=ckpt.restore_params(resume, state.params)
            )
    if pre_permuted:  # canonical (init or checkpoint) -> device-major
        state = state.replace(
            params=_to_device_major(state.params),
            opt_state=_to_device_major(state.opt_state),
        )
    state = state.replace(params=replicate_params(mesh, state.params))
    if jax.process_count() > 1:
        # every jit input must be a global array in multi-process SPMD
        from univtg_tpu.parallel import replicate_tree

        state = state.replace(
            opt_state=replicate_tree(mesh, state.opt_state),
            step=replicate_tree(mesh, state.step),
        )

    if cfg.model_id == "moment_detr":
        from univtg_tpu.train.steps import make_md_eval_step, make_md_train_step

        train_step = make_md_train_step(
            model,
            optimizer,
            cfg.weights,
            cfg.weights.eos_coef,
            cfg.saliency_margin,
            span_loss_type=cfg.model.span_loss_type,
        )
        eval_step = make_md_eval_step(
            model,
            span_loss_type=cfg.model.span_loss_type,
            clip_length=cfg.eval_data.clip_len if cfg.eval_data else 2.0,
        )
    elif cfg.pp > 1 and cfg.pipeline_schedule == "1f1b":
        from univtg_tpu.train.steps_1f1b import make_1f1b_train_step

        train_step = make_1f1b_train_step(
            model, optimizer, cfg.weights, tuple(cfg.losses),
            use_gates=cfg.use_gates,
            n_micro=cfg.model.pipeline_microbatches or cfg.pp,
        )
        eval_step = make_eval_step(model, cfg.eval_mode)
    else:
        train_step = make_train_step(
            model, optimizer, cfg.weights, tuple(cfg.losses), use_gates=cfg.use_gates
        )
        eval_step = make_eval_step(model, cfg.eval_mode)
    # Multi-process pipeline parallelism: rank-0 (or stride-sharded) eval
    # cannot run the pipelined model -- its shard_map spans devices the
    # evaluating process cannot address. Instead every evaluating rank
    # decodes through a LOCAL non-pipeline twin on the host-gathered
    # canonical params; the sequential scan forward is numerically
    # identical to the pipeline forward (pinned by tests/test_pipeline.py).
    eval_params_of = lambda hs: hs.params  # noqa: E731
    if cfg.pp > 1 and jax.process_count() > 1:
        local_eval_model = UniVTG(
            dataclasses.replace(
                cfg.model,
                pipeline_stages=0,
                pipeline_pre_permuted=False,
                seq_shard=False,
            )
        )
        eval_step = make_eval_step(local_eval_model, cfg.eval_mode)
        eval_params_of = lambda hs: _to_canonical_state(hs).params  # noqa: E731
    scan_step = None
    if cfg.scan_steps > 1 and cfg.model_id != "moment_detr":
        from univtg_tpu.train.steps import make_scan_train_step

        scan_step = make_scan_train_step(
            model, optimizer, cfg.weights, tuple(cfg.losses), use_gates=cfg.use_gates
        )
    rng = jax.random.PRNGKey(cfg.seed + 1)

    train_log = open(os.path.join(cfg.results_dir, "train_log.jsonl"), "a")
    eval_log = open(os.path.join(cfg.results_dir, "eval_log.jsonl"), "a")
    from univtg_tpu.train.config_io import snapshot_code, to_json

    cfg_json = to_json(cfg)
    with open(os.path.join(cfg.results_dir, "opt.json"), "w") as f:
        f.write(cfg_json)
    if cfg.shard_index == 0:
        snapshot_code(cfg.results_dir)

    from univtg_tpu.utils.tb import TBWriter

    tb_dir = cfg.tensorboard_dir
    if tb_dir == "auto":
        tb_dir = os.path.join(cfg.results_dir, "tb")
    tb = TBWriter(tb_dir if cfg.shard_index == 0 else None)

    best_score, best_metrics, es_cnt = -np.inf, None, 0
    best_path = os.path.join(cfg.results_dir, "model_best.ckpt")
    latest_path = os.path.join(cfg.results_dir, "model_latest.ckpt")
    saver = ckpt.AsyncCheckpointer() if cfg.async_checkpoint else None
    save_ckpt = saver.save if saver is not None else ckpt.save_checkpoint

    from univtg_tpu.train.epoch_runner import StepProfiler

    # one XProf window per run over the first profile_steps steps of the
    # first trained epoch, rank 0 only (shared implementation with the
    # HL/QFVS drivers)
    profiler = StepProfiler(
        cfg.profile_dir, cfg.profile_steps, enabled=cfg.shard_index == 0
    )

    start_epoch = -1 if cfg.eval_init else 0
    if resume_epoch is not None:
        start_epoch = resume_epoch + 1
    for epoch in range(start_epoch, cfg.n_epoch):
        if epoch > -1:
            train_loader.set_epoch(epoch)
            t0 = time.time()
            n_steps = 0
            # Exact per-epoch means (the reference's AverageMeter semantics,
            # main/train_mr.py:36-49): step metrics stay as device scalars
            # ((K,) arrays for scan dispatches) and are fetched in CHUNKS of
            # a few hundred steps, so recording never forces a per-step host
            # sync but also never accumulates an epoch's worth of live
            # device buffers (131k steps/epoch at pretraining scale).
            pending_metrics = []
            agg, counts = {}, {}

            def _flush_pending():
                for metrics in jax.device_get(pending_metrics):
                    for k, v in metrics.items():
                        arr = np.asarray(v)
                        agg[k] = agg.get(k, 0.0) + float(arr.sum())
                        counts[k] = counts.get(k, 0) + int(arr.size)
                pending_metrics.clear()

            if epoch == max(start_epoch, 0):
                profiler.start()

            def record(metrics):
                pending_metrics.append(metrics)
                if len(pending_metrics) >= 512:
                    _flush_pending()
                # n_steps counts dispatched steps (K per scan dispatch);
                # after_step barriers on the metrics before closing the
                # trace so it captures device work, not dispatch gaps
                profiler.after_step(n_steps, metrics)

            if scan_step is not None:
                from univtg_tpu.train.steps import stack_batches

                def _vlen(b):
                    return b["model_inputs"]["src_vid"].shape[1]

                pending = []
                for batch in train_loader:
                    if pending and _vlen(batch) != _vlen(pending[0]):
                        # length_buckets: only same-bucket batches stack into
                        # one scan dispatch; flush the ragged remainder
                        # through the single step
                        for b in pending:
                            mi, tg = _strip_meta(b, cfg.transfer_dtype)
                            state, metrics = train_step(
                                state,
                                shard_batch(mesh, mi),
                                shard_batch(mesh, tg),
                                rng,
                            )
                            n_steps += 1
                            record(metrics)
                        pending = []
                    pending.append(batch)
                    if len(pending) == cfg.scan_steps:
                        smi, stg = stack_batches(pending, cfg.transfer_dtype)
                        state, metrics = scan_step(
                            state,
                            shard_batch(mesh, smi, batch_axis=1),
                            shard_batch(mesh, stg, batch_axis=1),
                            rng,
                        )
                        n_steps += len(pending)
                        pending = []
                        record(metrics)
                for batch in pending:  # remainder through the single step
                    model_inputs, targets = _strip_meta(batch, cfg.transfer_dtype)
                    state, metrics = train_step(
                        state,
                        shard_batch(mesh, model_inputs),
                        shard_batch(mesh, targets),
                        rng,
                    )
                    n_steps += 1
                    record(metrics)
            else:
                # shared hot loop (train/epoch_runner.py): transfer cast +
                # prefetch double-buffering, same machinery the HL/QFVS
                # drivers run
                from univtg_tpu.train.epoch_runner import run_train_epoch

                def _rec(metrics):
                    # record() reads n_steps for the profiler window, so
                    # the count must advance BEFORE each record call
                    nonlocal n_steps
                    n_steps += 1
                    record(metrics)

                state, _ = run_train_epoch(
                    train_loader, train_step, state, rng, mesh,
                    transfer_dtype=cfg.transfer_dtype,
                    prefetch_depth=cfg.prefetch_depth,
                    record=_rec,
                )
            dt = time.time() - t0
            # per-key counts: scan and single-step metrics can differ in key
            # sets (e.g. grad_norm is single-step only)
            _flush_pending()  # device_get barrier: dispatched steps finish
            profiler.stop()  # short epoch: close the trace at epoch end
            line = {
                "epoch": epoch,
                "time": dt,
                "steps": n_steps,
                **{k: v / max(1, counts[k]) for k, v in agg.items()},
            }
            train_log.write(json.dumps(line) + "\n")
            train_log.flush()
            tb.scalars(line, epoch, prefix="train/")
            logger.info(f"epoch {epoch}: {line}")
            if epoch == cfg.inject_fault_epoch and cfg.shard_index == cfg.inject_fault_rank:
                # simulated crash: no cleanup, no checkpoint -- exactly what
                # a preempted/killed gang member looks like to its peers
                logger.warning(f"inject_fault: hard exit at epoch {epoch}")
                os._exit(3)

        is_main = cfg.shard_index == 0  # rank-0-only eval/ckpt (SURVEY.md 3.3)
        do_eval = eval_ds is not None and (epoch + 1) % cfg.eval_epoch == 0
        stop = False
        host_state = None  # gathered at most once per epoch
        if do_eval:
            # ALL processes pull a host-addressable state off the global
            # mesh (a collective when tp shards params across hosts, for
            # checkpointing exactly like for eval); only rank 0 then runs
            # the actual evaluation and serializes the checkpoints.
            host_state = _host_state(mesh, state)
            metrics = None
            if cfg.sharded_eval and jax.process_count() > 1:
                # collective: every rank scores its shard, rank 0 merges
                metrics = _eval_once_sharded(
                    cfg, model, eval_params_of(host_state), eval_ds,
                    eval_step, epoch,
                )
            if is_main:
                if metrics is None:
                    metrics = _eval_once(
                        cfg, model, eval_params_of(host_state), eval_ds,
                        eval_step, epoch,
                    )
                eval_log.write(json.dumps({"epoch": epoch, **metrics["brief"]}) + "\n")
                eval_log.flush()
                tb.scalars(metrics["brief"], epoch, prefix="eval/")
                score = metrics["brief"].get(f"{cfg.main_metric}-key")
                if score is None:
                    score = metrics["brief"].get(cfg.main_metric)
                ckpt_state = _to_canonical_state(host_state)
                save_ckpt(latest_path, ckpt_state, epoch, cfg_json)
                if score is not None and score > best_score:
                    best_score, best_metrics, es_cnt = score, metrics, 0
                    save_ckpt(best_path, ckpt_state, epoch, cfg_json)
                else:
                    es_cnt += 1
                    stop = 0 <= cfg.max_es_cnt <= es_cnt
            if jax.process_count() > 1:
                # rank 0's early-stop decision must reach every process, or
                # the others enter the next epoch's global train step and
                # deadlock waiting for a rank that already exited the loop
                from jax.experimental import multihost_utils

                stop = bool(multihost_utils.broadcast_one_to_all(np.asarray(stop)))
        if stop:
            logger.info("early stop")
            break
        if cfg.save_interval > 0 and epoch > 0 and epoch % cfg.save_interval == 0:
            if host_state is None:  # collective: all processes
                host_state = _host_state(mesh, state)
            if is_main:
                save_ckpt(
                    os.path.join(cfg.results_dir, f"model_e{epoch:04d}.ckpt"),
                    _to_canonical_state(host_state),
                    epoch,
                    cfg_json,
                )

    # Final-state save when no eval produced a best checkpoint. best_metrics
    # is rank-0-only knowledge (set inside the is_main block), so the
    # decision to run the _host_state COLLECTIVE must be broadcast -- a bare
    # `best_metrics is None` would make non-zero ranks launch a gather that
    # rank 0 never joins and deadlock at shutdown.
    need_final = best_metrics is None
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        need_final = bool(
            multihost_utils.broadcast_one_to_all(np.asarray(need_final))
        )
    if need_final:
        host_state = _host_state(mesh, state)  # collective: all processes
        if cfg.shard_index == 0:
            save_ckpt(
                best_path, _to_canonical_state(host_state),
                cfg.n_epoch - 1, cfg_json,
            )
    if saver is not None:
        saver.wait()  # files must exist before the caller reads them back
    if best_metrics is None:
        best_metrics = {}
    train_log.close()
    eval_log.close()
    tb.close()
    return best_metrics, best_path


def _host_state(mesh, state):
    """Host-addressable TrainState for rank-0 checkpointing.

    Multi-process, tp sharding that truly spans hosts: a raw
    checkpoint._to_host np.asarray on state.params would raise "spans
    non-addressable devices". The replicating-identity gather below is a COLLECTIVE:
    it must run on EVERY process (call this outside any rank-0 guard), after
    which rank 0 alone can serialize the numpy state. Single-process: the
    state passes through untouched."""
    if jax.process_count() <= 1:
        return state
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    trees = (state.params, state.opt_state)
    out_sh = jax.tree_util.tree_map(lambda _: rep, trees)
    params, opt_state = jax.jit(lambda t: t, out_shardings=out_sh)(trees)
    to_np = functools.partial(jax.tree_util.tree_map, np.asarray)
    return state.replace(
        params=to_np(params),
        opt_state=to_np(opt_state),
        step=np.asarray(state.step),
    )


class _EvalShard:
    """Stride-slice view of a dataset: items shard_index, shard_index+S,
    ... INCLUDING the remainder (the Loader's own training shards drop the
    tail so every rank sees equal step counts -- for evaluation every item
    must be scored exactly once across the gang)."""

    def __init__(self, ds, shard_index: int, num_shards: int):
        self.ds = ds
        self.idx = list(range(shard_index, len(ds), num_shards))

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i):
        return self.ds[self.idx[i]]


def _run_eval_shard(cfg, model, params, eval_ds, eval_step,
                    shard_index=0, num_shards=1):
    """Inference over one stride-shard of the eval set on the local
    device(s); shard_index/num_shards default to the whole set."""
    ds = eval_ds
    if num_shards > 1:
        ds = _EvalShard(eval_ds, shard_index, num_shards)
    eval_loader = Loader(
        ds,
        cfg.eval_bsz,
        lambda items, pad_batch_to: collate_mr(
            items, cfg.eval_data.max_q_l, cfg.eval_data.max_v_l, pad_batch_to
        ),
        shuffle=False,
        num_threads=cfg.num_io_threads,
    )
    return run_inference(
        model,
        params,
        eval_loader,
        eval_mode=cfg.eval_mode,
        clip_length=cfg.eval_data.clip_len,
        round_multiple=cfg.round_multiple,
        eval_step=eval_step,
        transfer_dtype=cfg.transfer_dtype_eval,
    )


def _finish_eval(cfg, submission, eval_ds, epoch):
    """Rank-0 tail shared by the single-rank and sharded eval paths: persist
    predictions, score, optional NMS re-score, metrics json artifact."""
    sub_path = os.path.join(cfg.results_dir, "latest_val_preds.jsonl")
    save_jsonl(submission, sub_path)
    metrics = evaluate_submission(submission, eval_ds.data)
    if cfg.nms_thd > 0:
        nms_sub = apply_nms(
            submission, cfg.nms_thd, cfg.max_before_nms, cfg.max_after_nms
        )
        metrics_nms = evaluate_submission(nms_sub, eval_ds.data)
        metrics["nms_brief"] = metrics_nms["brief"]
    with open(
        os.path.join(cfg.results_dir, f"metrics_e{max(epoch,0):04d}.json"), "w"
    ) as f:
        json.dump(metrics, f, indent=1)
    return metrics


def _eval_once(cfg, model, params, eval_ds, eval_step, epoch):
    submission = _run_eval_shard(cfg, model, params, eval_ds, eval_step)
    return _finish_eval(cfg, submission, eval_ds, epoch)


def _allgather_bytes(blob: bytes):
    """Gather one byte string from every process to ALL processes (a
    COLLECTIVE -- every process must call it). Variable lengths are handled
    by an explicit length gather + pad-to-max."""
    from jax.experimental import multihost_utils

    arr = np.frombuffer(blob, np.uint8)
    lengths = np.asarray(
        multihost_utils.process_allgather(np.asarray(len(arr), np.int64))
    ).reshape(-1)
    padded = np.zeros(int(lengths.max()), np.uint8)
    padded[: len(arr)] = arr
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(lengths), -1)
    return [gathered[i, : lengths[i]].tobytes() for i in range(len(lengths))]


def _eval_once_sharded(cfg, model, params, eval_ds, eval_step, epoch):
    """Multi-process eval: every rank scores its stride-shard of the eval
    set on its own local device (params are host-replicated by the
    _host_state gather), then the per-rank submissions are allgathered and
    rank 0 merges them back into dataset order and computes metrics.

    Beyond-reference: the reference evaluates on rank 0 only
    (train_vlp_ddp.py:127-195), serializing the whole eval set through one
    GPU while the rest idle. This path is a COLLECTIVE (the allgather) --
    call it on every process; returns metrics on rank 0, None elsewhere."""
    sub_local = _run_eval_shard(
        cfg, model, params, eval_ds, eval_step,
        shard_index=cfg.shard_index, num_shards=cfg.num_shards,
    )
    blobs = _allgather_bytes(json.dumps(sub_local).encode())
    # EVERY rank merges and validates: the gathered blobs are identical on
    # all processes, so a coverage failure raises gang-wide as a clean
    # crash -- a rank-0-only raise would leave the other ranks blocked
    # forever in the next collective (the early-stop broadcast). Explicit
    # raises (not asserts): these guard published metrics and checkpoint
    # selection, and must survive python -O.
    by_qid = {}
    for blob in blobs:
        for row in json.loads(blob):
            by_qid[row["qid"]] = row
    # dataset order, exactly like the single-rank path writes it
    submission = [by_qid[m["qid"]] for m in eval_ds.data if m["qid"] in by_qid]
    if len(submission) != len(eval_ds.data):
        missing = {m["qid"] for m in eval_ds.data} - set(by_qid)
        raise RuntimeError(
            f"sharded eval covered {len(submission)}/{len(eval_ds.data)} "
            f"queries; {len(missing)} missing (e.g. {sorted(missing)[:5]}) "
            f"-- a rank dropped part of its shard"
        )
    if len(submission) != len(by_qid):
        raise RuntimeError(
            "sharded eval gathered qids that do not exist in the eval "
            "metadata -- shard views out of sync across the gang"
        )
    if cfg.shard_index != 0:
        return None
    return _finish_eval(cfg, submission, eval_ds, epoch)
