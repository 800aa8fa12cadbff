"""Video-language pretraining driver (the reference's main/train_vlp.py and
train_vlp_ddp.py collapsed into one SPMD path).

Differences from single-task MR training:
  * train data = multi-corpus VLPDataset with per-sample loss gates,
  * evaluation = zero-shot QVHighlights val (train_vlp_ddp.py:246-259),
  * multi-host: call `init_distributed()` once per process; the (dp, tp)
    mesh then spans all hosts' devices, gradient all-reduce rides ICI/DCN
    via XLA collectives, and each host reads its own data shard (the
    DistributedSampler equivalent).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax

from univtg_tpu.data.vlp import VLPDataConfig, VLPDataset
from univtg_tpu.train.driver_mr import TrainConfig, train_mr

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class VLPTrainConfig(TrainConfig):
    vlp_data: Optional[VLPDataConfig] = None


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host initialization (one JAX process per host). No-op when
    single-process. Mirrors dist.init_process_group (train_vlp_ddp.py:215)."""
    if num_processes is None or num_processes <= 1:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def train_vlp(
    cfg: VLPTrainConfig, resume: Optional[str] = None, resume_all: bool = False
):
    assert cfg.vlp_data is not None
    pid, pcount = jax.process_index(), jax.process_count()
    cfg = dataclasses.replace(
        cfg,
        use_gates=True,
        shard_index=pid,
        num_shards=pcount,
    )
    train_ds = VLPDataset(cfg.vlp_data)
    logger.info(
        f"VLP: {len(train_ds)} samples over {len(cfg.vlp_data.corpora)} corpora, "
        f"process {pid}/{pcount}"
    )
    return train_mr(cfg, resume=resume, train_dataset=train_ds, resume_all=resume_all)
