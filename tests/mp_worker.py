"""Worker process for test_multiprocess: one member of an N-process CPU gang
running real multi-process VLP pretraining through jax.distributed
(the reference's torch.distributed.launch worker, train_vlp_ddp.py:215-275).

Each process exposes 2 virtual CPU devices, so a 2-process gang trains on a
global (dp=4, tp=1) mesh with per-host shard loading.

Invoked as: python mp_worker.py <pid> <nproc> <port> <corpus_meta.json> <results_base>
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_cfg(meta: dict, results_dir: str, mode: str = "train"):
    """Shared between the workers and the single-process baseline so both
    train the exact same config. mode='evaltp' additionally enables rank-0
    zero-shot evaluation and Megatron tp=2 (params sharded ACROSS the two
    processes), exercising the collective param gather + early-stop
    broadcast in driver_mr (train_vlp_ddp.py:127-195 rank-0 eval)."""
    from univtg_tpu.data.vlp import VLPCorpusSpec, VLPDataConfig
    from univtg_tpu.models import ModelConfig
    from univtg_tpu.train.driver_vlp import VLPTrainConfig

    a, b = meta["corpora"]
    vlp_data = VLPDataConfig(
        corpora=(
            VLPCorpusSpec(
                data_path=a["train_path"],
                dset_name="qvhighlights",
                v_feat_dirs=tuple(a["v_feat_dirs"]),
                q_feat_dir=a["q_feat_dir"],
                type="curve",
            ),
            VLPCorpusSpec(
                data_path=b["train_path"],
                dset_name="videocc",
                v_feat_dirs=tuple(b["v_feat_dirs"]),
                q_feat_dir=b["q_feat_dir"],
                type="interval",
            ),
        ),
        q_feat_dim=a["q_dim"],
        v_feat_dim=a["v_dim"],
        max_q_l=10,
        max_v_l=a["max_clips"],
        txt_drop_ratio=0.0,
    )
    model = ModelConfig(
        vid_dim=a["v_dim"] + 2,
        txt_dim=a["q_dim"],
        hidden_dim=64,
        num_layers=2,
        num_heads=4,
        ffn_dim=96,
        dropout=0.0,
        droppath=0.0,
        input_dropout=0.0,
        max_v_l=a["max_clips"],
        max_q_l=10,
    )
    eval_data = None
    tp = 1
    pp = 1
    n_epoch = 2
    eval_epoch = 10  # no eval dataset in plain "train" mode
    fault_epoch = -1
    if mode in ("evaltp", "elastic", "resume", "full4", "shardeval", "pp",
                "ppshardeval"):
        from univtg_tpu.data.mr import MRDataConfig

        eval_data = MRDataConfig(
            dset_name="qvhighlights",
            data_path=a["val_path"],
            v_feat_dirs=tuple(a["v_feat_dirs"]),
            q_feat_dir=a["q_feat_dir"],
            q_feat_dim=a["q_dim"],
            v_feat_dim=a["v_dim"],
            clip_len=a["clip_len"],
            max_q_l=10,
            max_v_l=a["max_clips"],
        )
    length_buckets = None
    if mode == "buckets":
        # global bucket PLAN across the gang: both ranks must derive the
        # same per-step pad targets from the shared metadata lengths
        length_buckets = (32, 48, a["max_clips"])
    sharded_eval = False
    if mode == "shardeval":
        # every rank evaluates its stride-shard of the val set on its own
        # local device, submissions allgathered, rank 0 merges + scores
        # (driver_mr._eval_once_sharded)
        sharded_eval = True
        eval_epoch = 2  # evaluate on the final epoch
    if mode in ("pp", "ppshardeval"):
        # pipeline parallelism ACROSS a process gang: pp=2 over each host's
        # 2 local devices, dp=2 across the hosts (make_mesh row-major
        # (dp, pp, tp) keeps the activation ppermutes on local links).
        # In-training eval runs through the driver's LOCAL non-pipeline
        # twin on host-gathered canonical params (driver_mr).
        import dataclasses

        pp = 2
        model = dataclasses.replace(
            model, scan_layers=True, pipeline_stages=2,
            pipeline_microbatches=2,
        )
        eval_epoch = 2  # evaluate on the final epoch
        if mode == "ppshardeval":
            # composed path: every rank decodes its stride-shard of the
            # val set through the driver's LOCAL non-pipeline twin on the
            # gathered canonical params, submissions allgathered, rank 0
            # merges (sharded_eval x multi-process pp)
            sharded_eval = True
    if mode == "evaltp":
        # dp=2 x tp=2 over the 4 global devices; row-major device order
        # keeps each tp PAIR within one host (the production Megatron
        # layout: tp over the fast local links, dp across hosts). The
        # rank-0 eval + checkpoint still require the _host_state collective because every jit over global arrays
        # must run on all processes; tp-ACROSS-hosts param fetch is
        # guarded separately by the "gather" mode below.
        tp = 2
        eval_epoch = 2  # evaluate on the final epoch
    elif mode in ("elastic", "resume", "full4"):
        n_epoch = 4
        eval_epoch = 1  # checkpoint latest every epoch
        if mode == "elastic":
            fault_epoch = 1  # rank 1 hard-exits after training epoch 1
    return VLPTrainConfig(
        model=model,
        vlp_data=vlp_data,
        eval_data=eval_data,
        results_dir=results_dir,
        bsz=8,  # per-process; global batch = 8 * process_count
        eval_bsz=8,
        n_epoch=n_epoch,
        eval_epoch=eval_epoch,
        tp=tp,
        pp=pp,
        lr=3e-4,
        lr_warmup=1,
        lr_drop=100,
        save_interval=-1,
        num_io_threads=2,
        seed=7,
        inject_fault_epoch=fault_epoch,
        inject_fault_rank=1,
        length_buckets=length_buckets,
        sharded_eval=sharded_eval,
    )


def run_gather_guard(meta, results_dir):
    """tp=2 ACROSS two single-device hosts: a raw np.asarray on a
    tp-sharded param leaf must raise (spans non-addressable devices), and
    driver_mr._host_state must still produce full host copies on every
    process -- the exact failure class the collective gather fixes
    (ADVICE r2)."""
    import numpy as np
    import jax

    from univtg_tpu.models import ModelConfig, UniVTG
    from univtg_tpu.parallel import make_mesh, replicate_params
    from univtg_tpu.train.driver_mr import _host_state
    from univtg_tpu.train.steps import init_state, make_optimizer

    mesh = make_mesh(dp=1, tp=2)  # 2 global devices, one per process
    cfg = ModelConfig(
        vid_dim=34, txt_dim=16, hidden_dim=64, num_layers=2, num_heads=4,
        ffn_dim=96, max_v_l=16, max_q_l=8,
    )
    model = UniVTG(cfg)
    optimizer = make_optimizer(lambda s: 1e-4)
    state = init_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    want = np.asarray(state.params["encoder"]["layers_0"]["in_proj_kernel"])
    state = state.replace(params=replicate_params(mesh, state.params))

    leaf = state.params["encoder"]["layers_0"]["in_proj_kernel"]
    assert not leaf.is_fully_addressable  # tp spans the two hosts
    raised = False
    try:
        np.asarray(leaf)  # the pre-fix checkpoint path
    except Exception:
        raised = True
    assert raised, "plain fetch of cross-host tp shard should raise"

    host = _host_state(mesh, state)  # collective on both processes
    got = np.asarray(host.params["encoder"]["layers_0"]["in_proj_kernel"])
    np.testing.assert_array_equal(got, want)
    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(results_dir, "gather_ok"), "w") as f:
        f.write("ok")


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"
    local_devices = int(os.environ.get("MP_LOCAL_DEVICES", "2"))
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    meta = json.load(open(sys.argv[4]))
    results_base = sys.argv[5]

    from univtg_tpu.train.driver_vlp import init_distributed, train_vlp

    rank, count = init_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert (rank, count) == (pid, nproc), (rank, count)
    assert len(jax.devices()) == local_devices * nproc, jax.devices()
    assert len(jax.local_devices()) == local_devices

    mode = sys.argv[6] if len(sys.argv) > 6 else "train"
    if mode == "gather":
        run_gather_guard(meta, os.path.join(results_base, f"p{pid}"))
        print(f"worker {pid} done", flush=True)
        return
    cfg = build_cfg(meta, os.path.join(results_base, f"p{pid}"), mode)
    resume, resume_all = None, False
    if mode == "resume":
        # every process resumes from rank 0's latest checkpoint (the
        # reference reads one shared --resume path on all ranks,
        # main/config.py:362-374)
        resume = os.path.join(results_base, "p0", "model_latest.ckpt")
        resume_all = True
    train_vlp(cfg, resume=resume, resume_all=resume_all)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
