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
    eval_epoch = 10  # no eval dataset in plain "train" mode
    if mode == "evaltp":
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
        tp = 2  # dp=2 x tp=2 over the 4 global devices: params span hosts
        eval_epoch = 2  # evaluate on the final epoch
    return VLPTrainConfig(
        model=model,
        vlp_data=vlp_data,
        eval_data=eval_data,
        results_dir=results_dir,
        bsz=8,  # per-process; global batch = 8 * process_count
        eval_bsz=8,
        n_epoch=2,
        eval_epoch=eval_epoch,
        tp=tp,
        lr=3e-4,
        lr_warmup=1,
        lr_drop=100,
        save_interval=-1,
        num_io_threads=2,
        seed=7,
    )


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    meta = json.load(open(sys.argv[4]))
    results_base = sys.argv[5]

    from univtg_tpu.train.driver_vlp import init_distributed, train_vlp

    rank, count = init_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert (rank, count) == (pid, nproc), (rank, count)
    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert len(jax.local_devices()) == 2

    mode = sys.argv[6] if len(sys.argv) > 6 else "train"
    cfg = build_cfg(meta, os.path.join(results_base, f"p{pid}"), mode)
    train_vlp(cfg)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
